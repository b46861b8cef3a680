"""Seeded randomized oracle sweeps for the behavioral / business pack.

Funnels, attribution, cohorts, CDC state, and the orders dashboards
decide on SEQUENCE structure — who did what in which order, with what
gaps — so the sweep plants the sequence shapes the fixtures leave to
chance:

* complete view→click→purchase chains with 0-2 unrelated events
  interleaved between steps (pattern_match_skip tolerates position
  gaps up to 3; one more interloper breaks the chain), plus chains
  that stall at each stage (funnel drop-off at every level);
* purchases at the IDENTICAL timestamp as their nearest click (the
  as-of joins' inclusive boundary) and users with clicks only /
  purchases only (the cogroup merge's empty-side branches);
* users whose first event lands in different ISO weeks, so the
  retention cohort matrix and daily-new-user growth have multiple
  non-trivial rows;
* order streams straddling the snapshot cutoff (1997-06-01) with
  orderkeys on both sides of the %7 reprioritization rule, weekly
  revenue spanning empty weeks (WoW's left join against a missing
  previous week), and customers whose recency/frequency/monetary
  quartiles tie (quarter-grid money and planted equal totals);
* lineitems shipping before, exactly at, and after their order date
  (the shipping-lag floor bucket at lag 0).
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.sweep_util import quarter as _quarter, sweep_check

BASE_US = 1_706_000_000_000_000
DAY_US = 86_400_000_000

SWEPT_EVENTS = (
    "funnel_conversion",
    "funnel_time_to_convert",
    "attribution_last_touch",
    "attribution_linear",
    "retention_cohort",
    "growth_new_users_daily",
    "pattern_match_skip",
    "pattern_online_prequential",
    "scd2_user_state",
    "cogroup_asof_enrich",
)
SWEPT_ORDERS = (
    "trend_wow_revenue",
    "orders_rfm_segmentation",
    "orders_shipping_lag",
    "snapshot_diff_report",
)


def _us(y: int, m: int, d: int) -> int:
    return int(datetime(y, m, d, tzinfo=timezone.utc).timestamp()) * 1_000_000


SNAP_CUTOFF_US = _us(1997, 6, 1)




def _build_events(rng: random.Random) -> pa.Table:
    rows, eid = [], 0

    def emit(uid, t, et):
        nonlocal eid
        rows.append((eid, t, uid, et, _quarter(rng, 1, 200),
                     '{"k": %d}' % rng.randint(0, 9)))
        eid += 1

    n_users = rng.randint(8, 14)
    for uid in range(n_users):
        # cohort spread: first event in week 0-3
        t = BASE_US + rng.randint(0, 3) * 7 * DAY_US + rng.randint(0, DAY_US)
        shape = rng.random()
        if shape < 0.12:
            emit(uid, t, "click")  # clicks-only user (cogroup edge)
            continue
        if shape < 0.2:
            emit(uid, t, "purchase")  # purchases-only user
            continue
        for _ in range(rng.randint(1, 4)):
            # funnel chain with 0-2 interlopers between steps; a third
            # interloper (12% chance per step) breaks skip-tolerance
            emit(uid, t, "view")
            for step in ("click", "purchase"):
                n_noise = rng.choice([0, 0, 1, 2, 2, 3])
                for _ in range(n_noise):
                    t += rng.randint(1_000_000, 600_000_000)
                    emit(uid, t, rng.choice(["cart", "error", "view"]))
                if rng.random() < 0.25:
                    break  # stall: funnel drop-off at this stage
                if step == "purchase" and rng.random() < 0.3:
                    pass  # purchase at identical ts as previous event
                else:
                    t += rng.randint(1_000_000, 3_600_000_000)
                emit(uid, t, step)
            t += rng.randint(DAY_US // 2, 10 * DAY_US)
    # unconditional clicks-only and purchases-only users: the cogroup
    # merge's empty-side branches must exist in EVERY seed (seed 67
    # drew neither shape from the per-user rng above)
    emit(n_users, BASE_US + rng.randint(0, DAY_US), "click")
    emit(n_users + 1, BASE_US + rng.randint(0, DAY_US), "purchase")
    # attribution-horizon edge: one touch EXACTLY 24 h before its
    # purchase (inside the inclusive <= horizon) and one 1 µs beyond
    # (outside) — both engines divide the same integer µs gap by 1e6
    # and must cut identically at 86400.0
    t0 = BASE_US + 2 * DAY_US
    emit(n_users + 2, t0, "click")
    emit(n_users + 2, t0 + 86_400_000_000, "purchase")
    emit(n_users + 3, t0, "click")
    emit(n_users + 3, t0 + 86_400_000_001, "purchase")
    rows.sort(key=lambda r: (r[1], r[0]))
    rows = [(i, *r[1:]) for i, r in enumerate(rows)]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def _build_orders_lineitem(rng: random.Random):
    o_rows, li_rows = [], []
    okey = 1
    for ck in range(1, rng.randint(8, 16) + 1):
        for _ in range(rng.randint(0, 6)):
            if rng.random() < 0.2:  # exactly at / 1 µs before the cutoff
                date_us = rng.choice([SNAP_CUTOFF_US, SNAP_CUTOFF_US - 1])
            else:
                date_us = SNAP_CUTOFF_US + rng.randint(-200, 200) * DAY_US
            o_rows.append(
                (okey, ck, rng.choice("FO"), _quarter(rng, 1, 300),
                 date_us, rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]))
            )
            for ln in range(rng.randint(1, 3)):
                # ship lag: before (planted negative), exactly 0, after
                lag_days = rng.choice([-2, 0, 0, rng.randint(1, 45)])
                li_rows.append(
                    (okey, rng.randint(1, 20), rng.randint(0, 5), ln + 1,
                     _quarter(rng, 1, 50), _quarter(rng, 1, 2000),
                     rng.choice([0.0, 0.25]), rng.choice([0.0, 0.25]),
                     rng.choice("ANR"), rng.choice("FO"),
                     date_us + lag_days * DAY_US)
                )
            okey += 1
    orders = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in o_rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in o_rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in o_rows]),
            "o_totalprice": pa.array([r[3] for r in o_rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in o_rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in o_rows]),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in li_rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in li_rows], pa.int64()),
            "l_linenumber": pa.array([r[3] for r in li_rows], pa.int32()),
            "l_quantity": pa.array([r[4] for r in li_rows], pa.float64()),
            "l_extendedprice": pa.array([r[5] for r in li_rows], pa.float64()),
            "l_discount": pa.array([r[6] for r in li_rows], pa.float64()),
            "l_tax": pa.array([r[7] for r in li_rows], pa.float64()),
            "l_returnflag": pa.array([r[8] for r in li_rows]),
            "l_linestatus": pa.array([r[9] for r in li_rows]),
            "l_shipdate": pa.array([r[10] for r in li_rows], pa.timestamp("us")),
        }
    )
    return orders, lineitem


@pytest.mark.parametrize("seed", [67, 3030])
def test_behavioral_randomized_oracle_agreement(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = tmp_path / f"bhv{seed}"
    root.mkdir()
    pq.write_table(_build_events(rng), str(root / "events.parquet"))
    orders, lineitem = _build_orders_lineitem(rng)
    pq.write_table(orders, str(root / "orders.parquet"))
    pq.write_table(lineitem, str(root / "lineitem.parquet"))
    sweep_check(spark, str(root), SWEPT_EVENTS + SWEPT_ORDERS, ("events", "orders", "lineitem"), seed)
