"""Seeded randomized oracle sweeps for the TPC-H SQL battery.

The 21 TPC-H adaptations are the repo's deepest Catalyst surface —
correlated EXISTS/NOT EXISTS, decorrelated scalar subqueries, HAVING
thresholds, null-aware NOT IN, cyclic join graphs, derived partsupp
CTEs — and the driver fixtures exercise them on one fixed dataset.
This sweep re-rolls the whole star schema per seed with the DECISION
POINTS planted:

* order/ship dates exactly AT every window boundary the queries use
  (1995-01-01, 1996-01-01, 1997-01-01, 1997-04-01, 1997-07-01,
  1998-01-01, plus 1 µs before each) — every predicate is half-open
  or inclusive somewhere, and both engines must cut identically;
* quantities exactly at Q6's ``< 24`` cut and on Q19's BETWEEN band
  edges (1, 11, 10, 20, 30);
* one whale order summing quantity to exactly 250 (Q18's strict
  ``> 250`` excludes it) and one clearly above;
* suppliers with negative balances (Q16's NOT IN exclusion),
  customers with zero orders and URGENT-only order sets (Q22's
  NOT EXISTS), and part names that start with 'blue' / contain 'red'
  (Q20/Q9's LIKE shapes);
* discount values restricted to dyadic {0, 1/16, 1/4, 1/2} — 1/16
  lies inside Q6's BETWEEN 0.05 AND 0.07 band — and all money on the
  quarter grid, so every raw ``round(sum(price·(1−disc)), 2)`` in the
  battery sums exactly representable addends and cannot depend on
  engine or partition summation order.

Suppliers are keyed 0..n−1 consecutively because the derived
partsupp CTE computes ``ps_suppkey = hash % count(supplier)``.
"""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.sweep_util import quarter as _quarter, sweep_check


def _us(y: int, m: int, d: int) -> int:
    return int(datetime(y, m, d, tzinfo=timezone.utc).timestamp()) * 1_000_000


BOUNDARIES = [
    _us(1995, 1, 1),
    _us(1996, 1, 1),
    _us(1996, 4, 1),
    _us(1997, 1, 1),
    _us(1997, 4, 1),
    _us(1997, 7, 1),
    _us(1998, 1, 1),
]
SPAN_LO, SPAN_HI = _us(1994, 6, 1), _us(1998, 9, 1)

REGIONS = ["ASIA", "AMERICA", "EUROPE"]
N_NATIONS = 8
BRANDS = ["Brand#2", "Brand#3", "Brand#11", "Brand#12", "Brand#23"]
PTYPES = ["PROMO", "ECONOMY", "LARGE", "STANDARD"]
PNAMES = [
    "big red box", "blue steel crate", "small green gear",
    "dim red panel", "blue oak frame", "plain tan sheet",
]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
DISCOUNTS = [0.0, 0.0625, 0.25, 0.5]  # dyadic; 1/16 sits in Q6's band

SWEPT = tuple(
    f"sql_tpch_q{n}"
    for n in (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
              17, 18, 19, 20, 21, 22)
)




def _date(rng: random.Random) -> int:
    if rng.random() < 0.25:  # exactly at a boundary, or 1 µs before it
        b = rng.choice(BOUNDARIES)
        return rng.choice([b, b - 1])
    return rng.randint(SPAN_LO, SPAN_HI)


def _build_fixture(rng: random.Random, root) -> str:
    region = pa.table(
        {
            "r_regionkey": pa.array(range(len(REGIONS)), pa.int32()),
            "r_name": pa.array(REGIONS),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(range(N_NATIONS), pa.int32()),
            "n_name": pa.array([f"NATION_{i}" for i in range(N_NATIONS)]),
            "n_regionkey": pa.array(
                [i % len(REGIONS) for i in range(N_NATIONS)], pa.int32()
            ),
        }
    )
    # consecutive 0..n-1 keys: the derived partsupp CTE mods into them
    n_supp = rng.randint(6, 10)
    supplier = pa.table(
        {
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": pa.array([f"Supplier#{k}" for k in range(n_supp)]),
            "s_nationkey": pa.array(
                [rng.randint(0, N_NATIONS - 1) for _ in range(n_supp)],
                pa.int32(),
            ),
            # Q16's NOT IN side must be non-empty: supplier 0's balance
            # is forced negative (seed 59 drew zero negatives randomly)
            "s_acctbal": pa.array(
                [-5.25] + [_quarter(rng, -20, 100) for _ in range(n_supp - 1)],
                pa.float64(),
            ),
        }
    )
    n_part = rng.randint(15, 30)
    p_rows = []
    for pk in range(1, n_part + 1):
        p_rows.append(
            (
                pk,
                rng.choice(PNAMES),
                rng.choice(BRANDS),
                rng.choice(PTYPES),
                rng.choice([1, 5, 9, 14, 23, rng.randint(1, 50),
                            rng.randint(10, 15)]),
                _quarter(rng, 1, 100),
            )
        )
    # guarantee Q2's filter (LARGE, size 10-15) is satisfiable
    p_rows[0] = (1, "blue steel crate", "Brand#12", "LARGE", 12,
                 _quarter(rng, 1, 100))
    p_rows[1] = (2, "dim red panel", "Brand#2", "STANDARD", 3,
                 _quarter(rng, 1, 100))  # Q17: Brand#2, size < 5
    part = pa.table(
        {
            "p_partkey": pa.array([r[0] for r in p_rows], pa.int64()),
            "p_name": pa.array([r[1] for r in p_rows]),
            "p_brand": pa.array([r[2] for r in p_rows]),
            "p_type": pa.array([r[3] for r in p_rows]),
            "p_size": pa.array([r[4] for r in p_rows], pa.int32()),
            "p_retailprice": pa.array([r[5] for r in p_rows], pa.float64()),
        }
    )
    n_cust = rng.randint(10, 20)
    custkeys = list(range(1, n_cust + 1))
    customer = pa.table(
        {
            "c_custkey": pa.array(custkeys, pa.int64()),
            "c_name": pa.array([f"Customer#{k}" for k in custkeys]),
            "c_nationkey": pa.array(
                [rng.randint(0, N_NATIONS - 1) for _ in custkeys], pa.int32()
            ),
            "c_acctbal": pa.array(
                [_quarter(rng, -50, 100) for _ in custkeys], pa.float64()
            ),
            "c_mktsegment": pa.array(
                [rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"])
                 for _ in custkeys]
            ),
        }
    )
    o_rows, li_rows = [], []
    okey = 1

    def add_order(ck, priority=None, n_lines=None, qty=None):
        nonlocal okey
        o_rows.append(
            (
                okey,
                ck,
                rng.choice("FO"),
                _quarter(rng, 1, 300),
                _date(rng),
                priority or rng.choice(PRIORITIES),
            )
        )
        for ln in range(n_lines or rng.randint(1, 5)):
            q = qty if qty is not None else rng.choice(
                [1.0, 10.0, 11.0, 20.0, 23.75, 24.0, 30.0,
                 _quarter(rng, 1, 60)]
            )
            li_rows.append(
                (
                    okey,
                    rng.randint(1, n_part),
                    rng.randint(0, n_supp - 1),
                    ln + 1,
                    q,
                    _quarter(rng, 1, 2000),
                    rng.choice(DISCOUNTS),
                    rng.choice([0.0, 0.25]),
                    rng.choice("ANR"),
                    rng.choice("FO"),
                    _date(rng),
                )
            )
        okey += 1

    # custkeys[0] is RESERVED out of the random loop so its one urgent
    # order below is genuinely its only order (Q22's NOT EXISTS shape;
    # the first spelling gave it random-priority orders too, leaving
    # the urgent-only customer to chance in both seeds)
    for ck in custkeys[1:]:
        for _ in range(rng.randint(0, 4)):  # some customers: zero orders
            add_order(ck)
    add_order(custkeys[0], priority="1-URGENT")
    # Q18 whales: exactly 250 total quantity (strict > excludes) and 300
    add_order(custkeys[1], n_lines=5, qty=50.0)
    add_order(custkeys[2], n_lines=6, qty=50.0)
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
    root.mkdir()
    for name, tbl in (
        ("region", region),
        ("nation", nation),
        ("supplier", supplier),
        ("part", part),
        ("customer", customer),
        ("orders", orders),
        ("lineitem", lineitem),
    ):
        pq.write_table(tbl, str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.parametrize("seed", [59, 5150])
def test_tpch_battery_randomized_oracle_agreement(spark, tmp_path, seed):
    rng = random.Random(seed)
    sf = _build_fixture(rng, tmp_path / f"tpch{seed}")
    sweep_check(spark, sf, SWEPT, ("region", "nation", "supplier", "part", "customer",
                 "orders", "lineitem"), seed)
