"""Seeded randomized oracle sweeps for the IO surface and the
Structured Streaming batch-twins.

The roundtrip lanes (CSV strict + permissive, JSONL, ORC, XML,
schema evolution, partitioned/range exports, Z-order layout, DPP and
bucketed joins) prove write→read losslessness against the ORIGINAL
table's aggregate — a contract worth re-rolling because the values
that break interchange formats are data-dependent (quoting, escaped
JSON in CSV fields, negative and bucket-edge doubles, empty
partitions). The streaming twins replay the same fixture through
``readStream`` with watermarks/state and must land exactly on their
batch oracle — re-rolled inputs re-derive every watermark cut,
session merge, and state timeout from scratch.

Planted shapes: duplicate (user_id, event_type) pairs at distinct
timestamps (the watermark dedup keeps exactly one), session gaps
straddling the 30-min session window, clicks and purchases at the
identical timestamp (the stream-stream join's inclusive bound),
users whose first event falls in different days (growth cohorts),
multi-day spans (incremental rollup partitions), and negative /
bucket-edge values through the format encoders.
"""

from __future__ import annotations

import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.sweep_util import quarter as _quarter, sweep_check

BASE_US = 1_706_000_000_000_000
DAY_US = 86_400_000_000

SWEPT_IO = (
    "scan_parquet_project_filter",
    "scan_csv_roundtrip",
    "scan_csv_permissive",
    "scan_jsonl_roundtrip",
    "scan_orc_roundtrip",
    "scan_xml_roundtrip",
    "scan_schema_evolution",
    "export_range_partitioned",
    "export_shard_manifest",
    "write_partitioned_pruned",
    "layout_zorder_skipping",
    "join_dpp_partition_pruned",
    "join_bucketed_colocated",
    "multimodal_binaryfile_ingest",
    "udf_surface",
    "udtf_surface",
)
SWEPT_STREAMING = (
    "streaming_replay_tumbling",
    "streaming_session_window",
    "streaming_dedup_watermark",
    "streaming_growth_users",
    "streaming_incremental_rollup",
    "streaming_join_clicks_purchases",
    "streaming_left_outer_join",
    "streaming_static_enrich",
    "streaming_ewma_state",
    "streaming_pattern_state",
    "streaming_rate_replay",
    "streaming_foreach_batch_sink",
)
TYPES = ["view", "click", "cart", "purchase", "error"]




def _build_fixture(rng: random.Random, root) -> str:
    ev_rows, eid = [], 0
    for uid in range(rng.randint(5, 10)):
        t = BASE_US + rng.randint(0, 3) * DAY_US
        for _ in range(rng.randint(5, 40)):
            roll = rng.random()
            if roll < 0.1:
                t += rng.choice([29, 30, 31]) * 60_000_000  # session gap edge
            elif roll < 0.2:
                pass  # identical ts: join bound + dedup tie
            else:
                t += rng.randint(1_000_000, 6 * 3_600_000_000)
            if rng.random() < 0.05:
                # exact-hour snap: the streaming tumbling/rollup
                # windows are half-open [start, end) — an event at
                # precisely the edge decides bucket assignment
                t = (t // 3_600_000_000) * 3_600_000_000
            value = rng.choice(
                [-12.5, 0.0, 25.0, _quarter(rng, -50, 400)]
            )
            ev_rows.append(
                (eid, t, uid, rng.choice(TYPES), value,
                 '{"k": %d}' % rng.randint(0, 9))
            )
            eid += 1
    # sentinel trailing CLICK + PURCHASE: the stream-stream outer
    # join's OUTER_JOIN_CUTOFF (2024-01-30 18:00) presumes both
    # sides' watermarks run hours past it (the driver fixture ends
    # ~5.4 h after, with both types present in the tail) so the final
    # watermark releases every unmatched pre-cutoff click from state.
    # Each side's watermark node sits AFTER its event_type filter, so
    # the sentinel must exist on BOTH sides; at 2024-01-31 15:00 it
    # is > 1 h past every pre-cutoff click's join window (no spurious
    # match) and both engines exclude it from the aggregate (>= cutoff)
    ev_rows.append((eid, 1_706_713_200_000_000, 0, "click", 1.0, '{"k": 0}'))
    ev_rows.append(
        (eid + 1, 1_706_713_200_000_000, 0, "purchase", 1.0, '{"k": 0}')
    )
    ev_rows.sort(key=lambda r: (r[1], r[0]))
    events = pa.table(
        {
            "event_id": pa.array([r[0] for r in ev_rows], pa.int64()),
            "ts": pa.array([r[1] for r in ev_rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in ev_rows], pa.int64()),
            "event_type": pa.array([r[3] for r in ev_rows]),
            "value": pa.array([r[4] for r in ev_rows], pa.float64()),
            "props": pa.array([r[5] for r in ev_rows]),
        }
    )
    # orders must STRADDLE the 1997-01-01 evolution cutoff: the
    # schema-evolution oracle emits a row for BOTH parquet
    # generations unconditionally (fixture contract — an empty
    # generation would drop Spark's group but not the oracle's row)
    evo_cutoff_us = 852_076_800_000_000  # 1997-01-01 UTC
    o_rows = []
    for okey in range(1, rng.randint(20, 40) + 1):
        o_rows.append(
            (okey, rng.randint(1, 10), rng.choice("FO"),
             _quarter(rng, 1, 300),
             evo_cutoff_us + rng.choice([-1, 0, rng.randint(-400, 400)])
             * DAY_US,
             rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]))
        )
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
    custkeys = list(range(1, 11))
    customer = pa.table(
        {
            "c_custkey": pa.array(custkeys, pa.int64()),
            "c_name": pa.array([f"Customer#{k}" for k in custkeys]),
            "c_nationkey": pa.array(
                [rng.randint(0, 4) for _ in custkeys], pa.int32()
            ),
            "c_acctbal": pa.array(
                [_quarter(rng, -20, 100) for _ in custkeys], pa.float64()
            ),
            "c_mktsegment": pa.array(
                [rng.choice(["BUILDING", "MACHINERY"]) for _ in custkeys]
            ),
        }
    )
    texts = [
        " ".join(rng.choice(["alpha", "beta", "gamma"]) for _ in
                 range(rng.randint(1, 20)))
        for _ in range(rng.randint(6, 12))
    ]
    documents = pa.Table.from_pandas(
        pd.DataFrame(
            [(i, t, "en", rng.choice(["src0", "src1"]), len(t))
             for i, t in enumerate(texts)],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        ),
        preserve_index=False,
    )
    root.mkdir()
    pq.write_table(events, str(root / "events.parquet"))
    pq.write_table(orders, str(root / "orders.parquet"))
    pq.write_table(customer, str(root / "customer.parquet"))
    pq.write_table(documents, str(root / "documents.parquet"))
    return str(root)


_TABLES = ("events", "orders", "customer", "documents")


@pytest.mark.parametrize("seed", [89, 1234])
def test_io_randomized_oracle_agreement(spark, tmp_path, seed):
    rng = random.Random(seed)
    sf = _build_fixture(rng, tmp_path / f"io{seed}")
    sweep_check(spark, sf, SWEPT_IO, _TABLES, seed)


@pytest.mark.parametrize("seed", [97, 2468])
def test_streaming_randomized_oracle_agreement(spark, tmp_path, seed):
    rng = random.Random(seed)
    sf = _build_fixture(rng, tmp_path / f"st{seed}")
    sweep_check(spark, sf, SWEPT_STREAMING, _TABLES, seed)
