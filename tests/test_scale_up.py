"""sf_scale_up: the bench sf1 lane's N-times fixture synthesizer —
referential integrity and semantics of the key-shifted replication."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from sf_scale_up import ensure_scaled_dir
from eventstream_benchmark_spark.io import load_table


def test_scaled_dir_integrity(spark, sf_small):
    # fixed path, not mkdtemp: repeated suite runs reuse the marker'd
    # build instead of leaking one ~3x fixture tree per run
    out_root = os.path.join(tempfile.gettempdir(), "esb_scale_test")
    d = ensure_scaled_dir(spark, sf_small, copies=3, out_root=out_root)

    # facts replicate exactly copies x; dims stay 1x
    for t, factor in (("orders", 3), ("lineitem", 3), ("events", 3),
                      ("documents", 3), ("embeddings", 3),
                      ("customer", 1), ("nation", 1)):
        base = load_table(spark, sf_small, t).count()
        assert load_table(spark, d, t).count() == base * factor, t

    # primary keys stay unique after shifting
    for t, k in (("orders", "o_orderkey"), ("documents", "doc_id"),
                 ("events", "event_id"), ("embeddings", "vec_id")):
        df = load_table(spark, d, t)
        assert df.count() == df.select(k).distinct().count(), t

    # referential integrity: every lineitem still joins an order
    li = load_table(spark, d, "lineitem")
    orders = load_table(spark, d, "orders").select("o_orderkey")
    orphans = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).count()
    assert orphans == 0

    # event copies occupy disjoint time ranges (sequence semantics
    # survive replication — same user's copies never interleave)
    ev = load_table(spark, d, "events")
    base_ev = load_table(spark, sf_small, "events")
    n = base_ev.count()
    base_max = base_ev.agg(F.max("ts")).collect()[0][0]
    copy1_min = (
        ev.orderBy("event_id").limit(2 * n).orderBy(F.desc("event_id")).limit(n)
        .agg(F.min("ts")).collect()[0][0]
    )
    assert copy1_min > base_max

    # idempotent: second call reuses the marker, no rebuild
    assert ensure_scaled_dir(spark, sf_small, copies=3, out_root=out_root) == d

    # facts land as a SPLITTABLE multi-file layout (round 11): a 10x
    # replicate of a one-partition source otherwise writes ONE parquet
    # file = one row group, and an unsplittable row group serializes
    # every downstream map side (tokenize/gram/md5 work) onto one core
    # — the local stand-in for a real table's many row groups is many
    # files, fixed at write time, never by a query-side repartition
    from sf_scale_up import _FACT_FILES

    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        parts = [
            f for f in os.listdir(os.path.join(d, f"{t}.parquet"))
            if f.endswith(".parquet")
        ]
        assert len(parts) == _FACT_FILES, (t, len(parts))
    for t in ("customer", "nation"):
        parts = [
            f for f in os.listdir(os.path.join(d, f"{t}.parquet"))
            if f.endswith(".parquet")
        ]
        assert len(parts) == 1, (t, len(parts))
