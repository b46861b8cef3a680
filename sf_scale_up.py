"""Synthesize an N× scale-up of a fixture directory for the bench's
sf1 lane (bench.py), entirely with Spark.

Facts (orders/lineitem/events/documents/embeddings) are replicated
``copies`` times with their primary keys shifted by copy·K (K = max
key + 1, so copies never collide) while foreign keys into the dims
stay put — the classic way to grow a star schema without breaking
referential integrity: dims stay dim-sized, fact fan-in grows N×,
and text/embedding payloads become exact N-way duplicates (which is
precisely the hot-bucket stress the dedup lane needs). Dims are
copied as-is.

The output is cached under /tmp keyed by (source dir, copies); the
driver's per-round bench pays the build once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import TABLES, load_table

# table -> primary-key column to shift per copy (None = dim, copy 1x)
_FACT_KEYS = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _replicate(spark: SparkSession, df: DataFrame, keys: tuple[str, ...],
               offset: int, copies: int,
               ts_span_us: int | None = None) -> DataFrame:
    """Cross-join against a tiny copy index (broadcast — no shuffle on
    the fact side) and shift each listed key by copy·offset. When
    ``ts_span_us`` is given, each copy's ``ts`` also shifts into its
    own disjoint time range — otherwise 10 same-timestamp copies of
    every event interleave and break sequence/adjacency semantics
    (lead-chain pattern matching would see zero intact sequences)."""
    idx = F.broadcast(spark.range(copies).withColumnRenamed("id", "_copy"))
    out = df.crossJoin(idx)
    for k in keys:
        out = out.withColumn(k, F.col(k) + F.col("_copy") * F.lit(offset))
    if ts_span_us is not None:
        out = out.withColumn(
            "ts",
            F.timestamp_micros(
                F.unix_micros("ts") + F.col("_copy") * F.lit(ts_span_us)
            ),
        )
    return out.drop("_copy")


def _src_fingerprint(src: str) -> str:
    """Content fingerprint of the source fixture: (relative path, size,
    mtime) of every file under it. Folded into the completion marker so
    a regenerated fixture (same basename, different content) forces a
    rebuild instead of silently serving the stale scaled copy."""
    import hashlib

    parts = []
    for root, _dirs, files in sorted(os.walk(src)):
        for fn in sorted(files):
            p = os.path.join(root, fn)
            st = os.stat(p)
            parts.append((os.path.relpath(p, src), st.st_size, int(st.st_mtime)))
    return hashlib.md5(repr(parts).encode()).hexdigest()


# Bumped whenever the WRITER's output layout changes (folded into the
# completion marker next to the source fingerprint) so a cached scaled
# dir built by an older writer is rebuilt instead of silently served.
_LAYOUT_VERSION = "v2-32files"

# fact tables are written as this many part files. One 10x-replicated
# fact lands in a SINGLE ~1-44 MB parquet file otherwise (the
# broadcast-crossJoin replicate inherits the source scan's one
# partition), i.e. ONE row group — and a one-row-group file is
# unsplittable, so every sf1 consumer's map side (tokenize, gram
# build, md5 probes, explodes) serialized onto one core no matter what
# maxPartitionBytes says. A real 100 TB table has ~800k row groups
# (SCALE.md "Scan layer"); 32 files per fact is the local[32] stand-in
# for that, fixed at WRITE time where it costs one build-time shuffle
# — never a query-side repartition, which would shuffle the full
# corpus at production scale just to undo a fixture artifact.
_FACT_FILES = 32


def ensure_scaled_dir(spark: SparkSession, src: str, copies: int = 10,
                      out_root: str = "/tmp/spark_graft_scaled") -> str:
    out = os.path.join(
        out_root, f"{os.path.basename(src.rstrip('/'))}_x{copies}"
    )
    marker = os.path.join(out, "_ALL_TABLES_OK")
    fp = f"{_LAYOUT_VERSION}:{_src_fingerprint(src)}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fp:
                return out
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        df = load_table(spark, src, name)
        keys = _FACT_KEYS.get(name)
        if keys:
            # orderkeys are shared between orders and lineitem: one
            # offset domain for both so the join lines up across copies
            key_src = "orders" if keys[0].endswith("orderkey") else name
            k = _FACT_KEYS[key_src][0] if key_src != name else keys[0]
            offset = load_table(spark, src, key_src).agg(
                (F.max(k) + 1).alias("m")
            ).collect()[0]["m"]
            ts_span_us = None
            if name == "events":
                lo, hi = df.agg(
                    F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
                ).collect()[0]
                ts_span_us = int(hi - lo) + 3_600_000_000  # +1h inter-copy gap
            df = _replicate(spark, df, keys, int(offset), copies, ts_span_us)
            # see _FACT_FILES: splittable multi-row-group layout, like
            # any real table this size; dims stay single-file
            df = df.repartition(_FACT_FILES)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write(fp)
    return out
