"""Driver entries for the Layer A generator (B33-B35).

All rows-only: the outputs are draws from NumPy RNG streams that no
SQL engine reproduces (SURVEY §4.2 RNG note) — correctness is carried
by the golden/property tests in ``tests/test_generator.py``, and the
driver's rows-only check confirms the operators run and return stable
row counts.

The configs pin the reference's canonical ``main.py`` example
(``main.py:4-38``): 8 patterns × L=10 over 6 types, poisson(6)±1
noise intervals, ±2 pattern jitter, sin density (period 8000,
amp 0.6) — with a sharded-scale variant at 8×.
"""

from __future__ import annotations

import dataclasses

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_benchmark_spark.generator.config import PatternConfig, StreamConfig
from eventstream_benchmark_spark.generator import spark_gen

GOLDEN_PATTERNS = PatternConfig(
    n_patterns=8, pattern_length=10, n_types=6,
    gap_dist="uniform", gap_low=3, gap_high=9, seed=137,
)

GOLDEN_STREAM = StreamConfig(
    n_types=6, total_events=40_000, random_ratio=0.7, seed=2025,
    pattern_jitter="uniform", pattern_jitter_amount=2,
    rand_interval_dist="poisson", rand_interval_base=6,
    rand_interval_low=None, rand_interval_high=None,
    rand_jitter="uniform", rand_jitter_amount=1,
    density_mode="sin", density_period=8000, density_amp=0.6,
    density_base_rate=1.0,
)

SCALE_SHARDS = 32
SCALE_STREAM = dataclasses.replace(GOLDEN_STREAM, total_events=320_000)


def generate_patterns_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33 — the pattern set as scalar rows (A5/A6).

    ``patterns_df`` keeps the reference's matrix shape (types[n,L],
    gaps[n,L-1] — ``eventstream.py:124-126``) as array columns for
    internal use; the driver-facing result is
    ``posexplode(arrays_zip(...))`` to one row per pattern position so
    the rows-only canonicalizer (a pandas sort) sees hashable scalars.
    ``gap`` is null at the final position (L-1 gaps for L types)."""
    pats = spark_gen.patterns_df(spark, GOLDEN_PATTERNS)
    return (
        pats.select(
            "pattern_id",
            F.posexplode(F.arrays_zip("types", "gaps")).alias("pos", "z"),
        )
        .select(
            "pattern_id",
            "pos",
            F.col("z.types").alias("event_type"),
            F.col("z.gaps").alias("gap"),
        )
        .orderBy("pattern_id", "pos")
    )


def generate_stream_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34 (exact mode) — the golden-config stream, bit-compatible
    with the reference; summarized per (event_type, is_pattern) so the
    driver check is compact while still covering every generated row."""
    df = spark_gen.stream_df_exact(spark, GOLDEN_PATTERNS, GOLDEN_STREAM)
    return (
        df.groupBy("event_type", "is_pattern")
        .agg(
            F.count("*").alias("n"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.sum("ts").alias("sum_ts"),
        )
        .orderBy("event_type", "is_pattern")
    )


def generate_stream_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34 (scale mode) — 8× the golden config across 32 parallel
    applyInPandas shards; per-shard invariant summary (monotone ts,
    achieved ratio) so the driver sees one row per shard."""
    df = spark_gen.stream_df_sharded(spark, GOLDEN_PATTERNS, SCALE_STREAM, SCALE_SHARDS)
    return (
        df.groupBy("shard")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg(F.col("is_pattern").cast("double")), 3).alias("pattern_frac"),
            F.max("ts").alias("span_ticks"),
        )
        .orderBy("shard")
    )


def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35 — the three Python-execution entry points the engine uses,
    in one query over the events fixture: a scalar UDF (row-at-a-time,
    the deliberately-slow path kept off hot loops), an Arrow-batched
    pandas UDF (the A3 Poisson sampler shape), and a grouped-map
    applyInPandas (per-type summary, the B34 shard shape)."""
    import numpy as np

    from eventstream_benchmark_spark.io import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    tag = F.udf(lambda event_type: f"t:{event_type}", "string")  # scalar UDF

    @F.pandas_udf("long")
    def poisson_of(value: pd.Series) -> pd.Series:  # vectorized sampler (A3 shape)
        lam = value.clip(lower=0.1).to_numpy(dtype="float64")
        rng = np.random.default_rng(7)
        return pd.Series(np.maximum(1, rng.poisson(lam)))

    def per_type(pdf: pd.DataFrame) -> pd.DataFrame:  # grouped map
        return pd.DataFrame(
            {
                "tag": [pdf["tag"].iloc[0]],
                "n": [len(pdf)],
                "mean_draw": [float(pdf["draw"].mean())],
            }
        )

    tagged = events.withColumn("tag", tag("event_type")).withColumn("draw", poisson_of("value"))
    return (
        tagged.groupBy("tag")
        .applyInPandas(per_type, "tag string, n long, mean_draw double")
        .select("tag", "n")  # mean_draw is sample-dependent; row counts are stable
        .orderBy("tag")
    )


def pattern_recovery_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The benchmark loop closed end-to-end: generate the stream
    (Layer A), run the B32 lead-chain sequence matcher over it, and
    score recovery against the generator's own ``is_pattern`` ground
    truth — the reference's built-in answer key
    (``eventstream.py:306``; README's "sequence-learning systems"
    consumers are exactly this loop).

    The matcher hunts pattern 0's full type sequence (length L) as
    contiguous events — patterns embed intact
    (``eventstream.py:293``) — and every candidate start is labeled
    true (all L events carry is_pattern) or coincidence. Runs on the
    sharded scale stream: pattern instances never cross shard
    boundaries by construction, so the lead-chains window partitions
    by shard and the plan reuses the generation partitioning — no
    global ordering, no single-partition window, valid at any shard
    count.

    Deterministic (SeedSequence-spawned shard RNGs), so the oracle is
    a precomputed-constant row pinned by ``tests/test_generator.py``
    against a fresh run."""
    import functools
    import operator

    from pyspark.sql import Window as W

    from eventstream_benchmark_spark.generator import core
    from eventstream_benchmark_spark.operators._util import bigint

    types, _gaps = core.build_patterns(GOLDEN_PATTERNS)
    seq = [int(x) for x in types[0]]
    df = spark_gen.stream_df_sharded(spark, GOLDEN_PATTERNS, SCALE_STREAM, SCALE_SHARDS)
    w = W.partitionBy("shard").orderBy("event_id")
    type_at = lambda i: F.col("event_type") if i == 0 else F.lead("event_type", i).over(w)
    label_at = lambda i: F.col("is_pattern") if i == 0 else F.lead("is_pattern", i).over(w)
    matched = functools.reduce(
        operator.and_, [type_at(i) == seq[i] for i in range(len(seq))]
    )
    all_true = functools.reduce(operator.and_, [label_at(i) for i in range(len(seq))])
    scored = df.select(
        "is_pattern", matched.alias("m"), (matched & all_true).alias("tp")
    )
    return scored.agg(
        bigint(F.sum(F.col("m").cast("long"))).alias("n_matches"),
        bigint(F.sum(F.col("tp").cast("long"))).alias("n_true_matches"),
        bigint(F.sum((F.col("m") & ~F.col("tp")).cast("long"))).alias("n_coincidences"),
        bigint(F.sum(F.col("is_pattern").cast("long"))).alias("n_pattern_events"),
    )


QUERIES = {
    "generate_patterns_spark": generate_patterns_spark,
    "generate_stream_exact": generate_stream_exact,
    "generate_stream_sharded": generate_stream_sharded,
    "udf_surface": udf_surface,
    "pattern_recovery_scored": pattern_recovery_scored,
}

# The exact-mode stream is a pure function of (GOLDEN_PATTERNS,
# GOLDEN_STREAM) — same seed, same NumPy bit stream, same 40k events —
# so its per-(type, label) summary carries a precomputed-constant
# oracle: the driver's hash check then covers the generator end-to-end
# instead of a rows-only count. Constants generated by
# core.build_stream on NumPy 1.26.4; tests/test_generator.py pins them
# against a fresh run so an environment drift fails loudly here first.
_EXACT_SUMMARY_ROWS = (
    (0, "false", 4621, 99, 233796, 537665071),
    (0, "true", 1675, 21, 233721, 198042219),
    (1, "false", 4665, 56, 233768, 542202656),
    (1, "true", 1932, 31, 233594, 221848269),
    (2, "false", 4707, 8, 233821, 545826125),
    (2, "true", 2488, 8, 233711, 286588082),
    (3, "false", 4571, 93, 233811, 529534123),
    (3, "true", 1911, 35, 233696, 226847207),
    (4, "false", 4709, 75, 233814, 552491186),
    (4, "true", 1854, 22, 233727, 214418854),
    (5, "false", 4727, 63, 233806, 554250172),
    (5, "true", 2140, 40, 233717, 249061335),
)

# Deterministic function of (GOLDEN_PATTERNS, SCALE_STREAM, 32 shards) —
# same contract as _EXACT_SUMMARY_ROWS; pinned against a fresh run by
# tests/test_generator.py::test_pattern_recovery_constants.
PATTERN_RECOVERY_ROW = (1187, 1187, 0, 96000)

ORACLES: dict[str, str] = {
    "pattern_recovery_scored": (
        "SELECT CAST({} AS BIGINT) AS n_matches,"
        " CAST({} AS BIGINT) AS n_true_matches,"
        " CAST({} AS BIGINT) AS n_coincidences,"
        " CAST({} AS BIGINT) AS n_pattern_events".format(*PATTERN_RECOVERY_ROW)
    ),
    # the Poisson draw is projected away before the final select, so
    # the surviving (tag, n) output is deterministic and hash-checkable
    "udf_surface": """
        SELECT 't:' || event_type AS tag, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "generate_stream_exact": (
        "SELECT CAST(c0 AS INTEGER) AS event_type,"
        " CAST(c1 AS BOOLEAN) AS is_pattern, CAST(c2 AS BIGINT) AS n,"
        " CAST(c3 AS BIGINT) AS min_ts, CAST(c4 AS BIGINT) AS max_ts,"
        " CAST(c5 AS BIGINT) AS sum_ts FROM (VALUES "
        + ", ".join(f"({t}, {p}, {n}, {lo}, {hi}, {s})"
                    for t, p, n, lo, hi, s in _EXACT_SUMMARY_ROWS)
        + ") v(c0, c1, c2, c3, c4, c5) ORDER BY event_type, is_pattern"
    ),
}
