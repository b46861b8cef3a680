"""Generator throughput probe used by /root/repo/bench.py.

Measures the sharded scale path (B34) end-to-end: driver pattern
build → 32 applyInPandas tasks each running the sequential NumPy
recurrence → full materialization via count. Baseline context: the
reference generates ~98k ev/s single-threaded at the same canonical
config (BASELINE.md); the sharded path should scale roughly linearly
with cores.
"""

from __future__ import annotations

import dataclasses
import os
import time

from pyspark.sql import SparkSession

from eventstream_benchmark_spark.generator.queries import (
    GOLDEN_PATTERNS,
    GOLDEN_STREAM,
    PUREDF_STREAM,
)
from eventstream_benchmark_spark.generator.spark_gen import (
    stream_df_pure,
    stream_df_sharded,
)

# Sustained-throughput scale: at 3.2M events the ~0.5 s fixed job cost
# (task dispatch + the slowest-vCPU straggler tail) was a third of the
# wall and made the ev/s number track VM scheduling noise, not the
# engine (r2 6.8M vs r3 4.3M on identical code). 12.8M events with a
# measured marginal rate of ~11M ev/s puts the fixed cost under 10%.
BENCH_EVENTS = 12_800_000


def generator_events_per_sec(
    spark: SparkSession, n_events: int = BENCH_EVENTS
) -> list[float]:
    """Per-run ev/s rates (3 samples). The caller records max AND the
    true median — round-8 verdict #4: a single best-of number hid a
    5.8-10.3M swing across the round, so the per-round record carries
    the probe's own median alongside the floor-noise-immune max."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # 2 task waves per core: equal-sized shards finish unequally on
    # this VM (per-vCPU clock spread), and halving the task size lets
    # fast cores absorb the stragglers' second wave — measured 10.2M
    # vs 8.1M ev/s at 1 wave. The driver-facing generate_stream_sharded
    # query keeps its pinned 32-shard config; this is bench-only.
    shards = 2 * cpus
    # spin up the Python workers first so the measurement is generation,
    # not process startup (the reference baseline likewise excludes
    # interpreter startup)
    warm = dataclasses.replace(GOLDEN_STREAM, total_events=shards * 1_000)
    stream_df_sharded(spark, GOLDEN_PATTERNS, warm, n_shards=shards).count()
    cfg = dataclasses.replace(GOLDEN_STREAM, total_events=n_events)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = stream_df_sharded(spark, GOLDEN_PATTERNS, cfg, n_shards=shards).count()
        rates.append(round(n_events / (time.perf_counter() - t0)))
        assert n == n_events
    return rates


def csv_export_rows_per_sec(
    spark: SparkSession, n_rows: int = 1_000_000
) -> list[float]:
    """A10 CSV sink throughput at the baseline's 1M-row scale
    (reference: ~385k rows/s via np.savetxt — BASELINE.md)."""
    import shutil
    import tempfile

    from eventstream_benchmark_spark.generator.spark_gen import write_csv

    shards = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    cfg = dataclasses.replace(GOLDEN_STREAM, total_events=n_rows)
    df = stream_df_sharded(spark, GOLDEN_PATTERNS, cfg, n_shards=shards)
    rates = []
    for _ in range(3):
        out = tempfile.mkdtemp(prefix="esb_csv_bench_")
        try:
            t0 = time.perf_counter()
            write_csv(df, out)
            rates.append(round(n_rows / (time.perf_counter() - t0)))
        finally:
            shutil.rmtree(out, ignore_errors=True)
    return rates


def puredf_events_per_sec(
    spark: SparkSession, n_events: int = BENCH_EVENTS
) -> list[float]:
    """Throughput of the fully declarative generator (round 8): the
    same event budget as the sharded probe, but produced by one
    Catalyst plan (broadcast schedule + expr samplers + per-shard
    window) with zero Python workers — measures what whole-stage
    codegen does with the generation workload vs the applyInPandas
    NumPy path."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shards = 2 * cpus
    warm = dataclasses.replace(PUREDF_STREAM, total_events=shards * 1_000)
    stream_df_pure(spark, GOLDEN_PATTERNS, warm, n_shards=shards).count()
    cfg = dataclasses.replace(PUREDF_STREAM, total_events=n_events)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = stream_df_pure(spark, GOLDEN_PATTERNS, cfg, n_shards=shards).count()
        rates.append(round(n_events / (time.perf_counter() - t0)))
        assert n == n_events
    return rates
