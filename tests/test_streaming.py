"""Structured Streaming tests (B36-B37, SURVEY §5.2.5).

- replay equality: the streaming tumbling aggregation equals the batch
  aggregation over the same fixture.
- watermark late-drop: synthetic lateness (the reference never emits
  out-of-order events — §1.2) injected as a second file; append-mode
  windows finalized before the late row arrive exclude it.
- stateful pattern tracking: the streaming state-machine totals match
  an offline replay of the same transition rules.
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import load_table
from eventstream_benchmark_spark.streaming.queries import (
    PATTERN_SEQ,
    streaming_pattern_state,
    streaming_replay_tumbling,
)


def test_replay_equals_batch(spark, sf_small):
    got = (
        streaming_replay_tumbling(spark, sf_small)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    events = load_table(spark, sf_small, "events")
    want = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Three-file replay with maxFilesPerTrigger=1: file3 carries a row
    hours older than the watermark established by files 1-2. The
    watermark advance lags its source batch by one (computed at batch
    N end, effective in batch N+1), so the middle file is what makes
    the 10-minute watermark live before the late row arrives —
    append-mode output must exclude it."""
    schema = "event_id long, ts timestamp, user_id long, v double"
    on_time = [(i, f"2024-01-01 0{h}:{m:02d}:00", 1, 1.0)
               for i, (h, m) in enumerate((hh, mm) for hh in range(5) for mm in (5, 25, 45))]
    mid = [(98, "2024-01-01 04:50:00", 1, 1.0)]
    late = [(99, "2024-01-01 01:07:00", 1, 1.0)]  # hours before the watermark

    src = str(tmp_path / "src")
    os.makedirs(src)
    import time as _time

    for batch in (on_time, mid, late):
        spark.createDataFrame(
            [(i, pd.Timestamp(t).to_pydatetime(), u, v) for i, t, u, v in batch], schema
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.2)  # file source orders batches by mod time

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.table(name).select(F.col("w.start").alias("ws"), "n").toPandas()
    hour1 = out[out["ws"] == pd.Timestamp("2024-01-01 01:00:00")]
    # 3 on-time rows in hour 1; the late 01:07 row must NOT be counted
    assert not hour1.empty
    assert int(hour1["n"].iloc[0]) == 3


def test_foreachbatch_sink_parquet(spark, sf_small, tmp_path):
    """B36's foreachBatch surface: replay the events fixture through a
    stream and land each micro-batch in a parquet sink via custom
    batch logic; total landed rows equal the source row count."""
    from eventstream_benchmark_spark.streaming.queries import _replay_dir

    src = _replay_dir(spark, sf_small)
    schema = load_table(spark, sf_small, "events").schema
    out = str(tmp_path / "landed")

    def land(batch_df, batch_id: int):
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    landed = spark.read.parquet(out)
    assert landed.count() == load_table(spark, sf_small, "events").count()
    assert "batch_id" in landed.columns


def test_pattern_state_matches_offline_replay(spark, sf_small):
    got = streaming_pattern_state(spark, sf_small).toPandas().set_index("user_id")

    events = (
        load_table(spark, sf_small, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for user, grp in events.groupby("user_id"):
        progress = completed = 0
        for et in grp["event_type"]:
            if et == PATTERN_SEQ[progress]:
                progress += 1
                if progress == len(PATTERN_SEQ):
                    completed += 1
                    progress = 0
            elif et == PATTERN_SEQ[0]:
                progress = 1
            else:
                progress = 0
        row = got.loc[user]
        assert int(row["n_events"]) == len(grp)
        assert int(row["completed"]) == completed, f"user {user}"
        assert int(row["progress"]) == progress, f"user {user}"


def test_foreachbatch_sinks_are_rerun_idempotent(spark, sf_small):
    """The fixed per-fixture sink root (`_fresh_sink`) is WIPED on every
    invocation, so back-to-back runs must produce identical results —
    a stale checkpoint would no-op the second replay and a stale sink
    would double-count (bench.py and the driver both invoke each query
    more than once per round)."""
    from eventstream_benchmark_spark.streaming import queries as sq

    for name in ("streaming_foreach_batch_sink", "streaming_incremental_rollup"):
        fn = sq.QUERIES[name]
        first = fn(spark, sf_small).toPandas()
        second = fn(spark, sf_small).toPandas()
        cols = sorted(first.columns)
        a = first.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
        b = second.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"{name}: rerun diverged"
