"""Event-stream analytics pack (SURVEY.md §2.2 B28-B32).

The reference generates pattern-bearing event streams
(eventstream.py:288-409); these operators are the analytic consumers
such a stream exists to feed: windowed rates (the r(t) density concept,
eventstream.py:94-113), gap-based sessionization (pattern-boundary +1
pad, eventstream.py:383-384), type-distribution drift (README drift
feature), and fixed-sequence pattern matching (the benchmark's raison
d'être — recovering embedded patterns from noise).

All batch implementations are pure DataFrame ops: one shuffle per
groupBy/window on (user_id) or (window bucket), no UDFs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import load_table
from eventstream_benchmark_spark.operators._util import (
    bigint,
    duck_fmt_date,
    duck_fmt_ts,
    floor_micro,
    fmt_date,
    fmt_ts,
    null_safe_div,
    money_sum,
    r4,
    r6,
)

SESSION_GAP_MIN = 30  # minutes of silence that closes a session


# --------------------------------------------------------------------------
# B28 — tumbling-window event rate
# --------------------------------------------------------------------------


def stream_tumbling_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling window per type (batch form of the
    streaming B36 query; F.window so batch/stream plans share shape)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), money_sum(F.col("value")).alias("sum_value"))
        .select(
            fmt_ts(F.col("win.start")).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# B29 — sliding-window event rate
# --------------------------------------------------------------------------


def stream_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes. Spark assigns each event
    to 4 overlapping windows; oracle reproduces that assignment by
    exploding a 0..3 offset against the 15-minute floor.

    The window average is computed over 1e-4-quantized values with
    exact integer sums and a final 0-dp round (sf0.1 hardening:
    ``round(avg(double), 4)`` flipped a 4-dp boundary digit because the
    1e-4 grid isn't float-representable; 0-dp boundaries are)."""
    ev = load_table(spark, sf_dir, "events")
    v4 = F.round(F.col("value") * 10000, 0).cast("bigint")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(v4).alias("s4"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_s"),
            "event_type",
            "n",
            (F.round(F.col("s4") * F.lit(1.0) / F.col("n"), 0) / F.lit(10000.0)).alias(
                "avg_value"
            ),
        )
    )


# --------------------------------------------------------------------------
# B30 — gap-based sessionization (batch)
# --------------------------------------------------------------------------


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ids: a new session starts after >30 min of
    silence per user — lag + boundary flag + running sum (the batch
    twin of F.session_window used in streaming/)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("us")
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("us") - F.lag("us").over(w) > F.lit(gap_us), 1
        ).otherwise(0),
    )
    return flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats: session count, avg events/session,
    avg+max session duration (seconds)."""
    sessions = (
        _sessions(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            ((F.max("us") - F.min("us")) / 1_000_000.0).alias("dur_s"),
        )
    )
    return sessions.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        r4(F.avg("n_events")).alias("avg_events"),
        r4(F.avg("dur_s")).alias("avg_dur_s"),
        r6(F.max("dur_s")).alias("max_dur_s"),
        bigint(F.sum("n_events")).alias("total_events"),
    )


# --------------------------------------------------------------------------
# B31 — type-distribution drift per day
# --------------------------------------------------------------------------


def stream_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day share of each event type — drift in the type marginal is
    an explicit generator feature (eventstream.py:7-8)."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(fmt_date(F.date_trunc("day", F.col("ts"))).alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("day")
    return counts.select(
        "day",
        "event_type",
        "n",
        r6(F.col("n") / F.sum("n").over(w)).alias("share"),
    )


def stream_drift_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day type-distribution drift: L1 distance between
    consecutive days' event-type share vectors.

    Densifies the (day × type) grid first (missing combinations count
    as share 0 — a cross join of two tiny distinct sets, never the
    fact table), so the lag is well-defined for every type. This is
    the detector for the generator's type-drift feature
    (eventstream.py:7-8); a stable stream scores near 0, a drifting
    one spikes."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.count("*").alias("n"))
    grid = counts.select("d").distinct().crossJoin(
        counts.select("event_type").distinct()
    )
    dense = grid.join(counts, ["d", "event_type"], "left").fillna(0, ["n"])
    share = dense.withColumn(
        "share", F.col("n") / F.sum("n").over(W.partitionBy("d"))
    )
    w = W.partitionBy("event_type").orderBy("d")
    drift = share.withColumn("prev", F.lag("share").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return (
        drift.groupBy(fmt_date("d").alias("day"))
        .agg(r6(F.sum(F.abs(F.col("share") - F.col("prev")))).alias("l1_drift"))
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# B32 — fixed-sequence pattern matching (view -> click -> purchase)
# --------------------------------------------------------------------------

PATTERN = ("view", "click", "purchase")
# per-step bound on inter-event gap: 24h — fixture streams average ~11h
# between a user's events, so 1h would make the match set empty
PATTERN_MAX_GAP_S = 86_400


def pattern_match_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occurrences of the contiguous per-user sequence view→click→purchase
    with each step gap ≤ 24h — lead() chains over (user, ts, event_id),
    the Spark mirror of the reference's embedded contiguous patterns
    (eventstream.py:288-409; ties resolved per SURVEY §1.2)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"), "ts"
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    k = len(PATTERN)
    df = ev
    for step in range(1, k):
        df = df.withColumn(f"type_{step}", F.lead("event_type", step).over(w))
        df = df.withColumn(f"us_{step}", F.lead("us", step).over(w))
    cond = F.col("event_type") == PATTERN[0]
    prev = F.col("us")
    for step in range(1, k):
        cond = cond & (F.col(f"type_{step}") == PATTERN[step])
        cond = cond & (
            (F.col(f"us_{step}") - prev) <= PATTERN_MAX_GAP_S * 1_000_000
        )
        prev = F.col(f"us_{step}")
    return df.filter(cond).select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        fmt_ts("ts").alias("start_ts"),
        r6((F.col(f"us_{k-1}") - F.col("us")) / 1_000_000.0).alias("span_s"),
    )


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 history build from the event stream: collapse each user's
    event sequence into validity intervals of their current event_type
    (a change opens a new version, ``lead`` closes the previous one) —
    the CDC pattern that turns an append-only log into a
    slowly-changing dimension. Two windows over the same (user_id)
    shuffle — Catalyst plans one Exchange, the second window reuses the
    partitioning/sort. Output is the compact per-type interval summary;
    dwell time is epoch-µs integer subtraction summed in decimal(38,0)
    (exact past the ~9e18 µs a BIGINT sum wraps at), with ONE 0-dp
    round of the µs average and one display division — the integer-
    scaled spelling, replacing the round(avg(double),6) form whose
    6-dp .5 grid is not float-representable (the k-dp boundary-flip
    class the sf0.1 sweep caught in six other queries)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    intervals = changed.withColumn("valid_to", F.lead("ts").over(w))
    dwell_us = (F.unix_micros("valid_to") - F.unix_micros("ts")).cast(
        "decimal(38,0)"
    )
    sum_us = F.sum(dwell_us)  # null dwells (open intervals) skipped
    n_closed = F.sum(F.col("valid_to").isNotNull().cast("int"))
    return (
        intervals.groupBy("event_type")
        .agg(
            F.count("*").alias("n_versions"),
            bigint(n_closed).alias("n_closed"),
            F.when(
                n_closed > 0,
                F.round(sum_us.cast("double") / n_closed, 0)
                / F.lit(1_000_000.0),
            ).alias("avg_dwell_secs"),
        )
        .orderBy("event_type")
    )


def rollup_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (the continuous-aggregate pattern): daily
    stats derived by RE-aggregating the hourly aggregate — sum of
    sums, sum of counts, max hourly count as the peak — never
    re-scanning raw events. At 100 TB the hourly table is what a
    materialized rollup job maintains incrementally; dailies (and
    weeklies, monthlies) fold from it at 1/3600th the input size. The
    oracle recomputes the same two-level shape in DuckDB, proving the
    re-aggregation algebra exact.

    Round 9 closes the deferred cents migration (round-7/-8 verdicts):
    both rollup levels accumulate EXACT integer micro-units
    (round(value·1e6) as bigint — the same 1e-6 working resolution the
    cusum/LTTB family uses) and divide ONCE at the end, so the re-
    aggregation algebra is integer-exact at any scale — the old
    round(sum(double), 6) spelling was only hash-stable while
    accumulation noise stayed under the rounding step (~1e10 sums).
    This matches the streaming twin ``streaming_incremental_rollup``,
    which has kept integer-unit sums since round 5 — the pair's
    contract is now uniform and the round(sum(double)) boundary class
    is retired from the rollup family."""
    ev = load_table(spark, sf_dir, "events")
    v6 = F.round(F.col("value") * 1_000_000, 0).cast("long")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum(v6).alias("sum_v6"))
    return (
        hourly.groupBy(
            fmt_date(F.to_date(F.col("w.start"))).alias("day"), "event_type"
        )
        .agg(
            bigint(F.sum("n")).alias("n_events"),
            (F.sum("sum_v6") / F.lit(1_000_000.0)).alias("sum_value"),
            bigint(F.max("n")).alias("peak_hour_events"),
        )
        .orderBy("day", "event_type")
    )


TWAP_BUCKET_US = 3_600_000_000  # 1h segments for the boundary-halo lead


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event type (the TWAP
    shape of timeseries engines): each observation holds until the
    next one of the same type, so its weight is its dwell time. The
    weight arithmetic stays in integer µs until the single final
    division (epoch values never pass through doubles).

    Scale shape (round 11 — the fixed-cardinality-key window audit
    that retired the span/cluster windows, applied to the timeseries
    lane): ``lead(ts)`` needs only the NEXT observation, so it
    segments exactly. The former single window keyed on bare
    ``event_type`` sorted corpus/|types| rows in ONE task per type —
    event_type cardinality is FIXED (~10), so partition size grows
    linearly with the corpus, the same unbounded-key argument as the
    flood windows. Now: the lead runs per (event_type, hour-bucket) —
    partition size bounded by one type's events per hour — and each
    bucket's LAST row takes its successor from the next non-empty
    bucket's FIRST observation, computed as a partial-aggregable
    ``min(struct(ts, event_id))`` per bucket plus a lead over the
    BUCKET-level frame (rows = non-empty hours × types — grows with
    time, not volume). Order is ts-major, ties share a timestamp and
    therefore a bucket, so (bucket, ts, event_id) ≡ (ts, event_id)
    per type and the stitched lead is bit-identical to the global
    one; the bucket frame broadcasts into the join back. Sequential
    recurrences with unbounded frames (EWMA, CUSUM) keep the
    per-series window — their semantics NEED the total order — but a
    lead-1 never does."""
    ev = load_table(spark, sf_dir, "events")
    sel = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        # integer div, not floor(us / const): epoch-µs must never
        # transit a double (the repo-wide rule) — any monotone
        # bucketing is CORRECT here (order by (b, ts) ≡ order by ts
        # for monotone b), but the integer form is exact by
        # construction instead of by a 2^53 headroom argument
        F.expr(f"unix_micros(ts) div {TWAP_BUCKET_US}").alias("b"),
    )
    wb = W.partitionBy("event_type", "b").orderBy("ts", "event_id")
    # the halo needs only each bucket's FIRST ts — min(ts), since ts
    # is the major sort key (the event_id tiebreak orders equal-ts
    # rows but cannot change which ts is first). Deliberately a
    # SECOND 2-column pruned scan rather than a persist of `sel`:
    # caching a corpus-scale 5-column projection to save a pruned
    # (event_type, ts) re-read is a bad trade at 100 TB — the re-scan
    # is embarrassingly parallel and reads ~2 thin columns, while the
    # cache costs cluster memory/spill proportional to the fact table
    # (the substring-removal persist is the opposite case: its span
    # table is derived, CPU-expensive to rebuild, and consumed twice
    # within one shuffle span).
    firsts = (
        ev.select(
            "event_type",
            "ts",
            F.expr(f"unix_micros(ts) div {TWAP_BUCKET_US}").alias("b"),
        )
        .groupBy("event_type", "b")
        .agg(F.min("ts").alias("first_ts"))
    )
    w_buckets = W.partitionBy("event_type").orderBy("b")
    nxt = firsts.select(
        "event_type",
        "b",
        F.lead("first_ts").over(w_buckets).alias("next_first_ts"),
    )
    stepped = (
        sel.withColumn("next_in_bucket", F.lead("ts").over(wb))
        # no broadcast hint (round 12, advisor finding): the bucket
        # frame is non-empty hours × types — tiny today, but it grows
        # with corpus TIME SPAN (and shrinks with TWAP_BUCKET_US), and
        # a forced hint bypasses autoBroadcastJoinThreshold with no
        # fallback — a multi-decade corpus could OOM the driver. Left
        # to the optimizer, AQE broadcasts it at runtime while it fits
        # and degrades to a shuffle join when it doesn't.
        .join(nxt, ["event_type", "b"])
        .withColumn(
            "next_ts", F.coalesce("next_in_bucket", "next_first_ts")
        )
        .filter(F.col("next_ts").isNotNull())
        .withColumn(
            "dt_us", F.unix_micros("next_ts") - F.unix_micros("ts")
        )
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.count("*").alias("n_obs"),
            bigint(F.sum("dt_us")).alias("total_us"),
            # null_safe_div: a type whose consecutive observations all
            # share one microsecond timestamp (a coarse-granularity
            # source) has Σdt = 0 — ANSI Spark would raise where the
            # DuckDB twin's division yields NULL
            r6(
                null_safe_div(
                    F.sum(F.col("value") * F.col("dt_us")), F.sum("dt_us")
                )
            ).alias("twap"),
            r6(F.avg("value")).alias("plain_avg"),
        )
        .orderBy("event_type")
    )


def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward
    (the timeseries-engine gap_fill/locf pair): build the full
    hour×type spine, left-join the hourly aggregate, and fill silent
    hours with the last seen hourly average. The spine is generated
    from the global [min, max] hour — its size is bounded by the time
    range and the type vocabulary, never by event volume, so the
    explode and the spine×types cross join stay broadcast-tiny at any
    corpus scale; the event side pays one aggregate shuffle and the
    LOCF one window shuffle on event_type. The carried value is an
    exact INTEGER micro-average (sum of 1e-4-quantized values, scaled
    to 1e-6, 0-dp rounded — the sf0.1-proof pattern: the 1e-6 round
    grid of ``round(x, 6)`` isn't float-representable and flipped a
    boundary microdigit) divided once for display."""
    ev = load_table(spark, sf_dir, "events")
    hourly = _hourly_micro_avg(ev)
    grid = _hour_type_grid(hourly)
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = (
        grid.join(hourly, ["h", "event_type"], "left")
        .withColumn("is_gap", F.col("n").isNull())
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("v_i", F.last("avg_i", ignorenulls=True).over(w))
    )
    return filled.select(
        fmt_ts("h").alias("hour"),
        "event_type",
        bigint(F.col("n")).alias("n"),
        F.col("is_gap"),
        (F.col("v_i") / F.lit(1_000_000.0)).alias("v_filled"),
    ).orderBy("hour", "event_type")


def _hour_type_grid(hourly: DataFrame) -> DataFrame:
    """The complete hour × type spine over a prepared hourly
    aggregate. Bounds AND the type vocabulary both come off the
    aggregate — every type with an event has an hourly row, so
    enumerating ~5 type strings never rescans (or re-shuffles) the
    fact table, which the previous per-query ``ev.select(...).
    distinct()`` did; the grid stays bounded by time range ×
    vocabulary at any corpus size. Shared by ``events_gap_fill_locf``
    and ``events_resample_interp`` so the spine spelling can't
    desynchronize."""
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    return spine.crossJoin(hourly.select("event_type").distinct())


def _hourly_micro_avg(ev: DataFrame) -> DataFrame:
    """(h, event_type, n, avg_i): hourly count and the hourly average
    as an exact micro-scaled BIGINT — round(Σ round(v·1e4)·100 / n) —
    so every downstream carry/interpolation stays in integer space."""
    v4 = F.round(F.col("value") * 10000, 0).cast("bigint")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(v4).alias("s4"))
        .select(
            "h",
            "event_type",
            "n",
            F.round(F.col("s4") * F.lit(100.0) / F.col("n"), 0)
            .cast("bigint")
            .alias("avg_i"),
        )
    )


MAINT_START_H = 2  # daily maintenance window [02:00, 03:00)


def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: user sessions (intervals built by the
    B30 sessionizer) against a generated calendar of daily
    [02:00, 03:00) maintenance windows — "which sessions would a
    nightly maintenance window have interrupted, per day".  The
    overlap predicate is the classic half-open test
    ``s_start < w_end AND w_start <= s_end``.

    Scale shape: the window calendar is bounded by the DATE RANGE
    (one row per day — broadcast-tiny at any event volume), so the
    overlap join is a broadcast nested-loop whose cost is linear in
    sessions with a tiny constant — the right plan when one interval
    set is small.  (Big×big interval joins need bucketization instead
    — the same hour-explode trick events_gap_fill_locf's spine uses —
    at the cost of a dedup; not needed for a calendar side.)  Session
    endpoints are integer microseconds end to end, so both engines
    compare identical values."""
    ev = load_table(spark, sf_dir, "events")
    sess = (
        _sessions(spark, sf_dir)
        .groupBy("user_id", "session_id")
        .agg(F.min("us").alias("s_us"), F.max("us").alias("e_us"))
    )
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    windows = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    ).select(
        "day",
        (F.unix_micros("day") + MAINT_START_H * 3600 * 1_000_000).alias("w_start"),
        (F.unix_micros("day") + (MAINT_START_H + 1) * 3600 * 1_000_000).alias("w_end"),
    )
    overlap = (F.col("s_us") < F.col("w_end")) & (F.col("w_start") <= F.col("e_us"))
    return (
        sess.join(F.broadcast(windows), overlap)
        .groupBy(fmt_date("day").alias("day"))
        .agg(
            bigint(F.count("*")).alias("n_sessions"),
            bigint(F.countDistinct("user_id")).alias("n_users"),
        )
        .orderBy("day")
    )


def events_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with LINEAR interpolation — the
    companion to ``events_gap_fill_locf`` (step-fill) for signals
    where a straight line between observations is the better estimate
    (sensor readings, rates). Same bounded hour×type spine; silent
    hours get ``prev + (next − prev)·(t − t_prev)/(t_next − t_prev)``
    between the neighboring observed hourly averages, falling back to
    nearest-observation at the series edges.

    Cross-engine determinism (sf0.1-hardened): the neighbor values are
    exact micro-scaled INTEGERS (see ``_hourly_micro_avg``), the time
    fraction is a ratio of integer epoch seconds cast to double, and
    the interpolated correction ``(nv−pv)·frac`` is 0-dp rounded back
    into integer micro-space — so the only float ops are one identical
    multiply/divide pair and a 0-dp round both engines agree on. Two
    window shuffles on event_type (prev + next neighbor scans); the
    fact side pays one aggregate shuffle, exactly like LOCF."""
    ev = load_table(spark, sf_dir, "events")
    hourly = _hourly_micro_avg(ev)
    grid = _hour_type_grid(hourly)
    w_prev = W.partitionBy("event_type").orderBy("h").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_next = W.partitionBy("event_type").orderBy("h").rowsBetween(
        0, W.unboundedFollowing
    )
    obs_h = F.when(F.col("avg_i").isNotNull(), F.col("h"))
    joined = (
        grid.join(hourly, ["h", "event_type"], "left")
        .withColumn("is_gap", F.col("n").isNull())
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .withColumn("pv", F.last("avg_i", ignorenulls=True).over(w_prev))
        .withColumn("ph", F.last(obs_h, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("avg_i", ignorenulls=True).over(w_next))
        .withColumn("nh", F.first(obs_h, ignorenulls=True).over(w_next))
    )
    frac = (
        (F.unix_timestamp("h") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    v_i = (
        F.when(~F.col("is_gap"), F.col("avg_i"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + F.round((F.col("nv") - F.col("pv")) * frac, 0).cast("bigint")
        )
    )
    return joined.select(
        fmt_ts("h").alias("hour"),
        "event_type",
        bigint(F.col("n")).alias("n"),
        "is_gap",
        (v_i / F.lit(1_000_000.0)).alias("v_interp"),
    ).orderBy("hour", "event_type")


MAD_K = 3.0  # outlier threshold in MAD units


def stream_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: median + median-absolute-
    deviation of ``value``, then count events beyond MAD_K·MAD — the
    monitoring-side anomaly check a stream consumer runs (robust to the
    heavy tails that break mean/stddev z-scores). Two aggregation
    passes (median, then MAD of residuals) plus one flagging pass; the
    per-type stats are a handful of rows, so both join-backs are
    broadcasts and the events side is never shuffled — at 100 TB this
    is three scans and zero exchanges of the fact table.

    Decision-boundary hygiene (SCALE.md rule): Spark's ``percentile``
    and DuckDB's ``quantile_cont`` interpolate even-count medians one
    ulp apart (measured: 369.695 vs 369.69499999999994 for the pair
    213.47/525.92), and with 2-dp-grid values every |v−med| and
    MAD_K·mad is a multiple of 0.005 — exact-tie territory where a
    raw-double strict comparison flips per engine. So med/mad are
    snapped to micro integers BEFORE the comparison (the grid makes
    the snap lossless: meds land on 0.005, dev-medians on 0.0025 —
    both far from .5-micro boundaries) and the outlier test is pure
    integer arithmetic; the displayed med/mad are the same snapped
    values divided once."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("value") - F.col("med")).alias("dev"))
        .groupBy("event_type")
        .agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    )
    stats = med.join(mad, "event_type").select(
        "event_type",
        F.round(F.col("med") * 1_000_000, 0).cast("bigint").alias("med_u"),
        F.round(F.col("mad") * 1_000_000, 0).cast("bigint").alias("mad_u"),
    )
    v_u = F.round(F.col("value") * 1_000_000, 0).cast("bigint")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (F.first("med_u") / F.lit(1_000_000.0)).alias("med"),
            (F.first("mad_u") / F.lit(1_000_000.0)).alias("mad"),
            bigint(
                F.sum(
                    F.when(
                        F.abs(v_u - F.col("med_u")) > MAD_K * F.col("mad_u"),
                        1,
                    ).otherwise(0)
                )
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def events_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (type, hour) bucket, the opening value
    (first by (ts, event_id) — the §1.2 tie rule applied to bucket
    boundaries), high, low, close (last), and count — the candlestick
    rollup a charting/storage pipeline keeps instead of raw points.
    ``min_by``/``max_by`` over a (ts, event_id) struct pick open/close
    inside the same single aggregation pass as high/low — one shuffle
    keyed on (type, hour), no window, no second scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            r6(F.min_by("value", order_key)).alias("open_v"),
            r6(F.max("value")).alias("high_v"),
            r6(F.min("value")).alias("low_v"),
            r6(F.max_by("value", order_key)).alias("close_v"),
            bigint(F.count("*")).alias("n"),
        )
        .select(
            "event_type", fmt_ts("bucket").alias("bucket"),
            "open_v", "high_v", "low_v", "close_v", "n",
        )
        .orderBy("event_type", "bucket")
    )


EWMA_SPAN = 30  # trailing points per EWMA window


def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per event type with
    α = 1/2 over the trailing ``EWMA_SPAN`` points (pandas
    ``ewm(adjust=True)`` semantics: weights 2⁻ʲ normalized by their
    own partial sum, so early rows aren't biased toward the seed).

    α = 1/2 is chosen deliberately: every weight 2⁻ʲ and the
    normalizer 2 − 2⁻⁽ⁿ⁻¹⁾ are exact powers of two, multiplying a
    double by them only shifts the exponent, and the weighted terms
    are folded in fixed frame order — so the whole smoother is
    bit-deterministic across engines with zero transcendentals
    (the usual pow(1−α, j) EWMA is not hash-checkable).

    Scale shape: one shuffle keyed on event_type for the ordered
    window; the frame materializes ≤ EWMA_SPAN values per row (bounded
    state, same cost class as a moving average) and the fold is a
    single whole-stage expression — no join, no Python, no second
    pass."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), 0)
    )
    rev = F.reverse(F.collect_list("value").over(w))
    # single fold carrying (acc, weight): weight halves each step, so
    # term j is value·2⁻ʲ (an exact exponent shift); the final weight
    # 2⁻ⁿ yields the normalizer 2 − 2¹⁻ⁿ = 2 − 2·w without pow()
    ewma = F.aggregate(
        rev,
        F.struct(F.lit(0.0).alias("acc"), F.lit(1.0).alias("wt")),
        lambda s, x: F.struct(
            (s["acc"] + x * s["wt"]).alias("acc"), (s["wt"] / 2).alias("wt")
        ),
        lambda s: s["acc"] / (F.lit(2.0) - s["wt"] * 2),
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        r6(ewma).alias("ewma"),
    )


LTTB_BUCKETS = 40  # output points per series


def events_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (parallel variant):
    per event-type series, cut the (time, value) curve into
    ``LTTB_BUCKETS`` rank-equal buckets, pin the global first/last
    point, and in every interior bucket keep the point forming the
    largest triangle against the NEIGHBOR BUCKET AVERAGES (Steinarsson
    §4.2's LTTB uses the previously-selected point, which serializes
    bucket selection; anchoring on the prev-bucket average instead
    decouples every bucket — the published parallel/approximate
    variant — so the whole pass is two shuffles, not a sequential
    scan).

    Cross-engine determinism: x is whole seconds relative to the
    series start (exact bigint), y is integer cents (the operator's
    declared working resolution), so bucket sums are exact integers,
    the anchor averages are identical doubles, and every triangle
    area — computed with the same cross-product expression in both
    engines — ranks identically under the (area DESC, event_id)
    tiebreak.

    Scale shape: one window shuffle on event_type for ranks, one
    groupBy for the (series × buckets)-sized anchor table, which then
    BROADCASTS back against the point scan — no self-join on points,
    nothing quadratic, output is series×buckets rows."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w_series = W.partitionBy("event_type")
    w_order = w_series.orderBy("ts", "event_id")
    base = (
        ev.select(
            "event_id",
            "event_type",
            F.unix_seconds("ts").alias("sec"),
            bigint(F.round(F.col("value") * 100, 0)).alias("y"),
            "ts",
        )
        .withColumn("x", F.col("sec") - F.min("sec").over(w_series))
        .withColumn("rn", F.row_number().over(w_order) - 1)
        .withColumn("n", F.count("*").over(w_series))
        .withColumn(
            "bucket",
            F.least(
                F.lit(LTTB_BUCKETS - 1),
                F.expr(f"rn * {LTTB_BUCKETS} div n"),
            ).cast("bigint"),
        )
        .select("event_id", "event_type", "x", "y", "rn", "n", "bucket")
    )
    stats = base.groupBy("event_type", "bucket").agg(
        bigint(F.sum("x")).alias("sx"),
        bigint(F.sum("y")).alias("sy"),
        bigint(F.count("*")).alias("cnt"),
    )
    prev = stats.select(
        "event_type",
        (F.col("bucket") + 1).alias("bucket"),
        F.col("sx").alias("sxp"),
        F.col("sy").alias("syp"),
        F.col("cnt").alias("cp"),
    )
    nxt = stats.select(
        "event_type",
        (F.col("bucket") - 1).alias("bucket"),
        F.col("sx").alias("sxn"),
        F.col("sy").alias("syn"),
        F.col("cnt").alias("cn"),
    )
    # triangle area with the anchor-average denominators cleared:
    # S = |A·B − C·D| = area · cp²·cn is EXACT integer (decimal)
    # arithmetic, so the argmax never hinges on a float ulp (a naive
    # double cross product differs between engines at the last bit —
    # FMA contraction); the single S/(cp²·cn) division happens once,
    # on identical exact operands, for display only
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a_ = dec(F.col("sxp")) * F.col("cn") - dec(F.col("sxn")) * F.col("cp")
    b_ = dec(F.col("y")) * F.col("cp") - F.col("syp")
    c_ = dec(F.col("sxp")) - dec(F.col("x")) * F.col("cp")
    d_ = dec(F.col("syn")) * F.col("cp") - dec(F.col("syp")) * F.col("cn")
    # decimal(38,0) holds the product exactly to ~2e11 points/series
    # (a_·b_ ~ cnt³·T·y); past that non-ANSI Spark yields NULL, which
    # would sort LAST under the desc pick and silently degrade the
    # argmax to an arbitrary point — so a NULL area RAISES instead
    # (DuckDB's HUGEINT path raises on the same overflow, keeping the
    # two engines' failure mode aligned)
    s_raw = F.abs(a_ * b_ - c_ * d_)
    s_area = F.when(s_raw.isNotNull(), s_raw).otherwise(
        F.raise_error(
            "events_downsample_lttb: scaled triangle area overflowed "
            "decimal(38,0) — refusing to emit a degraded argmax"
        )
    )
    middle = (
        base.filter((F.col("bucket") > 0) & (F.col("bucket") < LTTB_BUCKETS - 1))
        .join(F.broadcast(prev), ["event_type", "bucket"])
        .join(F.broadcast(nxt), ["event_type", "bucket"])
        .withColumn("s_area", s_area)
    )
    w_pick = W.partitionBy("event_type", "bucket").orderBy(
        F.desc("s_area"), F.asc("event_id")
    )
    picked_mid = (
        middle.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select(
            "event_type",
            "bucket",
            "event_id",
            "x",
            "y",
            # the EXACT scaled area (area·cp²·cn) as a digit string:
            # rounding the normalized double to any decimal scale finer
            # than its ulp (~5e-7 at 1e9) is engine-specific, so the
            # verifiable artifact is the integer the ranking used
            F.col("s_area").cast("string").alias("area_scaled"),
        )
    )
    ends = base.filter((F.col("rn") == 0) | (F.col("rn") == F.col("n") - 1)).select(
        "event_type",
        "bucket",
        "event_id",
        "x",
        "y",
        F.lit(None).cast("string").alias("area_scaled"),
    )
    return picked_mid.unionAll(ends).orderBy("event_type", "bucket")


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition-matrix estimation over per-user
    event streams — the INVERSE of the reference's pattern generator
    (eventstream.py:85-95 emits type sequences from a pattern set;
    this estimates the type→type transition structure back from the
    merged stream): count consecutive (prev → cur) type pairs per
    user timeline, then normalize per source state.

    The probabilities are micro-scaled integers divided once (the
    0-dp-round rule), so the matrix is hash-exact; row counts are
    exact; a modeling consumer can feed the matrix straight into a
    sequence simulator.

    Scale shape: one shuffle on user_id for the lag, one map-side-
    combined aggregate to the (|types|², ~25-row) matrix, windows only
    over that matrix for the row totals."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("cur_type"))
        .agg(bigint(F.count("*")).alias("n"))
    )
    w_row = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "cur_type",
        "n",
        bigint(F.sum("n").over(w_row)).alias("row_total"),
        (
            F.round(F.col("n") * F.lit(1_000_000.0) / F.sum("n").over(w_row), 0)
            / F.lit(1_000_000.0)
        ).alias("prob"),
    ).orderBy("prev_type", "cur_type")


CUSUM_FACTOR = 5  # alarm when max CUSUM⁺ > FACTOR · mean |deviation|


def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection per event type: the classic
    sequential statistic Sₜ = Σ(xᵢ − target), CUSUM⁺ₜ = Sₜ − min Sₜ′≤ₜ
    — a persistent upward shift accumulates while noise cancels. The
    recurrence LOOKS sequential but is two stacked running windows
    (running sum, then running min), so it parallelizes like any
    prefix scan. Output per type: the peak CUSUM⁺, the event at the
    peak (the detected change point), and an alarm flag against a
    self-scaling threshold.

    Everything is exact integer arithmetic: values as cents, target =
    integer mean (floor division), running sums/mins of bigints, and
    the alarm comparison cross-multiplied (max_cusum·n >
    FACTOR·Σ|dev|) so no division ever rounds — bit-deterministic in
    both engines. The cross-multiplication itself runs in 128-bit
    integers (decimal(38,0) / HUGEINT): max_cusum grows ~shift·n
    under a real mean shift, so max_cusum·n is ~n² and wraps BIGINT
    at a few 1e9 events per type — silently reporting alarm=false on
    a genuinely shifted stream in non-ANSI Spark.

    Scale shape: one shuffle keyed on event_type for the windows (per-
    series sequential scan, the CUSUM lower bound), one tiny aggregate.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_id",
        "event_type",
        "ts",
        bigint(F.round(F.col("value") * 100, 0)).alias("cents"),
    )
    tgt = base.groupBy("event_type").agg(
        F.expr("CAST(sum(cents) div count(*) AS BIGINT)").alias("target")
    )
    w_run = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    dev = base.join(F.broadcast(tgt), "event_type").withColumn(
        "s", F.sum(F.col("cents") - F.col("target")).over(w_run)
    )
    cusum = dev.select(
        "event_id",
        "event_type",
        "cents",
        "target",
        (F.col("s") - F.min("s").over(w_run)).alias("cpos"),
        F.abs(F.col("cents") - F.col("target")).alias("absdev"),
    )
    peak_key = F.struct(F.col("cpos"), (-F.col("event_id")).alias("t"))
    return (
        cusum.groupBy("event_type")
        .agg(
            bigint(F.count("*")).alias("n"),
            bigint(F.max("cpos")).alias("max_cusum"),
            F.max_by("event_id", peak_key).alias("peak_event_id"),
            bigint(F.sum("absdev")).alias("sum_absdev"),
        )
        .withColumn(
            "alarm",
            F.col("max_cusum").cast("decimal(38,0)") * F.col("n")
            > F.lit(CUSUM_FACTOR).cast("decimal(38,0)") * F.col("sum_absdev"),
        )
        .orderBy("event_type")
    )


def _hour_spine_counts(ev: DataFrame, by_type: bool = False) -> DataFrame:
    """Per-hour event counts on the complete min..max hour spine
    (missing hours = 0) — the shared series builder of the hour-spine
    family (`events_acf_lags`, `events_forecast_backtest`,
    `events_dispersion_index`, `events_holt_trend`). One
    map-combinable groupBy over the fact table; the spine and the
    zero-fill join ride the hour-grid-sized aggregate. Returns
    (h, x) or, with ``by_type``, (event_type, h, x) over the
    types × spine grid."""
    keys = (["event_type"] if by_type else []) + ["h"]
    counts = (
        ev.select(
            *([F.col("event_type")] if by_type else []),
            F.expr("unix_seconds(ts) div 3600").alias("h"),
        )
        .groupBy(*keys)
        .agg(F.count("*").alias("x"))
    )
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"))
    if by_type:
        spine = counts.select("event_type").distinct().crossJoin(spine)
    return spine.join(counts, keys, "left").select(
        *keys, F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x")
    )


ACF_MAX_LAG = 6


def events_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1..6 —
    the seasonality detector feeding the reference's sin-density story
    (``_density_scale``, eventstream.py:94-113): a rate modulated with
    period P shows an ACF peak at lag P. Series = per-hour counts on
    the complete min..max hour spine (missing hours count 0, the
    gap-fill spine of ``events_gap_fill_locf``).

    Exact cross-engine arithmetic: with n hours and S = Σx, the
    centered product Σ(x_t−x̄)(x_{t+k}−x̄) is scaled by n² so every
    term is the exact integer (n·x_t − S)(n·x_{t+k} − S); numerator
    and denominator are BIGINT sums, and the displayed coefficient is
    floor(10⁶·num/den) — int→double conversion and one division are
    correctly rounded IEEE ops, and floor of the same double is
    engine-exact (the SCALE.md rule).

    Scale shape: one map-combinable (hour) groupBy over the fact
    table; everything after — spine, centering, the per-lag self-join
    — runs on the hour-grid-sized aggregate (≤ thousands of rows at
    any corpus size), the \"windows only over the matrix-sized
    aggregate\" pattern of ``events_markov_transitions``."""
    series = _hour_spine_counts(load_table(spark, sf_dir, "events"))
    tot = F.broadcast(
        series.agg(F.count("*").alias("n"), F.sum("x").alias("s"))
    )
    d = series.crossJoin(tot).select(
        "h", (F.col("n") * F.col("x") - F.col("s")).alias("dx")
    )
    # the centered products run in decimal(38,0) (DuckDB: HUGEINT):
    # dx ~ n·x ~ 1e14 at 100 TB rates, so dx² ~ 1e28 wraps BIGINT long
    # before the declared scale while 128-bit integers hold it exactly
    # — sums stay order-independent (a double sum would not), and the
    # one int→double conversion at the floor-micro boundary is the
    # same correctly-rounded IEEE op in both engines
    dxd = F.col("dx").cast("decimal(38,0)")
    den = F.broadcast(d.agg(F.sum(dxd * dxd).alias("den")))
    lagged = d.select(
        "h", F.col("dx").alias("dx_a"),
        F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("lag"),
    ).withColumn("h2", F.col("h") + F.col("lag"))
    pairs = lagged.join(
        d.select(F.col("h").alias("h2"), F.col("dx").alias("dx_b")), "h2"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            bigint(F.count("*")).alias("n_terms"),
            F.sum(
                F.col("dx_a").cast("decimal(38,0)") * F.col("dx_b")
            ).alias("num"),
        )
        .crossJoin(den)
        .select(
            bigint(F.col("lag")).alias("lag"),
            "n_terms",
            floor_micro(F.col("num"), F.col("den")).alias("acf_micro"),
        )
        .orderBy("lag")
    )


SN_SEASON = 24  # seasonal-naive period (hours)


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the two standard baseline forecasters over the
    hourly count series: naive (x̂_t = x_{t−1}) and seasonal-naive
    (x̂_t = x_{t−24}) — the error floor every real forecaster must
    beat, and the evaluation twin of ``events_acf_lags`` (a strong
    lag-24 ACF predicts exactly the seasonal-naive win). Series =
    per-hour counts on the complete min..max spine (missing hours 0).

    Errors stay exact: the sum of absolute errors is a BIGINT, and the
    reported MAE is floor(10⁶·sae/n) — int→double and one division are
    correctly rounded, floor is engine-exact (SCALE.md). Forecast
    lookback is an equi self-join on the hour-grid-sized aggregate
    keyed h−lag (no global-order window), the ACF pair shape."""
    series = _hour_spine_counts(load_table(spark, sf_dir, "events"))
    lags = series.select(
        "h",
        F.col("x").alias("actual"),
        F.explode(F.array(F.lit(1), F.lit(SN_SEASON))).alias("lag"),
    ).withColumn("h_src", F.col("h") - F.col("lag"))
    pairs = lags.join(
        series.select(F.col("h").alias("h_src"), F.col("x").alias("forecast")),
        "h_src",
    )
    method = F.when(F.col("lag") == 1, "naive").otherwise("seasonal_naive")
    return (
        pairs.groupBy(method.alias("method"))
        .agg(
            bigint(F.count("*")).alias("n_terms"),
            bigint(F.sum(F.abs(F.col("actual") - F.col("forecast")))).alias("sae"),
        )
        .withColumn("mae_micro", floor_micro(F.col("sae"), F.col("n_terms")))
        .orderBy("method")
    )


def events_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of the
    per-type hourly count series with dyadic α = β = 1/2 — the 2-D
    extension of ``events_ewma_smooth``'s bit-determinism trick:
    lₜ = (xₜ + (l + b))/2 and bₜ = ((lₜ − l) + b)/2 are adds,
    subtracts, and exponent-shift halvings, every one a correctly-
    rounded IEEE op, so Python's float loop and the DuckDB recursive
    CTE replay the whole recurrence bit-for-bit — raw doubles in the
    output, no rounding contract.

    Scale split: the heavy work (hourly per-type counting over the
    fact table) is a distributed map-combinable aggregate; only the
    genuinely sequential state fold runs in Python, per type over the
    hour-grid-sized series via ``applyInPandas`` — one tiny task per
    series, the §4.2 recipe (distribute the aggregation, sequentialize
    only the recurrence)."""
    series = _hour_spine_counts(
        load_table(spark, sf_dir, "events"), by_type=True
    )

    def fold(pdf):
        pdf = pdf.sort_values("h")
        xs = pdf["x"].tolist()
        level = float(xs[0])
        trend = 0.0
        for x in xs[1:]:
            new_level = (float(x) + (level + trend)) / 2
            trend = ((new_level - level) + trend) / 2
            level = new_level
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_hours": [len(xs)],
                "level": [level],
                "trend": [trend],
                "forecast_next": [level + trend],
            }
        )

    out_schema = (
        "event_type string, n_hours long, level double, "
        "trend double, forecast_next double"
    )
    return (
        series.groupBy("event_type")
        .applyInPandas(fold, schema=out_schema)
        .orderBy("event_type")
    )


SKIP_MAX = 3  # max position gap between consecutive pattern steps


def pattern_match_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-tolerant sequence matching — the MATCH_RECOGNIZE-style
    relaxation of ``pattern_match_fixed``: view → click → purchase per
    user where up to SKIP_MAX−1 unrelated events may sit between
    consecutive steps (position gap 1..3 in the (ts, event_id) order).
    The reference embeds its patterns contiguously
    (eventstream.py:288-409); real clickstreams interleave noise, so
    the skip-tolerant matcher is what consumers actually run.

    Scale shape: instead of a variable-gap theta join, each bounded
    position delta is EXPLODED (3 deltas per step) so every hop is a
    pure equi-join on (user_id, rn) — the bucketed-range-join trick of
    ``join_range_interval`` applied to sequence positions. One window
    for rn, two equi-joins; counts per user, exact integers."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    deltas = F.explode(F.sequence(F.lit(1), F.lit(SKIP_MAX)))
    v = seq.filter(F.col("event_type") == "view").select(
        "user_id", F.col("rn").alias("rn0"), deltas.alias("d1")
    ).withColumn("rn1", F.col("rn0") + F.col("d1"))
    c = seq.filter(F.col("event_type") == "click").select(
        "user_id", F.col("rn").alias("rn1"), deltas.alias("d2")
    ).withColumn("rn2", F.col("rn1") + F.col("d2"))
    p = seq.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("rn").alias("rn2")
    )
    matches = v.join(c, ["user_id", "rn1"]).join(p, ["user_id", "rn2"])
    return (
        matches.groupBy("user_id")
        .agg(
            bigint(F.count("*")).alias("n_matches"),
            bigint(F.min("rn0")).alias("first_start_rn"),
        )
        .orderBy("user_id")
    )


def events_weekday_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-vs-weekend rate contrast per event type — the
    day-of-week seasonality screen complementing the hour-spine lags
    (``events_acf_lags`` finds the daily cycle; this one tests the
    weekly one). Rates are events per distinct day of each regime;
    with integer counts the comparison cross-multiplies
    (n_wd·days_we vs n_we·days_wd — no division), and the displayed
    ratio is the floor-micro quotient. One map-combinable aggregate
    keyed (type, is_weekend); the distinct-day counts broadcast."""
    ev = load_table(spark, sf_dir, "events")
    is_we = F.dayofweek("ts").isin(1, 7)  # Sun=1, Sat=7
    counts = ev.groupBy("event_type", is_we.alias("weekend")).agg(
        F.count("*").alias("n")
    )
    days = F.broadcast(
        ev.select(F.date_trunc("day", "ts").alias("d"), is_we.alias("weekend"))
        .distinct()
        .groupBy("weekend")
        .agg(F.count("*").alias("n_days"))
    )
    wide = (
        counts.join(days, "weekend")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(~F.col("weekend"), F.col("n"))).alias("n_wd"),
            F.sum(F.when(F.col("weekend"), F.col("n"))).alias("n_we"),
            F.max(F.when(~F.col("weekend"), F.col("n_days"))).alias("d_wd"),
            F.max(F.when(F.col("weekend"), F.col("n_days"))).alias("d_we"),
        )
    )
    # Zero-regime guard: a type with no weekend events (possible at
    # 100× on a weekday-only event type) leaves n_we NULL/0 — an
    # unguarded division yields ±Infinity whose BIGINT cast is
    # engine-dependent.  The verdict column below is cross-multiplied
    # (division-free, always safe); the display ratio goes NULL unless
    # the denominator is strictly positive, mirrored in the oracle.
    ratio_micro = F.when(
        F.col("n_we") * F.col("d_wd") > 0,
        floor_micro(
            F.col("n_wd") * F.col("d_we"), F.col("n_we") * F.col("d_wd")
        ),
    )
    return wide.select(
        "event_type",
        bigint(F.col("n_wd")).alias("n_weekday"),
        bigint(F.col("n_we")).alias("n_weekend"),
        bigint(ratio_micro).alias("rate_ratio_micro"),
        (F.col("n_wd") * F.col("d_we") > F.col("n_we") * F.col("d_wd")).alias(
            "weekday_heavier"
        ),
    ).orderBy("event_type")


def pattern_online_prequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prequential (test-then-train) evaluation — the reference's
    entire consumption story (``main.py:44-46``: ``for t, e in
    stream(): model.predict(e); model.update(e)``) expressed as a
    relational scoring query: every event is first PREDICTED from the
    model state built on the events before it, then folded in. Two
    online baselines are scored per user stream under the (ts,
    event_id) total order: persistence (predict the previous event's
    type — one lag) and a 5-gram frequency model (predict the
    majority type over the trailing 5 events, ties to the most recent
    — a frame window plus an argmax over the 5-type count vector,
    no state beyond the frame). Output: per true event type, events
    scored and each baseline's hit count + floor-micro accuracy —
    exact integers, one user-keyed shuffle, windows only."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-5, -1)
    types = ("click", "error", "purchase", "signup", "view")
    counts = [
        F.sum((F.col("event_type") == t).cast("int")).over(frame).alias(f"c_{t}")
        for t in types
    ]
    lags = [
        F.lag("event_type", k).over(w).alias(f"prev_{k}") for k in (1, 2, 3, 4, 5)
    ]
    scored = ev.select("user_id", "event_type", *counts, *lags)
    # majority of the trailing 5, ties broken by recency: walk the
    # window newest-first and take the first type achieving the max
    max_c = F.greatest(*[F.col(f"c_{t}") for t in types])
    recency_pick = F.coalesce(
        *[
            F.when(
                max_c
                == F.coalesce(
                    *[
                        F.when(F.col(f"prev_{k}") == t, F.col(f"c_{t}"))
                        for t in types
                    ]
                ),
                F.col(f"prev_{k}"),
            )
            for k in (1, 2, 3, 4, 5)
        ]
    )
    pred = scored.select(
        "event_type",
        F.col("prev_1").alias("pred_persist"),
        recency_pick.alias("pred_freq5"),
    ).filter(F.col("pred_persist").isNotNull())
    agg = pred.groupBy("event_type").agg(
        bigint(F.count("*")).alias("n_scored"),
        bigint(
            F.sum((F.col("pred_persist") == F.col("event_type")).cast("long"))
        ).alias("hits_persist"),
        bigint(
            F.sum(
                (
                    F.col("pred_freq5").isNotNull()
                    & (F.col("pred_freq5") == F.col("event_type"))
                ).cast("long")
            )
        ).alias("hits_freq5"),
    )
    acc = lambda h: floor_micro(F.col(h), F.col("n_scored"))  # noqa: E731
    return agg.select(
        "event_type",
        "n_scored",
        "hits_persist",
        acc("hits_persist").alias("acc_persist_micro"),
        "hits_freq5",
        acc("hits_freq5").alias("acc_freq5_micro"),
    ).orderBy("event_type")


def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor) of the per-type hourly count
    series — the over/under-dispersion test against the Poisson
    process the reference's random lane samples from
    (``_sample_interval_int``, eventstream.py:63-91): D = s²/x̄ ≈ 1
    for Poisson arrivals, > 1 for bursty streams, < 1 for the
    pattern-regularized ones. Series on the per-type hour spine
    (missing hours 0).

    Exact algebra: D = (n·Σx² − S²) / (S·(n−1)) — numerator and
    denominator are exact 128-bit integers (Spark decimal(38,0),
    DuckDB HUGEINT: x² ~ 1e20/row and S² ~ 1e26 at 100 TB rates wrap
    BIGINT, and a double sum would be order-dependent) from one
    map-combinable aggregate, the verdict flag is the exact integer
    comparison num > den, and the displayed index is the floor-micro
    quotient (SCALE.md rule)."""
    series = _hour_spine_counts(
        load_table(spark, sf_dir, "events"), by_type=True
    ).drop("h")
    agg = series.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("q"),
    )
    sd = F.col("s").cast("decimal(38,0)")
    num = F.col("n") * F.col("q") - sd * F.col("s")
    den = sd * (F.col("n") - 1)
    return agg.select(
        "event_type",
        bigint(F.col("n")).alias("n_hours"),
        floor_micro(F.col("s"), F.col("n")).alias("mean_micro"),
        floor_micro(num, den).alias("dispersion_micro"),
        (num > den).alias("overdispersed"),
    ).orderBy("event_type")


QUERIES = {
    "events_acf_lags": events_acf_lags,
    "events_dispersion_index": events_dispersion_index,
    "pattern_match_skip": pattern_match_skip,
    "pattern_online_prequential": pattern_online_prequential,
    "events_weekday_contrast": events_weekday_contrast,
    "events_forecast_backtest": events_forecast_backtest,
    "events_holt_trend": events_holt_trend,

    "events_ohlc_candles": events_ohlc_candles,
    "events_ewma_smooth": events_ewma_smooth,
    "events_downsample_lttb": events_downsample_lttb,
    "events_cusum_shift": events_cusum_shift,
    "events_markov_transitions": events_markov_transitions,
    "stream_tumbling_rate": stream_tumbling_rate,
    "stream_sliding_rate": stream_sliding_rate,
    "stream_sessionize": stream_sessionize,
    "stream_type_drift": stream_type_drift,
    "stream_drift_score": stream_drift_score,
    "pattern_match_fixed": pattern_match_fixed,
    "stream_anomaly_mad": stream_anomaly_mad,
    "scd2_user_state": scd2_user_state,
    "rollup_hourly_daily": rollup_hourly_daily,
    "time_weighted_avg": time_weighted_avg,
    "events_gap_fill_locf": events_gap_fill_locf,
    "events_resample_interp": events_resample_interp,
    "join_interval_overlap": join_interval_overlap,
}

ORACLES = {
    # same weekend split (DuckDB dayofweek: Sun=0, Sat=6), same
    # cross-multiplied rate comparison
    "events_weekday_contrast": """
        WITH c AS (
            SELECT event_type,
                   dayofweek(ts) IN (0, 6) AS weekend,
                   count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        d AS (
            SELECT weekend, count(*) AS n_days FROM (
                SELECT DISTINCT date_trunc('day', ts) AS dd,
                       dayofweek(ts) IN (0, 6) AS weekend
                FROM events
            ) GROUP BY weekend
        ),
        wide AS (
            SELECT event_type,
                   sum(CASE WHEN NOT c.weekend THEN n END) AS n_wd,
                   sum(CASE WHEN c.weekend THEN n END) AS n_we,
                   max(CASE WHEN NOT c.weekend THEN n_days END) AS d_wd,
                   max(CASE WHEN c.weekend THEN n_days END) AS d_we
            FROM c JOIN d USING (weekend)
            GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_wd AS BIGINT) AS n_weekday,
               CAST(n_we AS BIGINT) AS n_weekend,
               CAST(CASE WHEN n_we * d_wd > 0 THEN
                    floor(1000000.0 * (CAST(n_wd * d_we AS DOUBLE)
                    / CAST(n_we * d_wd AS DOUBLE))) END AS BIGINT)
                   AS rate_ratio_micro,
               n_wd * d_we > n_we * d_wd AS weekday_heavier
        FROM wide ORDER BY event_type
    """,
    # same lag/frame-count predictors, same recency-tiebroken argmax
    "pattern_online_prequential": (lambda types=("click", "error", "purchase", "signup", "view"): f"""
        WITH s AS (
            SELECT user_id, event_type,
                   {", ".join(f"lag(event_type, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p{k}" for k in (1, 2, 3, 4, 5))},
                   {", ".join(f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS c_{t}" for t in types)}
            FROM events
        ),
        pred AS (
            SELECT event_type, p1 AS pred_persist,
                   coalesce({", ".join(
                       "CASE WHEN (CASE p%d %s END) = greatest(%s) THEN p%d END"
                       % (k,
                          " ".join(f"WHEN '{t}' THEN c_{t}" for t in types),
                          ", ".join(f"c_{t}" for t in types),
                          k)
                       for k in (1, 2, 3, 4, 5))}) AS pred_freq5
            FROM s WHERE p1 IS NOT NULL
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_scored,
               CAST(sum(CASE WHEN pred_persist = event_type THEN 1 ELSE 0 END)
                    AS BIGINT) AS hits_persist,
               CAST(floor(1000000.0 *
                    (CAST(sum(CASE WHEN pred_persist = event_type
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE))) AS BIGINT)
                   AS acc_persist_micro,
               CAST(sum(CASE WHEN pred_freq5 IS NOT NULL
                              AND pred_freq5 = event_type
                             THEN 1 ELSE 0 END) AS BIGINT) AS hits_freq5,
               CAST(floor(1000000.0 *
                    (CAST(sum(CASE WHEN pred_freq5 IS NOT NULL
                               AND pred_freq5 = event_type
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE))) AS BIGINT)
                   AS acc_freq5_micro
        FROM pred GROUP BY event_type ORDER BY event_type
    """)(),
    # same rn sequencing, same exploded-delta equi joins
    "pattern_match_skip": f"""
        WITH seq AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        d AS (SELECT unnest(range(1, {SKIP_MAX} + 1)) AS delta),
        v AS (SELECT user_id, rn AS rn0, rn + d.delta AS rn1
              FROM seq CROSS JOIN d WHERE event_type = 'view'),
        c AS (SELECT user_id, rn AS rn1, rn + d.delta AS rn2
              FROM seq CROSS JOIN d WHERE event_type = 'click'),
        p AS (SELECT user_id, rn AS rn2 FROM seq
              WHERE event_type = 'purchase')
        SELECT v.user_id,
               CAST(count(*) AS BIGINT) AS n_matches,
               CAST(min(v.rn0) AS BIGINT) AS first_start_rn
        FROM v JOIN c USING (user_id, rn1) JOIN p USING (user_id, rn2)
        GROUP BY v.user_id ORDER BY v.user_id
    """,
    # exact BIGINT moment sums; integer-comparison verdict; floor-micro
    # quotients of correctly-rounded double divisions
    "events_dispersion_index": """
        WITH c AS (
            SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS h,
                   count(*) AS x
            FROM events GROUP BY 1, 2
        ),
        b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
        ty AS (SELECT DISTINCT event_type FROM c),
        s AS (
            SELECT ty.event_type, CAST(coalesce(c.x, 0) AS BIGINT) AS x
            FROM ty CROSS JOIN spine
            LEFT JOIN c ON c.event_type = ty.event_type AND c.h = spine.h
        ),
        a AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sm,
                   sum(CAST(x AS HUGEINT) * x) AS q
            FROM s GROUP BY event_type
        )
        SELECT event_type,
               n AS n_hours,
               CAST(floor(1000000.0 * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)))
                    AS BIGINT) AS mean_micro,
               CAST(floor(1000000.0 * (CAST(n * q - CAST(sm AS HUGEINT) * sm AS DOUBLE)
                        / CAST(CAST(sm AS HUGEINT) * (n - 1) AS DOUBLE))) AS BIGINT)
                   AS dispersion_micro,
               n * q - CAST(sm AS HUGEINT) * sm
                   > CAST(sm AS HUGEINT) * (n - 1) AS overdispersed
        FROM a ORDER BY event_type
    """,
    # the dyadic Holt recurrence replayed step-by-step: adds/subs and
    # exponent-shift halvings are correctly-rounded IEEE ops, so the
    # recursive CTE produces bit-identical doubles to the Python fold
    "events_holt_trend": """
        WITH RECURSIVE c AS (
            SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS h,
                   count(*) AS x
            FROM events GROUP BY 1, 2
        ),
        b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
        ty AS (SELECT DISTINCT event_type FROM c),
        s AS (
            SELECT ty.event_type, spine.h,
                   CAST(coalesce(c.x, 0) AS BIGINT) AS x,
                   row_number() OVER (PARTITION BY ty.event_type
                                      ORDER BY spine.h) AS i
            FROM ty CROSS JOIN spine
            LEFT JOIN c ON c.event_type = ty.event_type AND c.h = spine.h
        ),
        n AS (SELECT event_type, max(i) AS n FROM s GROUP BY 1),
        rec(event_type, i, l, tr) AS (
            -- seed trend must be CAST to DOUBLE: a bare 0.0 literal
            -- types the whole recursive column DECIMAL(2,1), silently
            -- quantizing every trend to one decimal
            SELECT event_type, i, CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)
            FROM s WHERE i = 1
            UNION ALL
            SELECT s.event_type, s.i,
                   (CAST(s.x AS DOUBLE) + (r.l + r.tr)) / 2,
                   (((CAST(s.x AS DOUBLE) + (r.l + r.tr)) / 2 - r.l) + r.tr) / 2
            FROM rec r JOIN s ON s.event_type = r.event_type
                            AND s.i = r.i + 1
        )
        SELECT r.event_type, CAST(n.n AS BIGINT) AS n_hours,
               r.l AS level, r.tr AS trend, r.l + r.tr AS forecast_next
        FROM rec r JOIN n ON n.event_type = r.event_type AND r.i = n.n
        ORDER BY r.event_type
    """,
    # exact-integer error sums; same spine, same lag self-join
    "events_forecast_backtest": f"""
        WITH c AS (
            SELECT epoch_us(ts) // 1000000 // 3600 AS h, count(*) AS x
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
        s AS (SELECT spine.h, CAST(coalesce(c.x, 0) AS BIGINT) AS x
              FROM spine LEFT JOIN c USING (h)),
        l AS (SELECT unnest([1, {SN_SEASON}]) AS lag),
        pairs AS (
            SELECT CASE WHEN l.lag = 1 THEN 'naive'
                        ELSE 'seasonal_naive' END AS method,
                   a.x AS actual, f.x AS forecast
            FROM l JOIN s a ON TRUE JOIN s f ON f.h = a.h - l.lag
        )
        SELECT method,
               CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(abs(actual - forecast)) AS BIGINT) AS sae,
               CAST(floor(1000000.0 * (CAST(sum(abs(actual - forecast))
                        AS DOUBLE) / CAST(count(*) AS DOUBLE))) AS BIGINT)
                   AS mae_micro
        FROM pairs GROUP BY method ORDER BY method
    """,
    # n²-scaled centered products keep every ACF term an exact
    # integer; both engines convert the two BIGINT sums to doubles and
    # floor the micro-scaled quotient — engine-exact per SCALE.md
    "events_acf_lags": f"""
        WITH c AS (
            SELECT epoch_us(ts) // 1000000 // 3600 AS h, count(*) AS x
            FROM events GROUP BY 1
        ),
        b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        spine AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM b),
        s AS (SELECT spine.h, CAST(coalesce(c.x, 0) AS BIGINT) AS x
              FROM spine LEFT JOIN c USING (h)),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS ssum FROM s),
        d AS (SELECT h, n * x - ssum AS dx FROM s CROSS JOIN t),
        den AS (SELECT sum(CAST(dx AS HUGEINT) * dx) AS den FROM d),
        l AS (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag),
        pairs AS (
            SELECT l.lag,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   sum(CAST(a.dx AS HUGEINT) * bb.dx) AS num
            FROM l JOIN d a ON TRUE JOIN d bb ON bb.h = a.h + l.lag
            GROUP BY l.lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n_terms,
               CAST(floor(1000000.0 *
                    (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))) AS BIGINT)
                   AS acf_micro
        FROM pairs CROSS JOIN den ORDER BY lag
    """,
    "events_markov_transitions": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type,
                   event_type AS cur_type
            FROM events
        ),
        counted AS (
            SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS n
            FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT prev_type, cur_type, n,
               CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
                   AS row_total,
               CAST(round(n * 1000000.0
                    / sum(n) OVER (PARTITION BY prev_type)) AS BIGINT)
                   / 1000000.0 AS prob
        FROM counted ORDER BY prev_type, cur_type
    """,
    # exact-integer CUSUM: running sum then running min of bigint
    # deviations; the alarm threshold is cross-multiplied so no
    # division ever rounds
    "events_cusum_shift": f"""
        WITH base AS (
            SELECT event_id, event_type, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
        ),
        tgt AS (
            SELECT event_type,
                   CAST(sum(cents) // count(*) AS BIGINT) AS target
            FROM base GROUP BY 1
        ),
        dev AS (
            SELECT b.event_id, b.event_type, b.ts, b.cents, t.target,
                   sum(b.cents - t.target) OVER (PARTITION BY b.event_type
                       ORDER BY b.ts, b.event_id
                       ROWS UNBOUNDED PRECEDING) AS s
            FROM base b JOIN tgt t USING (event_type)
        ),
        cusum AS (
            SELECT event_id, event_type, cents, target,
                   s - min(s) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS cpos,
                   abs(cents - target) AS absdev
            FROM dev
        ),
        peak AS (
            SELECT event_type, event_id AS peak_event_id FROM (
                SELECT *, row_number() OVER (PARTITION BY event_type
                              ORDER BY cpos DESC, event_id) AS rn
                FROM cusum
            ) WHERE rn = 1
        )
        SELECT c.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(cpos) AS BIGINT) AS max_cusum,
               any_value(p.peak_event_id) AS peak_event_id,
               CAST(sum(absdev) AS BIGINT) AS sum_absdev,
               CAST(max(cpos) AS HUGEINT) * count(*)
                   > CAST({CUSUM_FACTOR} AS HUGEINT)
                     * CAST(sum(absdev) AS BIGINT) AS alarm
        FROM cusum c JOIN peak p USING (event_type)
        GROUP BY 1 ORDER BY 1
    """,
    # integer x/y and exact bucket sums make the anchor averages and
    # triangle areas identical doubles in both engines
    "events_downsample_lttb": f"""
        WITH base AS (
            SELECT event_id, event_type,
                   epoch_us(ts) // 1000000 AS sec,
                   CAST(round(value * 100) AS BIGINT) AS y, ts
            FROM events WHERE value IS NOT NULL
        ),
        ranked AS (
            SELECT event_id, event_type, y,
                   sec - min(sec) OVER (PARTITION BY event_type) AS x,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) - 1 AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM base
        ),
        pts AS (
            SELECT *, CAST(least({LTTB_BUCKETS - 1},
                                 rn * {LTTB_BUCKETS} // n) AS BIGINT) AS bucket
            FROM ranked
        ),
        stats AS (
            SELECT event_type, bucket, sum(x) AS sx, sum(y) AS sy,
                   count(*) AS cnt
            FROM pts GROUP BY 1, 2
        ),
        mid AS (
            SELECT p.event_type, p.bucket, p.event_id, p.x, p.y,
                   abs((pr.sx * nx.cnt - nx.sx * pr.cnt)
                           * (p.y * pr.cnt - pr.sy)
                       - (pr.sx - p.x * pr.cnt)
                           * (nx.sy * pr.cnt - pr.sy * nx.cnt)) AS s_area,
                   pr.cnt AS cp, nx.cnt AS cn
            FROM pts p
            JOIN stats pr ON pr.event_type = p.event_type
                         AND pr.bucket = p.bucket - 1
            JOIN stats nx ON nx.event_type = p.event_type
                         AND nx.bucket = p.bucket + 1
            WHERE p.bucket > 0 AND p.bucket < {LTTB_BUCKETS - 1}
        ),
        picked AS (
            SELECT event_type, bucket, event_id, x, y,
                   CAST(s_area AS VARCHAR) AS area_scaled
            FROM (SELECT *, row_number() OVER (PARTITION BY event_type, bucket
                              ORDER BY s_area DESC, event_id) AS pick
                  FROM mid)
            WHERE pick = 1
        )
        SELECT event_type, bucket, event_id, x, y, area_scaled FROM picked
        UNION ALL
        SELECT event_type, bucket, event_id, x, y,
               CAST(NULL AS VARCHAR) AS area_scaled
        FROM pts WHERE rn = 0 OR rn = n - 1
        ORDER BY event_type, bucket
    """,
    # the 1<<(i-1) divisions and the dyadic normalizer replay Spark's
    # halving-weight fold exactly (every term is an exponent shift)
    "events_ewma_smooth": f"""
        WITH win AS (
            SELECT event_id, event_type, value,
                   list(value) OVER (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING
                       AND CURRENT ROW) AS vals
            FROM events WHERE value IS NOT NULL
        ),
        rev AS (
            SELECT event_id, event_type, value,
                   list_reverse(vals) AS r, len(vals) AS n
            FROM win
        )
        SELECT event_id, event_type, value,
               round(list_reduce(
                       [r[i] / (1 << (i - 1)) FOR i IN range(1, len(r) + 1)],
                       (a, x) -> a + x)
                     / (2.0 - 1.0 / (1 << (n - 1))), 6) AS ewma
        FROM rev ORDER BY event_id
    """,
    # DuckDB 1.0's arg_min/arg_max take no struct ordering, so
    # open/close come from row_number windows with the same
    # (ts, event_id) tiebreak
    "events_ohlc_candles": f"""
        WITH b AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   value, ts, event_id
            FROM events WHERE value IS NOT NULL
        ),
        o AS (
            SELECT *,
                   row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY event_type, bucket
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM b
        )
        SELECT event_type, {duck_fmt_ts('bucket')} AS bucket,
               round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open_v,
               round(max(value), 6) AS high_v,
               round(min(value), 6) AS low_v,
               round(max(CASE WHEN rn_d = 1 THEN value END), 6) AS close_v,
               count(*) AS n
        FROM o GROUP BY event_type, bucket
        ORDER BY event_type, bucket
    """,
    "time_weighted_avg": """
        WITH stepped AS (
            SELECT event_type, value,
                   epoch_us(lead(ts) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id))
                   - epoch_us(ts) AS dt_us
            FROM events
        )
        SELECT event_type, count(*) AS n_obs,
               CAST(sum(dt_us) AS BIGINT) AS total_us,
               round(sum(value * dt_us) / sum(dt_us), 6) AS twap,
               round(avg(value), 6) AS plain_avg
        FROM stepped WHERE dt_us IS NOT NULL
        GROUP BY event_type ORDER BY event_type
    """,
    "events_gap_fill_locf": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS n,
                   CAST(round(sum(CAST(round(value * 10000) AS BIGINT))
                              * 100.0 / count(*)) AS BIGINT) AS avg_i
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT unnest(generate_series((SELECT min(h) FROM hourly),
                                          (SELECT max(h) FROM hourly),
                                          INTERVAL 1 HOUR)) AS h
        ),
        grid AS (
            SELECT s.h, t.event_type
            FROM spine s CROSS JOIN (SELECT DISTINCT event_type
                                     FROM events) t
        )
        SELECT {duck_fmt_ts('g.h')} AS hour, g.event_type,
               CAST(coalesce(hr.n, 0) AS BIGINT) AS n,
               hr.n IS NULL AS is_gap,
               last_value(hr.avg_i IGNORE NULLS)
                   OVER (PARTITION BY g.event_type ORDER BY g.h
                         ROWS UNBOUNDED PRECEDING) / 1000000.0 AS v_filled
        FROM grid g LEFT JOIN hourly hr
          ON g.h = hr.h AND g.event_type = hr.event_type
        ORDER BY hour, g.event_type
    """,
    "join_interval_overlap": f"""
        WITH flagged AS (
            SELECT user_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            > {SESSION_GAP_MIN} * 60 * 1000000
                        THEN 1 ELSE 0 END AS new_s,
                   event_id
            FROM events
        ),
        sess AS (
            SELECT user_id,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id,
                   us
            FROM flagged
        ),
        iv AS (
            SELECT user_id, session_id, min(us) AS s_us, max(us) AS e_us
            FROM sess GROUP BY 1, 2
        ),
        days AS (
            SELECT unnest(generate_series(
                (SELECT date_trunc('day', min(ts)) FROM events),
                (SELECT date_trunc('day', max(ts)) FROM events),
                INTERVAL 1 DAY)) AS day
        ),
        win AS (
            SELECT day,
                   epoch_us(day)
                       + CAST({MAINT_START_H} AS BIGINT) * 3600 * 1000000
                       AS w_start,
                   epoch_us(day)
                       + CAST({MAINT_START_H + 1} AS BIGINT) * 3600 * 1000000
                       AS w_end
            FROM days
        )
        SELECT {duck_fmt_date('day')} AS day,
               count(*) AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM iv JOIN win ON s_us < w_end AND w_start <= e_us
        GROUP BY day ORDER BY day
    """,
    "events_resample_interp": f"""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS n,
                   CAST(round(sum(CAST(round(value * 10000) AS BIGINT))
                              * 100.0 / count(*)) AS BIGINT) AS avg_v
            FROM events GROUP BY 1, 2
        ),
        spine AS (
            SELECT unnest(generate_series((SELECT min(h) FROM hourly),
                                          (SELECT max(h) FROM hourly),
                                          INTERVAL 1 HOUR)) AS h
        ),
        grid AS (
            SELECT s.h, t.event_type
            FROM spine s CROSS JOIN (SELECT DISTINCT event_type
                                     FROM events) t
        ),
        nb AS (
            SELECT g.h, g.event_type,
                   coalesce(hr.n, 0) AS n, hr.n IS NULL AS is_gap,
                   hr.avg_v,
                   last_value(hr.avg_v IGNORE NULLS)
                       OVER (PARTITION BY g.event_type ORDER BY g.h
                             ROWS UNBOUNDED PRECEDING) AS pv,
                   last_value(CASE WHEN hr.avg_v IS NOT NULL THEN g.h END
                              IGNORE NULLS)
                       OVER (PARTITION BY g.event_type ORDER BY g.h
                             ROWS UNBOUNDED PRECEDING) AS ph,
                   first_value(hr.avg_v IGNORE NULLS)
                       OVER (PARTITION BY g.event_type ORDER BY g.h
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS nv,
                   first_value(CASE WHEN hr.avg_v IS NOT NULL THEN g.h END
                               IGNORE NULLS)
                       OVER (PARTITION BY g.event_type ORDER BY g.h
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS nh
            FROM grid g LEFT JOIN hourly hr
              ON g.h = hr.h AND g.event_type = hr.event_type
        )
        SELECT {duck_fmt_ts('h')} AS hour, event_type,
               CAST(n AS BIGINT) AS n, is_gap,
               CASE WHEN NOT is_gap THEN avg_v
                    WHEN pv IS NULL THEN nv
                    WHEN nv IS NULL THEN pv
                    ELSE pv + CAST(round((nv - pv) *
                         (CAST(epoch(h) - epoch(ph) AS DOUBLE)
                          / CAST(epoch(nh) - epoch(ph) AS DOUBLE)))
                         AS BIGINT)
               END / 1000000.0 AS v_interp
        FROM nb ORDER BY hour, event_type
    """,
    "scd2_user_state": """
        WITH flagged AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        changed AS (
            SELECT user_id, event_type, ts, event_id FROM flagged
            WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        intervals AS (
            SELECT user_id, event_type, ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to
            FROM changed
        )
        SELECT event_type, count(*) AS n_versions,
               CAST(sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_closed,
               CASE WHEN sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END) > 0
                    THEN round(
                        CAST(sum(CAST(epoch_us(valid_to) - epoch_us(ts) AS HUGEINT))
                             AS DOUBLE)
                        / sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END), 0)
                        / 1000000.0
               END AS avg_dwell_secs
        FROM intervals GROUP BY event_type ORDER BY event_type
    """,
    "rollup_hourly_daily": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS n,
                   sum(CAST(round(value * 1000000) AS BIGINT)) AS sum_v6
            FROM events GROUP BY 1, 2
        )
        SELECT strftime(CAST(h AS DATE), '%Y-%m-%d') AS day, event_type,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(sum(sum_v6) AS BIGINT) / 1000000.0 AS sum_value,
               CAST(max(n) AS BIGINT) AS peak_hour_events
        FROM hourly GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "stream_anomaly_mad": f"""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type,
                   quantile_cont(abs(e.value - m.med), 0.5) AS mad
            FROM events e JOIN med m ON e.event_type = m.event_type
            GROUP BY e.event_type
        )
        SELECT e.event_type, count(*) AS n,
               round(any_value(m.med) * 1000000, 0) / 1000000.0 AS med,
               round(any_value(d.mad) * 1000000, 0) / 1000000.0 AS mad,
               CAST(sum(CASE WHEN
                       abs(CAST(round(e.value * 1000000, 0) AS BIGINT)
                           - CAST(round(m.med * 1000000, 0) AS BIGINT))
                       > {MAD_K} * CAST(round(d.mad * 1000000, 0) AS BIGINT)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e
        JOIN med m ON e.event_type = m.event_type
        JOIN mad d ON e.event_type = d.event_type
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    "stream_tumbling_rate": f"""
        SELECT {duck_fmt_ts("date_trunc('hour', ts)")} AS win_start,
               event_type, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "stream_sliding_rate": """
        SELECT ((epoch_us(ts) // 900000000) * 900 - g.g * 900) AS win_start_s,
               event_type, count(*) AS n,
               round(sum(CAST(round(value * 10000) AS BIGINT)) * 1.0
                     / count(*)) / 10000.0 AS avg_value
        FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS g) g
        GROUP BY 1, 2
    """,
    "stream_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       > {SESSION_GAP_MIN * 60 * 1000000} THEN 1 ELSE 0 END
                       AS new_session
            FROM events
        ), with_sid AS (
            SELECT user_id, us,
                   sum(new_session) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        ), per_session AS (
            SELECT user_id, session_id, count(*) AS n_events,
                   (max(us) - min(us)) / 1000000.0 AS dur_s
            FROM with_sid GROUP BY user_id, session_id
        )
        SELECT user_id, count(*) AS n_sessions,
               round(avg(n_events), 4) AS avg_events,
               round(avg(dur_s), 4) AS avg_dur_s,
               round(max(dur_s), 6) AS max_dur_s,
               CAST(sum(n_events) AS BIGINT) AS total_events
        FROM per_session GROUP BY user_id
    """,
    "stream_type_drift": f"""
        WITH counts AS (
            SELECT {duck_fmt_date("date_trunc('day', ts)")} AS day,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT day, event_type, n,
               round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day), 6) AS share
        FROM counts
    """,
    "stream_drift_score": f"""
        WITH counts AS (
            SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        ),
        grid AS (
            SELECT d, event_type
            FROM (SELECT DISTINCT d FROM counts)
            CROSS JOIN (SELECT DISTINCT event_type FROM counts)
        ),
        dense AS (
            SELECT g.d, g.event_type, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN counts c
              ON g.d = c.d AND g.event_type = c.event_type
        ),
        share AS (
            SELECT d, event_type,
                   n * 1.0 / sum(n) OVER (PARTITION BY d) AS share
            FROM dense
        ),
        drift AS (
            SELECT d, event_type, share,
                   lag(share) OVER (PARTITION BY event_type ORDER BY d) AS prev
            FROM share
        )
        SELECT {duck_fmt_date('d')} AS day,
               round(sum(abs(share - prev)), 6) AS l1_drift
        FROM drift WHERE prev IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """,
    "pattern_match_fixed": f"""
        WITH seq AS (
            SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us,
                   lead(event_type, 1) OVER w AS type_1,
                   lead(epoch_us(ts), 1) OVER w AS us_1,
                   lead(event_type, 2) OVER w AS type_2,
                   lead(epoch_us(ts), 2) OVER w AS us_2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id AS start_event_id,
               {duck_fmt_ts('ts')} AS start_ts,
               round((us_2 - us) / 1000000.0, 6) AS span_s
        FROM seq
        WHERE event_type = '{PATTERN[0]}' AND type_1 = '{PATTERN[1]}'
          AND type_2 = '{PATTERN[2]}'
          AND us_1 - us <= {PATTERN_MAX_GAP_S * 1000000}
          AND us_2 - us_1 <= {PATTERN_MAX_GAP_S * 1000000}
    """,
}
