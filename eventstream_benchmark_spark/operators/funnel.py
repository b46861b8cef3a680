"""Sequential / behavioral analytics pack (Layer-B extensions).

The reference embeds ordered multi-step patterns into a noisy stream
(eventstream.py:288-409) and its README motivates "sequence-learning
systems" as the consumer. These operators are the standard product
analytics built on exactly that structure: funnel progression,
cohort retention, and last-touch attribution over the ``events``
table.

Scale notes (100 TB): every stage here shuffles on ``user_id`` only —
the funnel step frontiers (one row per user) broadcast back into the
fact scan, so N-step funnels cost one fact shuffle, not N; retention
reduces the fact table to distinct (user, day) before any join; the
attribution window is a single per-user sort reused by both ``last``
calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import load_table
from eventstream_benchmark_spark.operators._util import (
    bigint,
    duck_fmt_date,
    fmt_date,
    r6,
)

FUNNEL_STEPS = ("view", "click", "purchase")
ATTRIB_TOUCHES = ("view", "click")
ATTRIB_HORIZON_S = 86_400  # last-touch lookback: 24h


# --------------------------------------------------------------------------
# funnel_conversion — ordered (non-contiguous) step progression per user
# --------------------------------------------------------------------------


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each funnel step in order: step k counts users whose
    earliest step-k event occurs at/after their earliest qualifying
    step-(k-1) event. Unlike B32's contiguous matcher
    (eventstream.py:293 "Events within a pattern remain intact"), steps
    here may have any events interleaved — the classic product funnel.

    Each frontier (one row per reaching user) is broadcast into the next
    step's scan, so the events table is shuffled once per step on
    nothing — only filtered + broadcast-joined — and aggregated
    map-side."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    frontier = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("us_k"))
    )
    counts = [frontier.count()]
    for step in FUNNEL_STEPS[1:]:
        frontier = (
            ev.filter(F.col("event_type") == step)
            .join(F.broadcast(frontier), "user_id")
            .filter(F.col("us") >= F.col("us_k"))
            .groupBy("user_id")
            .agg(F.min("us").alias("us_k"))
        )
        counts.append(frontier.count())
    rows = [
        (i + 1, step, counts[i], round(counts[i] / counts[0], 6))
        for i, step in enumerate(FUNNEL_STEPS)
    ]
    return spark.createDataFrame(
        rows, "step int, step_type string, users bigint, conv_rate double"
    )


# --------------------------------------------------------------------------
# retention_cohort — first-seen-day cohorts x day offset
# --------------------------------------------------------------------------


def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort = a user's first active day;
    for each (cohort, day-offset) the count of still-active users and
    the share of the cohort they represent.

    The fact table collapses to distinct (user_id, day) FIRST (~150
    users x 30 days here; bounded by users x days at any scale), so the
    self-join runs on the reduced relation and both groupBys reuse the
    same user_id shuffle."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("d0"))
    joined = act.join(first, "user_id").select(
        "user_id", "d0", F.datediff("d", "d0").alias("day_offset")
    )
    per_cell = joined.groupBy("d0", "day_offset").agg(
        bigint(F.count_distinct("user_id")).alias("active_users")
    )
    w = W.partitionBy("d0")
    return per_cell.select(
        fmt_date("d0").alias("cohort_day"),
        "day_offset",
        "active_users",
        r6(
            F.col("active_users")
            / F.max(F.when(F.col("day_offset") == 0, F.col("active_users"))).over(w)
        ).alias("retention_rate"),
    )


# --------------------------------------------------------------------------
# attribution_last_touch — most recent view/click before each purchase
# --------------------------------------------------------------------------


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: the most recent preceding view/click by the same
    user within 24h (``last(..., ignorenulls)`` over one per-user sort —
    the as-of-join-as-window pattern from B9, reused for attribution).
    Purchases with no in-horizon touch attribute to 'direct'."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*ATTRIB_TOUCHES)
    touched = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.last(F.when(is_touch, F.col("us")), ignorenulls=True).over(w).alias("touch_us"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_raw"),
    )
    gap = (F.col("us") - F.col("touch_us")) / 1_000_000.0
    in_horizon = F.col("touch_us").isNotNull() & (gap <= ATTRIB_HORIZON_S)
    return touched.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.when(in_horizon, F.col("touch_raw")).otherwise(F.lit("direct")).alias(
            "touch_type"
        ),
        r6(F.when(in_horizon, gap)).alias("gap_s"),
    )


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "retention_cohort": retention_cohort,
    "attribution_last_touch": attribution_last_touch,
}

_FUNNEL_ORACLE = f"""
    WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS us_k FROM events
        WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
    ), s2 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS us_k
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND epoch_us(e.ts) >= s1.us_k
        GROUP BY 1
    ), s3 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS us_k
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND epoch_us(e.ts) >= s2.us_k
        GROUP BY 1
    ), steps AS (
        SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS step_type,
               (SELECT count(*) FROM s1) AS users
        UNION ALL
        SELECT 2, '{FUNNEL_STEPS[1]}', (SELECT count(*) FROM s2)
        UNION ALL
        SELECT 3, '{FUNNEL_STEPS[2]}', (SELECT count(*) FROM s3)
    )
    SELECT step, step_type, CAST(users AS BIGINT) AS users,
           round(users * 1.0 / first_value(users) OVER (ORDER BY step), 6)
               AS conv_rate
    FROM steps
"""

ORACLES = {
    "funnel_conversion": _FUNNEL_ORACLE,
    "retention_cohort": f"""
        WITH act AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        ), first AS (
            SELECT user_id, min(d) AS d0 FROM act GROUP BY 1
        ), per_cell AS (
            SELECT f.d0, date_diff('day', f.d0, a.d) AS day_offset,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
            FROM act a JOIN first f USING (user_id)
            GROUP BY 1, 2
        )
        SELECT {duck_fmt_date('d0')} AS cohort_day, day_offset, active_users,
               round(active_users * 1.0 / max(CASE WHEN day_offset = 0
                   THEN active_users END) OVER (PARTITION BY d0), 6)
                   AS retention_rate
        FROM per_cell
    """,
    "attribution_last_touch": f"""
        WITH touched AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   last_value(CASE WHEN event_type IN ('view', 'click')
                       THEN epoch_us(ts) END IGNORE NULLS) OVER w AS touch_us,
                   last_value(CASE WHEN event_type IN ('view', 'click')
                       THEN event_type END IGNORE NULLS) OVER w AS touch_raw
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id AS purchase_event_id,
               CASE WHEN touch_us IS NOT NULL
                         AND (us - touch_us) / 1000000.0 <= {ATTRIB_HORIZON_S}
                    THEN touch_raw ELSE 'direct' END AS touch_type,
               round(CASE WHEN touch_us IS NOT NULL
                         AND (us - touch_us) / 1000000.0 <= {ATTRIB_HORIZON_S}
                     THEN (us - touch_us) / 1000000.0 END, 6) AS gap_s
        FROM touched WHERE event_type = 'purchase'
    """,
}
