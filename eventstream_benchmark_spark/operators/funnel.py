"""Sequential / behavioral analytics pack (Layer-B extensions).

The reference embeds ordered multi-step patterns into a noisy stream
(eventstream.py:288-409) and its README motivates "sequence-learning
systems" as the consumer. These operators are the standard product
analytics built on exactly that structure: funnel progression,
cohort retention, and last-touch attribution over the ``events``
table.

Scale notes (100 TB): every stage here shuffles on ``user_id`` only —
the funnel folds each user's sorted step events through one
``aggregate`` pass, so an N-step funnel costs one fact scan + one
user_id shuffle regardless of N (and builds lazily: zero driver-side
actions); retention reduces the fact table to distinct (user, day)
before any join; the attribution window is a single per-user sort
reused by both ``last`` calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import load_table
from eventstream_benchmark_spark.operators._cache import scoped_persist
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

    ONE composed plan, no driver-side actions (the round-2 shape ran a
    synchronous ``.count()`` per step): funnel-relevant events fold per
    user into sequential funnel state — sort by (us, step_idx) once,
    then a single ``aggregate`` pass carries "earliest qualifying
    timestamp per step" (a step-k event qualifies iff step k−1 already
    fired, which on a sorted timeline is exactly the ``us_k`` chain;
    the step_idx sort tiebreak lets an equal-timestamp later step
    qualify, matching ``>=``). Cost at any N or step count: one
    user_id shuffle + one tiny global aggregate — the events table is
    scanned once, and adding funnel steps adds zero jobs, shuffles, or
    scans."""
    k = len(FUNNEL_STEPS)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    step_idx = F.when(F.col("event_type") == FUNNEL_STEPS[0], 0)
    for i, s in enumerate(FUNNEL_STEPS[1:], 1):
        step_idx = step_idx.when(F.col("event_type") == s, i)
    per_user = (
        ev.filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", "us", step_idx.alias("step_idx"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("us", "step_idx"))).alias("evs"))
    )
    null_t = "CAST(NULL AS BIGINT)"
    init = ", ".join(f"'t{i}', {null_t}" for i in range(1, k + 1))
    upd = [f"'t1', coalesce(s.t1, IF(e.step_idx = 0, e.us, {null_t}))"]
    for i in range(2, k + 1):
        upd.append(
            f"'t{i}', coalesce(s.t{i}, IF(e.step_idx = {i - 1} "
            f"AND s.t{i - 1} IS NOT NULL, e.us, {null_t}))"
        )
    fold = F.expr(
        f"aggregate(evs, named_struct({init}), "
        f"(s, e) -> named_struct({', '.join(upd)}))"
    )
    totals = per_user.select(fold.alias("st")).agg(
        *[
            F.sum(F.col(f"st.t{i}").isNotNull().cast("long")).alias(f"u{i}")
            for i in range(1, k + 1)
        ]
    )
    stack_args = ", ".join(f"{i}, '{s}', u{i}" for i, s in enumerate(FUNNEL_STEPS, 1))
    return (
        totals.selectExpr(
            f"stack({k}, {stack_args}) AS (step, step_type, users)", "u1"
        )
        .select(
            "step",
            "step_type",
            "users",
            F.round(F.col("users") / F.col("u1"), 6).alias("conv_rate"),
        )
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


# --------------------------------------------------------------------------
# attribution_linear — equal credit across all in-horizon touches
# --------------------------------------------------------------------------


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view/click in the 24h
    before a purchase shares the credit equally; output is one row per
    (purchase, touch_type) with the type's touch count and credit
    share.

    The purchase↔touch pairing is a bounded range join expressed as the
    B8 time-bucket equi-join: touches key on floor(us / horizon), each
    purchase probes its own and the previous bucket (explode factor 2),
    and the exact window + ordering predicate applies after — at 100 TB
    this stays a (user_id, bucket) hash join, never a nested loop. The
    credit is one small-integer division (n_type / n_touches) — a
    single IEEE op, so both engines produce bit-identical doubles
    (composite float sums would not; see the parity notes)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    horizon_us = ATTRIB_HORIZON_S * 1_000_000
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("us").alias("p_us"),
        F.floor(F.col("us") / horizon_us).alias("bkt0"),
    )
    touches = ev.filter(F.col("event_type").isin(*ATTRIB_TOUCHES)).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("touch_type"),
        F.col("us").alias("t_us"),
        F.floor(F.col("us") / horizon_us).alias("bkt"),
    )
    probing = purchases.withColumn(
        "bkt", F.explode(F.array(F.col("bkt0"), F.col("bkt0") - 1))
    )
    strictly_before = (F.col("t_us") < F.col("p_us")) | (
        (F.col("t_us") == F.col("p_us"))
        & (F.col("t_id") < F.col("purchase_event_id"))
    )
    pairs = (
        probing.join(touches, ["user_id", "bkt"])
        .filter(strictly_before & (F.col("p_us") - F.col("t_us") <= horizon_us))
    )
    per = pairs.groupBy("user_id", "purchase_event_id", "touch_type").agg(
        bigint(F.count("*")).alias("touches")
    )
    w = W.partitionBy("purchase_event_id")
    return per.select(
        "user_id",
        "purchase_event_id",
        "touch_type",
        "touches",
        r6(F.col("touches") / F.sum("touches").over(w)).alias("credit"),
    )


def growth_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-growth timeline: per day, how many users appeared for the
    FIRST time, and the cumulative registered-user curve — the
    new-vs-returning split every product dashboard leads with, and the
    temporal inverse of ``retention_cohort`` (which fixes the cohort
    and walks forward; this fixes the day and asks who is new).

    Scale shape: first-seen is one map-combinable min-aggregate per
    user; everything after (daily counts, the running cumulative sum)
    runs on the day-grid-sized aggregate, so the only fact-table
    shuffle is the per-user min. Exact integers throughout."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        fmt_date("day").alias("day"),
        bigint(F.col("new_users")).alias("new_users"),
        bigint(F.sum("new_users").over(w_cum)).alias("cum_users"),
    ).orderBy("day")


def trend_wow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue reporting — the period-over-period delta
    every business dashboard ships: weekly revenue in exact cents,
    joined to the previous week by integer week index (epoch seconds
    div 604800 — engine-identical arithmetic, no date_trunc('week')
    start-of-week semantics to reconcile), with the absolute delta in
    cents and the relative change as a floor-micro ratio. One fact
    shuffle (week groupBy); the lag join rides the week-grid
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.expr("unix_seconds(o_orderdate) div 604800").alias("week_idx")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "revenue_cents"
        ),
        F.count("*").alias("n_orders"),
    )
    prev = weekly.select(
        (F.col("week_idx") + 1).alias("week_idx"),
        F.col("revenue_cents").alias("prev_cents"),
    )
    joined = weekly.join(prev, "week_idx", "left")
    pct_micro = F.when(
        F.col("prev_cents").isNotNull() & (F.col("prev_cents") != 0),
        F.floor(
            F.lit(1_000_000.0)
            * (
                (F.col("revenue_cents") - F.col("prev_cents")).cast("double")
                / F.col("prev_cents").cast("double")
            )
        ),
    )
    return joined.select(
        bigint(F.col("week_idx")).alias("week_idx"),
        bigint(F.col("n_orders")).alias("n_orders"),
        bigint(F.col("revenue_cents")).alias("revenue_cents"),
        bigint(F.col("revenue_cents") - F.col("prev_cents")).alias("delta_cents"),
        bigint(pct_micro).alias("pct_change_micro"),
    ).orderBy("week_idx")


TTC_BUCKET_CAP = 48  # latency histogram: hourly buckets, capped


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution — the "how long from first view
    to first purchase" histogram that prices a funnel's friction:
    per user, the first view and the first purchase AT OR AFTER it,
    the latency in exact µs, bucketed into capped hourly bins with
    per-bin user counts and summed latency. Two per-user min
    aggregates (map-combinable) + one broadcast-sized join; the
    histogram rides the bucket grid. Everything integer µs — no float
    touches the latency."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("fv_us")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    conv = (
        buys.join(views, "user_id")
        .filter(F.col("p_us") >= F.col("fv_us"))
        .groupBy("user_id", "fv_us")
        .agg(F.min("p_us").alias("fp_us"))
        .withColumn("latency_us", F.col("fp_us") - F.col("fv_us"))
    )
    bucket = F.least(
        F.lit(TTC_BUCKET_CAP),
        F.expr("latency_us div 3600000000"),
    )
    return (
        conv.groupBy(bucket.alias("bucket_h"))
        .agg(
            bigint(F.count("*")).alias("n_users"),
            bigint(F.sum("latency_us")).alias("sum_latency_us"),
        )
        .select(bigint(F.col("bucket_h")).alias("bucket_h"),
                "n_users", "sum_latency_us")
        .orderBy("bucket_h")
    )


def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since the customer's
    last order, against the corpus max date), frequency (order count),
    monetary (lifetime spend in exact cents) — each scored into
    quartiles, then the segment grid with customer counts and
    per-segment spend. The classic CRM rollup, all exact integers.

    Scoring is by DISTRIBUTED quartile cut points, not ``ntile``
    (round-8 verdict #1): the earlier three global ``ntile(4)``
    windows each forced the whole per-customer aggregate through ONE
    window task — billions of rows on a single executor at 100 TB,
    the same pattern ``export_range_partitioned`` retired in round 7.
    Instead the three 25/50/75 cut points per metric come from one
    scalar ``percentile`` aggregate (map-side partial, exact), get
    broadcast as a 1-row frame, and every customer scores itself by
    three comparisons — fully parallel, no window anywhere in the
    plan (pinned by ``tests/test_plans.py``).

    Semantics vs ntile: ties now share a bucket (cut-point bucketing)
    instead of being split to equalize counts — the oracle switches to
    the identical cut-point rule.

    Memory note: exact ``percentile`` buffers a value→count map per
    aggregate — bounded by DISTINCT metric values (days are calendar-
    bounded, frequencies orders-per-customer-bounded; spend_cents is
    the widest). That is a far weaker hazard class than the row-sized
    single-task window this replaced; at extreme scale the one-line
    switch is ``approx_percentile`` with tight accuracy for the cut
    points only — the bucketing comparisons downstream are unchanged. Determinism: the metrics are exact
    integers (days / counts / cents) and the interpolated quantile at
    p ∈ {.25, .5, .75} is exact double arithmetic (index fraction is a
    binary fraction; operands < 2⁵³), so Spark's ``percentile`` and
    DuckDB's ``quantile_cont`` produce bit-identical cut values.
    Score direction matches the old ntile ranks: r_score 1 = most
    recent quartile, f/m_score 1 = top-frequency/top-spend quartile."""
    orders = load_table(spark, sf_dir, "orders")
    # persisted: the customer-sized aggregate feeds three consumers
    # (max-date scalar, cut-point aggregate, the scoring pass) — one
    # orders scan + one shuffle instead of three
    per_cust = scoped_persist(
        orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.max(F.col("o_orderdate")).alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "spend_cents"
            ),
        )
    )
    max_date = F.broadcast(per_cust.agg(F.max("last_order").alias("maxd")))
    scored = per_cust.crossJoin(max_date).withColumn(
        "recency_days",
        F.datediff(F.to_date("maxd"), F.to_date("last_order")),
    )
    cuts = F.broadcast(
        scored.agg(
            *[
                F.percentile(metric, F.lit(p)).alias(f"{metric[:1]}q{i}")
                for metric in ("recency_days", "frequency", "spend_cents")
                for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
            ]
        )
    )

    def _bucket_asc(m: str, q: str) -> F.Column:
        # lower metric = better (recency): bucket 1 below q1, 4 above q3
        return (
            F.lit(1)
            + (F.col(m) > F.col(f"{q}1")).cast("int")
            + (F.col(m) > F.col(f"{q}2")).cast("int")
            + (F.col(m) > F.col(f"{q}3")).cast("int")
        )

    def _bucket_desc(m: str, q: str) -> F.Column:
        # higher metric = better (frequency/spend): bucket 1 above q3
        return (
            F.lit(1)
            + (F.col(m) <= F.col(f"{q}3")).cast("int")
            + (F.col(m) <= F.col(f"{q}2")).cast("int")
            + (F.col(m) <= F.col(f"{q}1")).cast("int")
        )

    tiles = scored.crossJoin(cuts).select(
        "custkey",
        "spend_cents",
        _bucket_asc("recency_days", "rq").alias("r_score"),
        _bucket_desc("frequency", "fq").alias("f_score"),
        _bucket_desc("spend_cents", "sq").alias("m_score"),
    )
    return (
        tiles.groupBy("r_score", "f_score", "m_score")
        .agg(
            bigint(F.count("*")).alias("n_customers"),
            bigint(F.sum("spend_cents")).alias("segment_spend_cents"),
        )
        .select(
            bigint(F.col("r_score")).alias("r_score"),
            bigint(F.col("f_score")).alias("f_score"),
            bigint(F.col("m_score")).alias("m_score"),
            "n_customers",
            "segment_spend_cents",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "growth_new_users_daily": growth_new_users_daily,
    "orders_rfm_segmentation": orders_rfm_segmentation,
    "funnel_time_to_convert": funnel_time_to_convert,
    "trend_wow_revenue": trend_wow_revenue,
    "retention_cohort": retention_cohort,
    "attribution_last_touch": attribution_last_touch,
    "attribution_linear": attribution_linear,
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
    "trend_wow_revenue": """
        WITH weekly AS (
            SELECT epoch_us(o_orderdate) // 1000000 // 604800 AS week_idx,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS revenue_cents,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT CAST(w.week_idx AS BIGINT) AS week_idx,
               CAST(w.n_orders AS BIGINT) AS n_orders,
               CAST(w.revenue_cents AS BIGINT) AS revenue_cents,
               CAST(w.revenue_cents - p.revenue_cents AS BIGINT)
                   AS delta_cents,
               CAST(CASE WHEN p.revenue_cents IS NOT NULL
                          AND p.revenue_cents <> 0
                         THEN floor(1000000.0 *
                              (CAST(w.revenue_cents - p.revenue_cents
                                    AS DOUBLE)
                               / CAST(p.revenue_cents AS DOUBLE)))
                    END AS BIGINT) AS pct_change_micro
        FROM weekly w LEFT JOIN weekly p ON p.week_idx = w.week_idx - 1
        ORDER BY w.week_idx
    """,
    "funnel_time_to_convert": f"""
        WITH v AS (
            SELECT user_id, min(epoch_us(ts)) AS fv_us FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events
              WHERE event_type = 'purchase'),
        conv AS (
            SELECT p.user_id, min(p.p_us) - v.fv_us AS latency_us
            FROM p JOIN v USING (user_id)
            WHERE p.p_us >= v.fv_us
            GROUP BY p.user_id, v.fv_us
        )
        SELECT CAST(least({TTC_BUCKET_CAP}, latency_us // 3600000000)
                    AS BIGINT) AS bucket_h,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(latency_us) AS BIGINT) AS sum_latency_us
        FROM conv GROUP BY 1 ORDER BY 1
    """,
    "orders_rfm_segmentation": f"""
        WITH per_cust AS (
            SELECT o_custkey AS custkey,
                   max(o_orderdate) AS last_order,
                   count(*) AS frequency,
                   sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS spend_cents
            FROM orders GROUP BY 1
        ),
        m AS (SELECT max(last_order) AS maxd FROM per_cust),
        scored AS (
            SELECT custkey, spend_cents, frequency,
                   date_diff('day', CAST(last_order AS DATE),
                             CAST(maxd AS DATE)) AS recency_days
            FROM per_cust CROSS JOIN m
        ),
        cuts AS (
            SELECT quantile_cont(recency_days, 0.25) AS rq1,
                   quantile_cont(recency_days, 0.50) AS rq2,
                   quantile_cont(recency_days, 0.75) AS rq3,
                   quantile_cont(frequency, 0.25) AS fq1,
                   quantile_cont(frequency, 0.50) AS fq2,
                   quantile_cont(frequency, 0.75) AS fq3,
                   quantile_cont(spend_cents, 0.25) AS sq1,
                   quantile_cont(spend_cents, 0.50) AS sq2,
                   quantile_cont(spend_cents, 0.75) AS sq3
            FROM scored
        ),
        tiles AS (
            SELECT custkey, spend_cents,
                   1 + CAST(recency_days > rq1 AS INT)
                     + CAST(recency_days > rq2 AS INT)
                     + CAST(recency_days > rq3 AS INT) AS r_score,
                   1 + CAST(frequency <= fq3 AS INT)
                     + CAST(frequency <= fq2 AS INT)
                     + CAST(frequency <= fq1 AS INT) AS f_score,
                   1 + CAST(spend_cents <= sq3 AS INT)
                     + CAST(spend_cents <= sq2 AS INT)
                     + CAST(spend_cents <= sq1 AS INT) AS m_score
            FROM scored CROSS JOIN cuts
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(spend_cents) AS BIGINT) AS segment_spend_cents
        FROM tiles GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "growth_new_users_daily": """
        WITH first_seen AS (
            SELECT user_id, date_trunc('day', min(ts)) AS day
            FROM events GROUP BY user_id
        ),
        daily AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
                  FROM first_seen GROUP BY day)
        SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
               CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                   AS cum_users
        FROM daily ORDER BY day
    """,
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
    "attribution_linear": f"""
        WITH p AS (
            SELECT user_id, event_id AS purchase_event_id, epoch_us(ts) AS p_us
            FROM events WHERE event_type = 'purchase'
        ), t AS (
            SELECT user_id, event_id AS t_id, event_type AS touch_type,
                   epoch_us(ts) AS t_us
            FROM events WHERE event_type IN ('view', 'click')
        ), per AS (
            SELECT p.user_id, purchase_event_id, touch_type,
                   CAST(count(*) AS BIGINT) AS touches
            FROM p JOIN t ON p.user_id = t.user_id
            WHERE (t_us < p_us OR (t_us = p_us AND t_id < purchase_event_id))
              AND p_us - t_us <= {ATTRIB_HORIZON_S * 1_000_000}
            GROUP BY 1, 2, 3
        )
        SELECT user_id, purchase_event_id, touch_type, touches,
               round(touches * 1.0
                     / sum(touches) OVER (PARTITION BY purchase_event_id), 6)
                   AS credit
        FROM per
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
