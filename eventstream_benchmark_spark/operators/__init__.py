"""Layer-B operator packs (SURVEY.md §2.2).

Each module exposes ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> DuckDB SQL]``; ``all_queries()`` /
``all_oracles()`` merge them for the driver contract in
``/root/repo/__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver evaluates registry entries in order with a per-round budget
# (~50 of 208 per round), so registry order decides which queries earn a
# CORRECTNESS row this round.  Round-7 rotation (the freshness cycle's
# second half, per VERDICT r6 items 1-2), strictly by staleness against
# merged CORRECTNESS_r1-r6: (1) the three queries with NO driver row —
# the two round-6 additions (queued behind round-6's window by design)
# and this round's one gap-closure addition (`dedup_semantic_recall_
# eval`, the SemDeDup boundary-miss measurement — within the ≤5 cap);
# (2) `scan_schema_evolution`, r5-green but its read path changed this
# round (explicit generation paths instead of the scratch root — ADVICE
# r6) so it needs a fresh row; (3) the 16 remaining round-2-green
# re-checks — four rounds stale after this round; (4) 31 of the 46
# round-3-green re-checks, with the four whose code or composition
# changed this round pulled to the front of the pack
# (`agg_stats_moments` integer-scaled hash spelling,
# `dedup_embedding_cosine` now composed into the recall eval,
# `copurchase_part_pairs` riding the family-shared edge build,
# `dedup_cluster_cc` newly sf1-probed). The 15 r3 remainders rotate in
# round 8, which completes the cycle: every entry driver-green within
# the last three rounds.
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    # (1) no driver CORRECTNESS row yet
    "dedup_semantic_cluster",
    "export_range_partitioned",
    "dedup_semantic_recall_eval",   # round-7 addition (gap-closure cap)
    # (2) code changed this round — needs a fresh row
    "scan_schema_evolution",
    # (3) the 16 remaining round-2-green re-checks
    "stream_drift_score",
    "retention_cohort",
    "attribution_last_touch",
    "dedup_exact_text",
    "embed_dim_stats",
    "knn_bruteforce_topk",
    "sample_hash_split",
    "text_token_count",
    "text_langid",
    "text_fingerprint",
    "text_tokenize_topterms",
    "pipeline_corpus_prep",
    "streaming_replay_tumbling",
    "streaming_dedup_watermark",
    "streaming_join_clicks_purchases",
    "session_window_agg",
    # (4) round-3-green re-checks: changed/composed-this-round first,
    # then the r3 pack in merged order (15 remainders -> round 8)
    "agg_stats_moments",
    "dedup_embedding_cosine",
    "copurchase_part_pairs",
    "dedup_cluster_cc",
    "scan_parquet_project_filter",
    "scan_csv_roundtrip",
    "predicate_combo",
    "join_inner_equi",
    "join_left_outer",
    "join_semi_anti",
    "join_skew_salted",
    "agg_hash_global",
    "agg_distinct",
    "scan_jsonl_roundtrip",
    "scan_orc_roundtrip",
    "write_partitioned_pruned",
    "join_bucketed_colocated",
    "sql_tpch_q4",
    "sql_tpch_q12",
    "sql_tpch_q14",
    "sql_tpch_q6",
    "sql_tpch_q10",
    "sql_tpch_q18",
    "sql_tpch_q19",
    "stream_anomaly_mad",
    "scd2_user_state",
    "rollup_hourly_daily",
    "time_weighted_avg",
    "funnel_conversion",
    "attribution_linear",
    "embed_quantize_int8",
)


def _ordered(merged: dict) -> dict:
    missing = [n for n in _FRONT_OF_REGISTRY if n not in merged]
    assert not missing, (
        f"_FRONT_OF_REGISTRY names absent from the registry: {missing} — "
        "a rename/removal would silently demote the query past the "
        "driver's per-round window"
    )
    front = {n: merged.pop(n) for n in _FRONT_OF_REGISTRY}
    front.update(merged)
    return front


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from eventstream_benchmark_spark.operators import (
        dedup,
        eventstream,
        funnel,
        graph,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
    )
    from eventstream_benchmark_spark.generator import queries as gen_queries
    from eventstream_benchmark_spark.streaming import queries as streaming_queries

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, eventstream, funnel, graph, dedup, similarity, text, multimodal, pipeline):
        merged.update(mod.QUERIES)
    merged.update(gen_queries.QUERIES)
    merged.update(streaming_queries.QUERIES)
    return _ordered(merged)


def all_oracles() -> dict[str, str]:
    from eventstream_benchmark_spark.operators import (
        dedup,
        eventstream,
        funnel,
        graph,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
    )
    from eventstream_benchmark_spark.generator import queries as gen_queries
    from eventstream_benchmark_spark.streaming import queries as streaming_queries

    merged: dict[str, str] = {}
    for mod in (relational, eventstream, funnel, graph, dedup, similarity, text, multimodal, pipeline):
        merged.update(mod.ORACLES)
    merged.update(gen_queries.ORACLES)
    merged.update(streaming_queries.ORACLES)
    return merged
