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
# (~50 of 205 per round), so registry order decides which queries earn a
# CORRECTNESS row this round.  Round-6 rotation (verification-first per
# VERDICT r5 item 1), strictly by staleness against merged
# CORRECTNESS_r1-r5: (1) the 33 queries added late in round 5 that have
# NEVER been driver-sampled (local-parity green at all three SFs, but no
# CORRECTNESS row), (2) queries whose output contract changed THIS round
# and therefore need a fresh row (`ann_lsh_cosine` gained an n_overflow
# observability column), (3) round-2-green re-checks — three rounds
# stale — in the verdict's priority order, (4) round-3-green re-checks
# fill whatever window remains; the r4/r5-green bulk follows in merged
# module order and rotates forward in round 7.
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    # (1) never driver-sampled (added after the round-5 window was spent)
    "agg_kmv_distinct",        # bottom-k sketch; r6: h_k zero-guard (ADVICE)
    "graph_bfs_hops",
    "index_inverted_postings",
    "layout_zorder_skipping",
    "join_dpp_partition_pruned",  # r6: fixed scratch dir, no tempdir leak (ADVICE)
    "events_acf_lags",
    "events_forecast_backtest",
    "events_holt_trend",
    "events_dispersion_index",
    "sample_weighted_reservoir",
    "agg_mode_median",
    "join_lateral_topn",
    "audit_referential_integrity",
    "dq_null_profile",
    "dq_benford_audit",
    "pattern_match_skip",
    "set_ops_by_name",
    "growth_new_users_daily",
    "basket_association_rules",
    "multimodal_image_phash",
    "embed_matryoshka_energy",
    "orders_rfm_segmentation",
    "funnel_time_to_convert",
    "streaming_growth_users",
    "trend_wow_revenue",
    "graph_edge_churn",
    "agg_approx_topk_contract",  # r6: tie-gap fixture invariant pinned (ADVICE)
    "dedup_method_comparison",
    "snapshot_diff_report",
    "pattern_online_prequential",
    "embed_centroid_drift",
    "events_weekday_contrast",  # r6: zero-weekend-regime ratio guard (VERDICT)
    "orders_shipping_lag",
    # (2) output contract changed in round 6 — needs a fresh row
    "ann_lsh_cosine",          # r6: bucket-cap overflow now an output column
    # (3) round-2-green re-checks (three rounds stale)
    "join_broadcast_dims",
    "agg_groupby_q1",
    "dedup_minhash_lsh",
    "pattern_match_fixed",
    "embed_cosine_topk",
    "join_range_interval",
    "join_asof",
    "sql_tpch_q3",
    "sql_tpch_q5",
    "subquery_correlated",
    "agg_grouping_sets",
    "win_ranking",
    "dedup_exact",
    "scalar_json",
    "scalar_array",
    "stream_tumbling_rate",
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
    # (4) round-3-green re-checks filling the rest of the window; the
    # remainder of the r3 pack and the r4/r5-green bulk follow in merged
    # order and rotate forward next round
    "scan_parquet_project_filter",
    "scan_csv_roundtrip",
    "predicate_combo",
    "join_inner_equi",
    "join_left_outer",
    "join_semi_anti",
    "join_skew_salted",
    "agg_hash_global",
    "agg_distinct",
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
