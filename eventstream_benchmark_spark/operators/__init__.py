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
# CORRECTNESS row this round.  Round-5 rotation, strictly by
# verification staleness (merged CORRECTNESS_r1-r4): (1) never-sampled /
# round-1-stale queries, (2) the ~79 queries whose oracle or
# implementation changed or were ADDED in round 5 (a fresh driver row
# beats any re-check), (3) round-2-green re-checks, (4) round-3-green
# entries fill whatever window remains.  Section (2) far overflows a
# 50-query window: roughly everything from `multimodal_image_hist`
# (position ~51) onward — including all late-session additions, each
# parity-certified locally at all three SFs — plus ALL r2/r3 re-checks
# slips to round 6 and must rotate to the very front then.
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    # (1) never sampled / stalest
    "events_ohlc_candles",     # added post-window in round 4 — first driver row
    "scalar_map",              # only green row is round 1
    "scalar_conditional",      # only green row is round 1
    # (2) oracle/implementation changed in round 5
    "dedup_simhash",           # rows-only -> cross-engine md5 shingle hash oracle
    "agg_distinct_approx",     # rows-only -> in-plan within_5pct hash contract
    "streaming_pattern_state",  # rows-only -> batch-twin DuckDB oracle
    "ann_lsh_cosine",          # single 12-bit table -> per-bucket cap, oracle updated
    "graph_triangle_count",    # degree-oriented wedge join rework
    "dedup_ngram_jaccard",     # shingle docfreq cap, oracle mirrored
    "sql_tpch_q7",             # revenue re-summed over 1e-4-scaled BIGINTs
    "sql_tpch_q9",             # profit re-summed over 1e-4-scaled BIGINTs
    "reshape_unpivot",         # measure sums re-scaled to exact cents
    "dedup_containment_ngram",  # new: asymmetric partial-dup pairs
    "corpus_ngram_topk",       # new: corpus-wide top-k shingle docfreq
    "agg_approx_quantiles",    # new: sketch-quantile accuracy contract
    "corpus_temperature_resample",  # new: T=2 source-mixing weights
    "ann_lsh_query_topk",      # new: multiprobe LSH query-side kNN
    "events_resample_interp",  # new: linear-interpolation resampling
    "join_interval_overlap",   # new: sessions x maintenance calendar
    "scan_schema_evolution",   # new: mergeSchema across generations
    "agg_hll_merge_daily",     # new: mergeable HLL state contract
    "join_runtime_filtered",   # revenue re-summed over 1e-4-scaled BIGINTs (r5)
    "text_line_dedup",         # new: C4-style cross-doc span dedup, keep-first
    "text_pii_redact",         # new: deterministic PII plant + regex scrub
    "quality_logreg_filter",   # new: fixed-weight linear quality gate
    "export_shard_manifest",   # new: shard manifest w/ checksums + offsets
    "embed_pq_encode",         # new: product-quantization codes + recon MSE
    "streaming_static_enrich",  # new: stream-static broadcast dim join
    "events_ewma_smooth",      # new: dyadic-exact EWMA smoother
    "events_downsample_lttb",  # new: parallel LTTB curve downsampling
    "corpus_bpe_pair_counts",  # new: first BPE merge candidates
    "events_cusum_shift",      # new: exact-integer CUSUM change detection
    "pipeline_pretrain_corpus",  # new: gate->span-dedup->PII->manifest
    "join_asof_nearest",       # new: bidirectional tolerance-bounded asof
    "dedup_url_normalize",     # new: URL canonicalization dedup
    "text_quality_score",      # r5 hardening: micro-int ratios (sf0.1 sweep)
    "stream_sliding_rate",     # r5 hardening: quantized integer window avg
    "win_frame_range",         # r5 hardening: oracle epoch floor fix
    "events_gap_fill_locf",    # r5 hardening: integer micro-avg carry
    "corpus_source_topp",      # new: nucleus source selection
    "events_markov_transitions",  # new: transition-matrix estimation
    "streaming_ewma_state",    # new: 2nd applyInPandasWithState, exact oracle
    "streaming_incremental_rollup",  # new: foreachBatch merge rollup
    "join_null_safe",          # new: <=> reconciliation on pre-aggregates
    "scan_csv_permissive",     # new: malformed-CSV triage, full-parse forced
    "multimodal_audio_features",  # new: PCM zero-crossings/energy/peak
    "dedup_recall_eval",       # new: LSH-vs-truth confusion contract
    "ann_recall_eval",         # new: measured recall@k, composed oracles
    "scalar_variant",          # new: Spark 4 VARIANT parse + typed paths
    "multimodal_image_hist",   # new: corpus pixel-intensity histogram
    "agg_kmv_distinct",        # new: bottom-k sketch, replayable estimate
    "graph_bfs_hops",          # new: multi-source BFS, recursive-CTE oracle
    "index_inverted_postings",  # new: positional inverted-index build
    "layout_zorder_skipping",  # new: Morton layout vs linear, skip metric
    "events_acf_lags",         # new: exact-integer hourly autocorrelation
    "join_dpp_partition_pruned",  # new: runtime partition pruning, plan-pinned
    "sample_weighted_reservoir",  # new: weighted-minwise fixed-K sample
    "events_forecast_backtest",  # new: naive vs seasonal-naive error floor
    "events_holt_trend",       # new: dyadic Holt level+trend, bit-exact
    "agg_mode_median",         # new: explicit-tiebreak order statistics
    "join_lateral_topn",       # new: correlated LATERAL, decorrelated plan
    "events_dispersion_index",  # new: Fano factor vs the Poisson law
    "audit_referential_integrity",  # new: FK orphan audit, anti joins
    "dq_null_profile",         # new: column null/distinct/range profile
    "pattern_match_skip",      # new: skip-tolerant sequence match
    "set_ops_by_name",         # new: unionByName w/ missing columns
    "growth_new_users_daily",  # new: new-vs-cumulative user curve
    "basket_association_rules",  # new: confidence/lift rule mining
    "dq_benford_audit",        # new: first-digit law screen, exact ints
    "multimodal_image_phash",  # new: perceptual-hash image near-dup
    "embed_matryoshka_energy",  # new: prefix-energy truncation eval
    "orders_rfm_segmentation",  # new: RFM quartile grid, exact cents
    "funnel_time_to_convert",  # new: conversion-latency histogram
    "streaming_growth_users",  # new: incremental first-seen state curve
    "trend_wow_revenue",       # new: week-over-week delta reporting
    "graph_edge_churn",        # new: temporal-graph YoY reconciliation
    "agg_approx_topk_contract",  # new: heavy-hitters sketch contract
    "dedup_method_comparison",  # new: 4 pair-finders, one lazy report
    "snapshot_diff_report",    # new: CDC-style fingerprint table diff
    "pattern_online_prequential",  # new: test-then-train scoring loop
    "embed_centroid_drift",    # new: embedding shift monitor, exact ints
    "events_weekday_contrast",  # new: weekly seasonality screen
    "orders_shipping_lag",     # new: order-to-ship latency histogram
    # (3) round-2-green re-checks
    "join_broadcast_dims",
    "join_range_interval",
    "join_asof",
    "agg_groupby_q1",
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
    "embed_cosine_topk",
    "embed_dim_stats",
    "knn_bruteforce_topk",
    "sample_hash_split",
    "text_token_count",
    "text_langid",
    "text_fingerprint",
    "text_tokenize_topterms",
    "pipeline_corpus_prep",
    "dedup_minhash_lsh",
    "pattern_match_fixed",
    "streaming_replay_tumbling",
    "streaming_dedup_watermark",
    "streaming_join_clicks_purchases",
    "session_window_agg",
    # (4) round-3-green re-checks filling the rest of the window; the
    # remainder of the r3 pack and the whole r4 pack follow in merged
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
