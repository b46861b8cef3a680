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
# (~50 of 118 per round), so registry order decides which queries earn a
# CORRECTNESS row this round.  Round-4 rotation, strictly by
# verification staleness: (1) the 25 queries whose only green row is
# round 1, (2) queries whose oracle changed this round or has never
# produced a driver row, (3) round-2-green re-checks; the round-3-green
# pack (all 50 sampled last round) closes the list and cycles back next
# round.
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    # (1) only driver row is from round 1 — three rounds stale
    "agg_skew_salted",
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup",
    "agg_cube",
    "agg_histogram",
    "win_frame_range",
    "win_frame_running",
    "win_value_functions",
    "win_lag_inter_arrival",
    "topk_per_group",
    "sort_limit_topk",
    "set_ops",
    "dedup_keep_latest",
    "scalar_string",
    "scalar_string_distance",
    "scalar_datetime",
    "scalar_math",
    "scalar_math_density",
    "scalar_decimal",
    "stream_sliding_rate",
    "stream_sessionize",
    "stream_type_drift",
    # (2) oracle changed this round / never exercised by the driver
    "generate_stream_sharded",  # constant oracle (integer n_pattern) — first driver row
    "ann_lsh_cosine",          # rows-only -> in-plan recall constant oracle
    "ann_ivf_cosine",          # rows-only -> in-plan recall constant oracle
    "multimodal_extract",      # stub -> real BMP decode + constant oracle
    "multimodal_resize",       # summarized under the BMP media table
    "multimodal_frame_sample",  # summarized under the BMP media table
    "text_tfidf_topterms",     # N_docs folded in-plan (one action)
    "sql_tpch_q7",             # new: bilateral-trade double-nation join
    "sql_tpch_q8",             # new: market-share 8-table chain
    "sql_tpch_q9",             # new: product-profit shape (proxy cost)
    "sql_tpch_q13",            # new: LEFT-JOIN-ON-filter distribution
    "sql_tpch_q15",            # new: CTE reuse + scalar-max election
    "sql_tpch_q17",            # new: correlated avg decorrelation
    "sql_tpch_q21",            # new: EXISTS + NOT EXISTS double corr.
    "sql_tpch_q22",            # new: scalar avg + anti-join rollup
    "docs_chunk_overlap",      # new: sliding-window context chunking
    "corpus_mix_rebalance",    # new: source-mixture reweighting
    "graph_pagerank",          # new: 3-iteration numeric iteration
    "join_full_outer",         # new: reconciliation full outer
    "reshape_unpivot",         # new: stack/melt inverse of pivot
    "pipeline_dedup_ordered",  # new: exact-then-near dedup funnel
    "sql_tpch_q2",             # new: min-cost-supplier (derived partsupp)
    "sql_tpch_q11",            # new: important-stock HAVING subquery
    "sql_tpch_q16",            # new: NOT IN null-aware anti join
    "sql_tpch_q20",            # new: two-column correlated decorrelation
    "udtf_surface",            # new: Python UDTF lateral expansion
    "cogroup_asof_enrich",     # new: cogroup applyInPandas merge-asof
    # first past the ~50 window: previously-green r1 re-checks and the
    # post-window round-4 addition outrank nothing above
    # (never-sampled > 3-rounds-stale), rotate back first next round
    "scalar_map",
    "scalar_conditional",
    "events_ohlc_candles",     # new: OHLC bucket downsampling
    # (3) round-2-green re-checks, filling the rest of the window
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
    "dedup_ngram_jaccard",
    "embed_cosine_topk",
    "embed_dim_stats",
    "knn_bruteforce_topk",
    "sample_hash_split",
    "text_token_count",
    "text_quality_score",
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
