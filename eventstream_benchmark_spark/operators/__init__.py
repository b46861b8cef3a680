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
# (rotation.DRIVER_WINDOW=50 of 230 per round), so registry order decides
# which queries earn a CORRECTNESS row this round.  This tuple is the
# output of ``rotation.compute_front`` over merged CORRECTNESS_r1-r11 —
# never-sampled additions first (the five round-12 additions:
# `corpus_bpe_apply`, `corpus_bpe_merge_loop`, `index_bm25_topk`,
# `pack_sequences_harmonic`, `text_paragraph_dedup`), then `_CHANGED_THIS_ROUND` (rewritten
# semantics/plans re-verify immediately), then ascending latest-green
# round, alphabetical within a tier — and ``tests/test_rotation.py``
# asserts literal == computation, so the round-7 failure mode (51 names
# hand-counted into a 50-slot window, silently starving
# `embed_quantize_int8`) can no longer happen.  This window retires ALL
# 39 remaining r7-green rows (the 4-round-stale tail the r11 verdict
# flagged) plus the 5 alphabetically-first r8 names; after this round's
# driver pass no registry entry is older than r8-green.
# Queries whose OUTPUT SEMANTICS or plan were rewritten this round —
# their last green driver row no longer certifies the current code, so
# rotation fronts them right after never-sampled additions (round-9
# self-review finding: the staleness-only ordering left the RFM
# rewrite and the cents migration without a same-round driver check).
# Reset this tuple to () when regenerating for a round with no
# semantic rewrites.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round-12: time_weighted_avg's bucket-frame join dropped its
    # forced broadcast hint (advisor finding — the frame grows with
    # corpus time span and the hint bypassed
    # autoBroadcastJoinThreshold with no fallback). Output values
    # unchanged, but the executed JOIN STRATEGY is new, so its r11
    # green row no longer certifies the current plan.
    "time_weighted_avg",
)

_FRONT_GENERATED_FROM_ROUND = 11
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    "corpus_bpe_apply",  # never sampled (round-12 addition)
    "corpus_bpe_merge_loop",  # never sampled (round-12 addition)
    "index_bm25_topk",  # never sampled (round-12 addition)
    "pack_sequences_harmonic",  # never sampled (round-12 addition)
    "text_paragraph_dedup",  # never sampled (round-12 addition)
    "time_weighted_avg",  # REWRITTEN this round (broadcast hint dropped; last green r11)
    "agg_stats_moments",  # r7
    "attribution_last_touch",  # r7
    "attribution_linear",  # r7
    "copurchase_part_pairs",  # r7
    "dedup_exact_text",  # r7
    "dedup_semantic_cluster",  # r7
    "dedup_semantic_recall_eval",  # r7
    "embed_dim_stats",  # r7
    "export_range_partitioned",  # r7
    "funnel_conversion",  # r7
    "join_bucketed_colocated",  # r7
    "join_inner_equi",  # r7
    "join_left_outer",  # r7
    "join_semi_anti",  # r7
    "join_skew_salted",  # r7
    "knn_bruteforce_topk",  # r7
    "pipeline_corpus_prep",  # r7
    "predicate_combo",  # r7
    "retention_cohort",  # r7
    "sample_hash_split",  # r7
    "scan_parquet_project_filter",  # r7
    "scan_schema_evolution",  # r7
    "scd2_user_state",  # r7
    "session_window_agg",  # r7
    "sql_tpch_q10",  # r7
    "sql_tpch_q12",  # r7
    "sql_tpch_q14",  # r7
    "sql_tpch_q18",  # r7
    "sql_tpch_q19",  # r7
    "sql_tpch_q4",  # r7
    "sql_tpch_q6",  # r7
    "stream_anomaly_mad",  # r7
    "stream_drift_score",  # r7
    "streaming_dedup_watermark",  # r7
    "streaming_join_clicks_purchases",  # r7
    "text_fingerprint",  # r7
    "text_langid",  # r7
    "text_token_count",  # r7
    "text_tokenize_topterms",  # r7
    "agg_cube",  # r8
    "agg_histogram",  # r8
    "agg_percentiles",  # r8
    "agg_pivot",  # r8
    "agg_rollup",  # r8
)


def _ordered(merged: dict) -> dict:
    # single source of truth for the window size (round-8 advice):
    # rotation.DRIVER_WINDOW is the measured driver budget; hardcoding
    # 50 here too would let the two constants drift if it is ever
    # re-measured
    from eventstream_benchmark_spark.rotation import DRIVER_WINDOW

    assert len(_FRONT_OF_REGISTRY) <= DRIVER_WINDOW, (
        f"{len(_FRONT_OF_REGISTRY)} front names for the driver's "
        f"{DRIVER_WINDOW}-slot per-round window — entries past the last "
        "slot silently miss the round (the round-7 embed_quantize_int8 "
        "overflow)"
    )
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
