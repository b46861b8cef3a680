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
# (rotation.DRIVER_WINDOW=50 of 220 per round), so registry order decides
# which queries earn a CORRECTNESS row this round.  This tuple is the
# output of ``rotation.compute_front`` over merged CORRECTNESS_r1-r9 —
# never-sampled additions first (round-10 additions
# `text_substring_dedup`, `text_substring_removal`,
# `dedup_threshold_sweep`, `dedup_keeper_policies`,
# `decontaminate_bloom`), then
# `_CHANGED_THIS_ROUND` (rewritten semantics/plans re-verify
# immediately), then ascending latest-green round, alphabetical within
# a tier — and ``tests/test_rotation.py`` asserts literal ==
# computation, so the round-7 failure mode (51 names hand-counted into
# a 50-slot window, silently starving `embed_quantize_int8`) can no
# longer happen.  This window clears the ENTIRE 29-name r5-stale
# backlog the r9 changed-tier deferral created (r9 verdict #1) plus
# the 12 alphabetically first r6 entries.
# The CORRECTNESS history round this front list was generated from
# (tests recompute staleness over rounds 1..this and assert equality;
# bump it when regenerating the list at the start of the next round —
# rotation.compute_front(all_queries(), repo_root, upto=<new round>)).
# Queries whose OUTPUT SEMANTICS or plan were rewritten this round —
# their last green driver row no longer certifies the current code, so
# rotation fronts them right after never-sampled additions (round-9
# self-review finding: the staleness-only ordering left the RFM
# rewrite and the cents migration without a same-round driver check).
# Reset this tuple to () when regenerating for a round with no
# semantic rewrites.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round-10 CC rewrite (r9 verdict #2): connected components now
    # iterate over representative-level edges with a post-hoc
    # membership join, and the collapsed MinHash chain's building
    # blocks became family-shared frames — every query whose EXECUTED
    # plan contains the rewritten subtree re-verifies this round
    "dedup_cluster_cc",
    "dedup_minhash_lsh",
    "dedup_recall_eval",
    "sample_cluster_aware_split",
)

_FRONT_GENERATED_FROM_ROUND = 9
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    "decontaminate_bloom",  # never sampled
    "dedup_keeper_policies",  # never sampled
    "dedup_threshold_sweep",  # never sampled
    "text_substring_dedup",  # never sampled
    "text_substring_removal",  # never sampled
    "dedup_cluster_cc",  # REWRITTEN this round (last green r9)
    "dedup_minhash_lsh",  # REWRITTEN this round (last green r9)
    "dedup_recall_eval",  # REWRITTEN this round (last green r9)
    "sample_cluster_aware_split",  # REWRITTEN this round (last green r8)
    "events_ewma_smooth",  # r5
    "events_gap_fill_locf",  # r5
    "events_markov_transitions",  # r5
    "events_ohlc_candles",  # r5
    "events_resample_interp",  # r5
    "export_shard_manifest",  # r5
    "graph_triangle_count",  # r5
    "join_asof_nearest",  # r5
    "join_interval_overlap",  # r5
    "join_null_safe",  # r5
    "join_runtime_filtered",  # r5
    "multimodal_audio_features",  # r5
    "multimodal_image_hist",  # r5
    "pipeline_pretrain_corpus",  # r5
    "quality_logreg_filter",  # r5
    "reshape_unpivot",  # r5
    "scalar_conditional",  # r5
    "scalar_map",  # r5
    "scalar_variant",  # r5
    "scan_csv_permissive",  # r5
    "sql_tpch_q7",  # r5
    "sql_tpch_q9",  # r5
    "stream_sliding_rate",  # r5
    "streaming_ewma_state",  # r5
    "streaming_incremental_rollup",  # r5
    "streaming_pattern_state",  # r5
    "text_line_dedup",  # r5
    "text_pii_redact",  # r5
    "text_quality_score",  # r5
    "agg_approx_topk_contract",  # r6
    "agg_groupby_q1",  # r6
    "agg_grouping_sets",  # r6
    "agg_kmv_distinct",  # r6
    "agg_mode_median",  # r6
    "ann_lsh_cosine",  # r6
    "audit_referential_integrity",  # r6
    "basket_association_rules",  # r6
    "dedup_exact",  # r6
    "dedup_method_comparison",  # r6
    "dq_benford_audit",  # r6
    "dq_null_profile",  # r6
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
