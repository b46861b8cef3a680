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
# (rotation.DRIVER_WINDOW=50 of 225 per round), so registry order decides
# which queries earn a CORRECTNESS row this round.  This tuple is the
# output of ``rotation.compute_front`` over merged CORRECTNESS_r1-r10 —
# never-sampled additions first (the five round-11 additions:
# `decontaminate_fuzzy_minhash`, `decontaminate_semantic_embed`,
# `dedup_soft_weights`, `embed_binary_quantize`,
# `text_quality_gopher`), then
# `_CHANGED_THIS_ROUND` (rewritten semantics/plans re-verify
# immediately), then ascending latest-green round, alphabetical within
# a tier — and ``tests/test_rotation.py`` asserts literal ==
# computation, so the round-7 failure mode (51 names hand-counted into
# a 50-slot window, silently starving `embed_quantize_int8`) can no
# longer happen.  This window retires all 34 remaining r6-green rows
# and the 2 alphabetically first r7 names (the second-batch additions
# and rewrites displaced the other four r7 names —
# agg_stats_moments, attribution_last_touch, attribution_linear,
# copurchase_part_pairs — to the next round), leaving zero entries
# older than r6-green after this round's driver pass (r10 verdict #2
# asked for zero older than r7; those four r7 rows re-verify in r12).
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
    # round-11 keep-first rewrites (r10 verdict #1): the span/cluster-
    # keyed windows became partial-aggregable min/max-struct + count
    # aggregates — every query whose EXECUTED plan contains one of the
    # rewritten subtrees re-verifies this round
    "text_line_dedup",
    "pipeline_pretrain_corpus",
    "text_substring_dedup",
    "text_substring_removal",
    "dedup_keeper_policies",
    # round-11 j=0 Bloom pre-filter (r10 verdict #5)
    "decontaminate_bloom",
    # round-11: the asymmetric probe chain moved into the shared
    # `_asymmetric_member_pairs` builder (plan-shape preserved, code
    # path rewritten)
    "dedup_minhash_incremental",
    # round-11 second batch: cluster_size became a partial-aggregable
    # groupBy + join (the last cluster-keyed count window retired)
    "dedup_cluster_cc",
    # round-11 second batch: the TWAP lead segmented per (event_type,
    # hour-bucket) with a bucket-boundary halo — the bare-event_type
    # window over raw events retired (fixed ~10-type cardinality =
    # corpus/10 rows in one sort task at scale)
    "time_weighted_avg",
    # round-11 second batch: the posting fingerprint became a
    # two-level (term, doc-shard) digest — the top terms' whole-corpus
    # collect_list retired; posting_md5 VALUES changed (oracle updated
    # in lockstep)
    "index_inverted_postings",
)

_FRONT_GENERATED_FROM_ROUND = 10
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    "decontaminate_fuzzy_minhash",  # never sampled
    "decontaminate_semantic_embed",  # never sampled (2nd r11 batch)
    "dedup_soft_weights",  # never sampled (2nd r11 batch)
    "embed_binary_quantize",  # never sampled
    "text_quality_gopher",  # never sampled
    "decontaminate_bloom",  # REWRITTEN this round (last green r10)
    "dedup_cluster_cc",  # REWRITTEN this round (2nd batch; last green r10)
    "dedup_keeper_policies",  # REWRITTEN this round (last green r10)
    "dedup_minhash_incremental",  # REWRITTEN this round (last green r9)
    "index_inverted_postings",  # REWRITTEN this round (2nd batch; sharded digest)
    "pipeline_pretrain_corpus",  # REWRITTEN this round (last green r10)
    "text_line_dedup",  # REWRITTEN this round (last green r10)
    "text_substring_dedup",  # REWRITTEN this round (last green r10)
    "text_substring_removal",  # REWRITTEN this round (last green r10)
    "time_weighted_avg",  # REWRITTEN this round (2nd batch; segmented lead)
    "embed_centroid_drift",  # r6
    "embed_cosine_topk",  # r6
    "embed_matryoshka_energy",  # r6
    "events_acf_lags",  # r6
    "events_dispersion_index",  # r6
    "events_forecast_backtest",  # r6
    "events_holt_trend",  # r6
    "events_weekday_contrast",  # r6
    "funnel_time_to_convert",  # r6
    "graph_bfs_hops",  # r6
    "graph_edge_churn",  # r6
    "growth_new_users_daily",  # r6
    "join_asof",  # r6
    "join_broadcast_dims",  # r6
    "join_dpp_partition_pruned",  # r6
    "join_lateral_topn",  # r6
    "join_range_interval",  # r6
    "layout_zorder_skipping",  # r6
    "multimodal_image_phash",  # r6
    "orders_shipping_lag",  # r6
    "pattern_match_fixed",  # r6
    "pattern_match_skip",  # r6
    "pattern_online_prequential",  # r6
    "sample_weighted_reservoir",  # r6
    "scalar_array",  # r6
    "set_ops_by_name",  # r6
    "snapshot_diff_report",  # r6
    "sql_tpch_q3",  # r6
    "sql_tpch_q5",  # r6
    "streaming_growth_users",  # r6
    "subquery_correlated",  # r6
    "trend_wow_revenue",  # r6
    "win_ranking",  # r6
    "agg_distinct",  # r7
    "agg_hash_global",  # r7
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
