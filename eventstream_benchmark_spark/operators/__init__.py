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
# (rotation.DRIVER_WINDOW=50 of 215 per round), so registry order decides
# which queries earn a CORRECTNESS row this round.  This tuple is the
# output of ``rotation.compute_front`` over merged CORRECTNESS_r1-r8 —
# never-sampled additions first (round 9 gap-closure additions
# `generate_stream_dataframe_jittered`, `dedup_minhash_incremental`,
# `sample_dsir_weights`), then `_CHANGED_THIS_ROUND` (rewritten
# semantics re-verify immediately), then ascending latest-green
# round, alphabetical within a tier — and ``tests/test_rotation.py``
# asserts literal == computation, so the round-7 failure mode (51 names
# hand-counted into a 50-slot window, silently starving
# `embed_quantize_int8`) can no longer happen.  This window retires the
# whole r4-stale tranche (14 names), the 17 queries REWRITTEN this
# round (semantic/plan changes — their stale greens no longer certify
# the code), and the 16 alphabetically first r5 entries.
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
    # ntile -> distributed quartile cut points (oracle switched too)
    "orders_rfm_segmentation",
    # events.value integer-cents sum migration (both sides)
    "rollup_hourly_daily",
    "stream_tumbling_rate",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "scan_orc_roundtrip",
    "scan_xml_roundtrip",
    "write_partitioned_pruned",
    "scalar_json",
    "win_frame_running",
    "win_frame_range",
    "streaming_replay_tumbling",
    "streaming_foreach_batch_sink",
    "streaming_static_enrich",
    # collapse membership tables (plan rewrite; outputs structurally
    # unchanged but the pair build is new code)
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_cluster_cc",
)

_FRONT_GENERATED_FROM_ROUND = 8
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    "dedup_minhash_incremental",  # never sampled
    "generate_stream_dataframe_jittered",  # never sampled
    "sample_dsir_weights",  # never sampled
    "dedup_cluster_cc",  # REWRITTEN this round (last green r7)
    "dedup_embedding_cosine",  # REWRITTEN this round (last green r7)
    "dedup_minhash_lsh",  # REWRITTEN this round (last green r6)
    "orders_rfm_segmentation",  # REWRITTEN this round (last green r6)
    "rollup_hourly_daily",  # REWRITTEN this round (last green r7)
    "scalar_json",  # REWRITTEN this round (last green r6)
    "scan_csv_roundtrip",  # REWRITTEN this round (last green r7)
    "scan_jsonl_roundtrip",  # REWRITTEN this round (last green r7)
    "scan_orc_roundtrip",  # REWRITTEN this round (last green r7)
    "scan_xml_roundtrip",  # REWRITTEN this round (last green r8)
    "stream_tumbling_rate",  # REWRITTEN this round (last green r6)
    "streaming_foreach_batch_sink",  # REWRITTEN this round (last green r8)
    "streaming_replay_tumbling",  # REWRITTEN this round (last green r7)
    "streaming_static_enrich",  # REWRITTEN this round (last green r5)
    "win_frame_range",  # REWRITTEN this round (last green r5)
    "win_frame_running",  # REWRITTEN this round (last green r4)
    "write_partitioned_pruned",  # REWRITTEN this round (last green r7)
    "sql_tpch_q17",  # r4
    "sql_tpch_q2",  # r4
    "sql_tpch_q20",  # r4
    "sql_tpch_q21",  # r4
    "sql_tpch_q22",  # r4
    "sql_tpch_q8",  # r4
    "stream_sessionize",  # r4
    "stream_type_drift",  # r4
    "text_tfidf_topterms",  # r4
    "topk_per_group",  # r4
    "udtf_surface",  # r4
    "win_lag_inter_arrival",  # r4
    "win_value_functions",  # r4
    "agg_approx_quantiles",  # r5
    "agg_distinct_approx",  # r5
    "agg_hll_merge_daily",  # r5
    "ann_lsh_query_topk",  # r5
    "ann_recall_eval",  # r5
    "corpus_bpe_pair_counts",  # r5
    "corpus_ngram_topk",  # r5
    "corpus_source_topp",  # r5
    "corpus_temperature_resample",  # r5
    "dedup_containment_ngram",  # r5
    "dedup_ngram_jaccard",  # r5
    "dedup_recall_eval",  # r5
    "dedup_simhash",  # r5
    "dedup_url_normalize",  # r5
    "embed_pq_encode",  # r5
    "events_cusum_shift",  # r5
    "events_downsample_lttb",  # r5
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
