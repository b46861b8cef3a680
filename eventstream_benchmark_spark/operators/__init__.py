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
# (DRIVER_WINDOW=50 of 212 per round), so registry order decides which
# queries earn a CORRECTNESS row this round.  Round-8 rotation, now
# MECHANIZED (VERDICT r7 items 1/2/5): this tuple is the output of
# ``rotation.compute_front`` over merged CORRECTNESS_r1-r7 — never-
# sampled additions first (this round's `generate_stream_dataframe`,
# `multimodal_binaryfile_ingest`, `sample_cluster_aware_split`, and
# `scan_xml_roundtrip`),
# then ascending latest-green round, alphabetical within a round — and
# ``tests/test_rotation.py`` asserts literal == computation, so the
# round-7 failure mode (51 names hand-counted into a 50-slot window,
# silently starving `embed_quantize_int8`) can no longer happen.  This
# window fronts the four round-8 additions, all 16 r3-stale entries,
# and the 30 alphabetically first r4 entries, completing the freshness
# cycle: after round 8 every registered query has a driver-green row
# within the last four rounds.
# The CORRECTNESS history round this front list was generated from
# (tests recompute staleness over rounds 1..this and assert equality;
# bump it when regenerating the list at the start of the next round —
# rotation.compute_front(all_queries(), repo_root, upto=<new round>)).
_FRONT_GENERATED_FROM_ROUND = 7

_FRONT_OF_REGISTRY: tuple[str, ...] = (
    # never sampled (round-8 additions, 4 of the ≤5 gap-closure cap)
    "generate_stream_dataframe",
    "multimodal_binaryfile_ingest",
    "sample_cluster_aware_split",
    "scan_xml_roundtrip",
    # r3-green — 4 rounds stale, the cycle's last pack (all 16)
    "decontaminate_ngram_overlap",
    "embed_quantize_int8",
    "generate_patterns_spark",
    "generate_stream_exact",
    "pack_sequences_chunked",
    "pattern_recovery_scored",
    "sample_topn_per_stratum",
    "sample_weighted_hash",
    "streaming_foreach_batch_sink",
    "streaming_left_outer_join",
    "streaming_rate_replay",
    "streaming_session_window",
    "text_bigram_surprisal",
    "text_repetition_score",
    "udf_surface",
    "vocab_oov_rate",
    # r4-green re-checks, alphabetical (first 30 of 44 fill the window)
    "agg_cube",
    "agg_histogram",
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup",
    "agg_skew_salted",
    "ann_ivf_cosine",
    "cogroup_asof_enrich",
    "corpus_mix_rebalance",
    "dedup_keep_latest",
    "docs_chunk_overlap",
    "generate_stream_sharded",
    "graph_pagerank",
    "join_full_outer",
    "multimodal_extract",
    "multimodal_frame_sample",
    "multimodal_resize",
    "pipeline_dedup_ordered",
    "scalar_datetime",
    "scalar_decimal",
    "scalar_math",
    "scalar_math_density",
    "scalar_string",
    "scalar_string_distance",
    "set_ops",
    "sort_limit_topk",
    "sql_tpch_q11",
    "sql_tpch_q13",
    "sql_tpch_q15",
    "sql_tpch_q16",
)


def _ordered(merged: dict) -> dict:
    assert len(_FRONT_OF_REGISTRY) <= 50, (
        f"{len(_FRONT_OF_REGISTRY)} front names for the driver's 50-slot "
        "per-round window — entries past slot 50 silently miss the round "
        "(the round-7 embed_quantize_int8 overflow)"
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
