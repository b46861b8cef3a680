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
# (rotation.DRIVER_WINDOW=50 of 235 per round), so registry order decides
# which queries earn a CORRECTNESS row this round.  This tuple is the
# output of ``rotation.compute_front`` over merged CORRECTNESS_r1-r12 —
# never-sampled additions first (the five round-13 additions:
# `corpus_bpe_vocab_curve`, `retrieval_fusion_rrf`,
# `text_langid_hash_ngram`, `text_langid_holdout_eval`,
# `text_perplexity_bucket`), then
# `_CHANGED_THIS_ROUND` (rewritten
# semantics/plans re-verify immediately), then ascending latest-green
# round, alphabetical within a tier — and ``tests/test_rotation.py``
# asserts literal == computation, so the round-7 failure mode (51 names
# hand-counted into a 50-slot window, silently starving
# `embed_quantize_int8`) can no longer happen.  This window retires ALL
# 42 remaining r8-green rows (the 4-round-stale tail the r12 verdict's
# #1 item named) plus the alphabetically-first r9 name; after this
# round's driver pass no registry entry is older than r9-green.
# Queries whose OUTPUT SEMANTICS or plan were rewritten this round —
# their last green driver row no longer certifies the current code, so
# rotation fronts them right after never-sampled additions (round-9
# self-review finding: the staleness-only ordering left the RFM
# rewrite and the cents migration without a same-round driver check).
# Reset this tuple to () when regenerating for a round with no
# semantic rewrites.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # round-13: the BPE train loop's persisted vocabulary frames are
    # now coalesced to BPE_VOCAB_PARTITIONS (vanilla-session stage-
    # width conditioning, r12 verdict "What's wrong #2"). Output
    # values unchanged, but the executed physical plan of every
    # consumer of _bpe_train is new, so their r12 green rows no
    # longer certify the current plans. (corpus_bpe_vocab_curve also
    # rides _bpe_train but is a round-13 addition — never sampled,
    # already tier 0.)
    "corpus_bpe_apply",
    "corpus_bpe_merge_loop",
)

_FRONT_GENERATED_FROM_ROUND = 12
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    "corpus_bpe_vocab_curve",  # never sampled
    "retrieval_fusion_rrf",  # never sampled
    "text_langid_hash_ngram",  # never sampled
    "text_langid_holdout_eval",  # never sampled
    "text_perplexity_bucket",  # never sampled
    "corpus_bpe_apply",  # REWRITTEN this round (last green r12)
    "corpus_bpe_merge_loop",  # REWRITTEN this round (last green r12)
    "agg_skew_salted",  # r8
    "ann_ivf_cosine",  # r8
    "cogroup_asof_enrich",  # r8
    "corpus_mix_rebalance",  # r8
    "decontaminate_ngram_overlap",  # r8
    "dedup_keep_latest",  # r8
    "docs_chunk_overlap",  # r8
    "embed_quantize_int8",  # r8
    "generate_patterns_spark",  # r8
    "generate_stream_dataframe",  # r8
    "generate_stream_exact",  # r8
    "generate_stream_sharded",  # r8
    "graph_pagerank",  # r8
    "join_full_outer",  # r8
    "multimodal_binaryfile_ingest",  # r8
    "multimodal_extract",  # r8
    "multimodal_frame_sample",  # r8
    "multimodal_resize",  # r8
    "pack_sequences_chunked",  # r8
    "pattern_recovery_scored",  # r8
    "pipeline_dedup_ordered",  # r8
    "sample_topn_per_stratum",  # r8
    "sample_weighted_hash",  # r8
    "scalar_datetime",  # r8
    "scalar_decimal",  # r8
    "scalar_math",  # r8
    "scalar_math_density",  # r8
    "scalar_string",  # r8
    "scalar_string_distance",  # r8
    "set_ops",  # r8
    "sort_limit_topk",  # r8
    "sql_tpch_q11",  # r8
    "sql_tpch_q13",  # r8
    "sql_tpch_q15",  # r8
    "sql_tpch_q16",  # r8
    "streaming_left_outer_join",  # r8
    "streaming_rate_replay",  # r8
    "streaming_session_window",  # r8
    "text_bigram_surprisal",  # r8
    "text_repetition_score",  # r8
    "udf_surface",  # r8
    "vocab_oov_rate",  # r8
    "agg_approx_quantiles",  # r9
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
