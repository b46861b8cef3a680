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
# (~50 of 85 per round), so registry order decides which queries earn a
# CORRECTNESS row this round.  Round-3 rotation: queries CHANGED this
# round go first (their fixes must re-land inside the window), then the
# 35 entries whose only driver row is from round 1 (re-checked so every
# entry has a row no older than one round), then fresh re-checks of the
# north-star lane; the entries green in CORRECTNESS_r02.json close the
# list.
_FRONT_OF_REGISTRY: tuple[str, ...] = (
    # changed this round — must land in the window
    "agg_stats_moments",       # r01+r02 hash fail -> fixed-decimal strings
    "generate_patterns_spark",  # r02 driver ERR -> scalar rows
    "dedup_embedding_cosine",  # all-pairs BNLJ -> LSH-bucketed candidates
    "funnel_conversion",       # driver-side loop -> one composed plan
    "ann_ivf_cosine",          # bare persist -> scoped
    "generate_stream_exact",   # rows-only -> precomputed-constant oracle
    "streaming_rate_replay",   # new: rate-micro-batch paced replay
    "dedup_cluster_cc",        # new: connected-components dup clusters
    "pack_sequences_chunked",  # new: concat-and-chunk sequence packing
    "text_bigram_surprisal",   # new: bigram-LM perplexity-filter scoring
    "sample_topn_per_stratum",  # new: fixed-n per-stratum sampling
    "join_runtime_filtered",   # new: runtime bloom-filter join probe
    "streaming_foreach_batch_sink",  # new: foreachBatch custom sink
    "decontaminate_ngram_overlap",  # new: train/eval n-gram leak check
    "sql_tpch_q4",             # new: EXISTS -> left-semi shape
    "sql_tpch_q12",            # new: conditional-sum join shape
    "sql_tpch_q14",            # new: promo revenue ratio shape
    "scan_orc_roundtrip",      # new: ORC source/sink surface
    "write_partitioned_pruned",  # new: hive-partitioned write + pruning
    "streaming_session_window",  # new: incremental session merge
    "text_repetition_score",   # new: Gopher-style repetition filter
    "vocab_oov_rate",          # new: top-K vocab coverage
    "embed_quantize_int8",     # new: int8 quantization + error report
    "stream_anomaly_mad",      # new: robust MAD outlier detection
    "scd2_user_state",         # new: SCD-2 intervals from the event log
    "rollup_hourly_daily",     # new: continuous-aggregate re-rollup
    "streaming_left_outer_join",  # new: outer-emission state eviction
    "time_weighted_avg",       # new: TWAP per type
    "events_gap_fill_locf",    # new: hour spine + LOCF gap fill
    "join_skew_salted",        # new: manual skew-neutralized join
    "sample_weighted_hash",    # new: deterministic weighted sampling
    "udf_surface",             # rows-only -> hash-checked oracle
    "sql_tpch_q6",             # new: pure scan-filter-agg shape
    "sql_tpch_q10",            # new: returned-item top-20 shape
    "sql_tpch_q18",            # new: agg-driven semi-join shape
    "sql_tpch_q19",            # new: disjunctive-predicate join shape
    "attribution_linear",      # new: multi-touch bucketed range join
    "copurchase_part_pairs",   # new: market-basket support counting
    "graph_triangle_count",    # new: edge-iterator triangle counting
    "pattern_recovery_scored",  # new: generate -> match -> score vs labels
    # only driver row is from round 1 (35) — re-check
    "scan_parquet_project_filter",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "predicate_combo",
    "join_inner_equi",
    "join_left_outer",
    "join_semi_anti",
    "join_bucketed_colocated",
    "agg_hash_global",
    "agg_distinct",
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
    "scalar_map",
    "scalar_conditional",
    "stream_sliding_rate",
    "stream_sessionize",
    "stream_type_drift",
    # north-star re-checks filling the ~50-entry window (the rest of
    # the r02-green pack cycles back next round)
    "dedup_minhash_lsh",
    "pattern_match_fixed",
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
