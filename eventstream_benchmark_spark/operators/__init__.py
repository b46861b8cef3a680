"""Layer-B operator packs (SURVEY.md §2.2).

Each module exposes ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> DuckDB SQL]``; ``all_queries()`` /
``all_oracles()`` merge them for the driver contract in
``/root/repo/__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from eventstream_benchmark_spark.operators import (
        dedup,
        eventstream,
        funnel,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
    )
    from eventstream_benchmark_spark.generator import queries as gen_queries
    from eventstream_benchmark_spark.streaming import queries as streaming_queries

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, eventstream, funnel, dedup, similarity, text, multimodal, pipeline):
        merged.update(mod.QUERIES)
    merged.update(gen_queries.QUERIES)
    merged.update(streaming_queries.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    from eventstream_benchmark_spark.operators import (
        dedup,
        eventstream,
        funnel,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
    )
    from eventstream_benchmark_spark.generator import queries as gen_queries
    from eventstream_benchmark_spark.streaming import queries as streaming_queries

    merged: dict[str, str] = {}
    for mod in (relational, eventstream, funnel, dedup, similarity, text, multimodal, pipeline):
        merged.update(mod.ORACLES)
    merged.update(gen_queries.ORACLES)
    merged.update(streaming_queries.ORACLES)
    return merged
