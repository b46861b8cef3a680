"""Targeted invariants for the late round-5 operators, beyond the
oracle-parity sweep: the KMV merge theorem on adversarial synthetic
data, BFS layer semantics on a hand-built graph, and the Morton
interleave against a bit-twiddling reference."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_kmv_bottom_k_merge_theorem(spark):
    """Bottom-k of a union equals bottom-k of per-shard bottom-ks — on
    synthetic hash values crafted so every day's sketch OVERLAPS the
    global bottom region (the stress case for the merge path)."""
    from eventstream_benchmark_spark.operators.relational import KMV_K

    rows = [(d, v * 7919 % 100_003) for d in range(5) for v in range(400)]
    df = spark.createDataFrame(rows, "day int, h long").distinct()
    direct = [
        r.h
        for r in df.select("h")
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .collect()
    ]
    from pyspark.sql import Window as W

    w_day = W.partitionBy("day").orderBy("h")
    merged = (
        df.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") <= KMV_K)
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .collect()
    )
    assert [r.h for r in merged] == direct


def _write_lineitem(spark, tmp_path, baskets):
    """Materialize a synthetic lineitem fixture: baskets[i] = iterable
    of part keys sharing order i."""
    rows = [
        (int(o), int(p), 1.0, 0.0, 0.0, 1.0, "N", "O", "1995-01-01")
        for o, parts in enumerate(baskets)
        for p in parts
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double, l_discount double,"
        " l_tax double, l_extendedprice double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    return str(tmp_path)


def test_bfs_layers_on_path_graph(spark, tmp_path):
    """A 6-vertex path graph built from pairwise baskets: parts 0-1,
    1-2, ..., each co-bought twice (over the edge threshold). Highest
    degree belongs to interior vertices; seeds = the 3 top-degree
    (1, 2, 3 by the (deg desc, id) tiebreak), so hop layers are
    {1,2,3}=0, {0,4}=1, {5}=2."""
    from eventstream_benchmark_spark.operators.graph import graph_bfs_hops

    edges = [(i, i + 1) for i in range(5)]
    baskets = [e for e in edges for _ in range(2)]  # each edge twice
    sf_dir = _write_lineitem(spark, tmp_path, baskets)
    got = {
        r.hops: (r.n_nodes, r.sum_v)
        for r in graph_bfs_hops(spark, sf_dir).collect()
    }
    assert got == {0: (3, 6), 1: (2, 4), 2: (1, 5)}


def test_morton_interleave_matches_bit_reference(spark):
    """The div/mod Morton expression equals the classic bit-twiddling
    interleave for every (d1, d2) in an 8x8 corner plus edge cases."""
    from eventstream_benchmark_spark.operators.relational import _morton_sql

    def morton_ref(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    cases = [(x, y) for x in range(8) for y in range(8)]
    cases += [(255, 255), (255, 0), (0, 255), (170, 85)]
    df = spark.createDataFrame(cases, "d1 long, d2 long").withColumn(
        "z", F.expr(_morton_sql("div"))
    )
    for r in df.collect():
        assert r.z == morton_ref(r.d1, r.d2), (r.d1, r.d2)


def test_weighted_reservoir_monotone_in_weight(spark, sf_oracle):
    """Selection frequency must respond to weight: the sampled docs'
    mean weight should be >= the corpus mean weight (heavier docs hold
    more tickets). Deterministic given the fixture."""
    from eventstream_benchmark_spark.operators.text import (
        RESERVOIR_MAX_W,
        RESERVOIR_W_DIV,
        sample_weighted_reservoir,
    )
    from eventstream_benchmark_spark.io import load_table

    sample = sample_weighted_reservoir(spark, sf_oracle)
    mean_sample_w = sample.agg(F.avg("weight")).first()[0]
    docs = load_table(spark, sf_oracle, "documents")
    w = F.least(
        F.lit(RESERVOIR_MAX_W),
        F.lit(1) + (F.col("n_chars") / F.lit(RESERVOIR_W_DIV)).cast("long"),
    )
    mean_corpus_w = docs.select(w.alias("w")).agg(F.avg("w")).first()[0]
    assert mean_sample_w >= mean_corpus_w
