"""Graph analytics over fixture-derived graphs (Layer-B extensions).

The event-stream benchmark's consumers (SURVEY §2.2 motivation) feed
graph-shaped downstream analytics: co-occurrence graphs from baskets,
duplicate-cluster graphs from LSH pairs (``dedup_cluster_cc`` in
``dedup.py``), and structure metrics over them. This module carries
the basket lane: the co-purchase graph (parts appearing in the same
order) and triangle counting over its thresholded edge set.

Scale notes (100 TB):

- The basket self-join is an equi-join on ``l_orderkey`` with the
  ``p1 < p2`` orientation as residual predicate — per-order fanout is
  O(basket²) with basket size bounded (≤ tens), so the pair stream is
  linear in the fact table. No nested loop
  (``test_copurchase_stays_equi_join``).
- Triangle counting uses the edge-iterator scheme: edges join edges on
  the shared middle vertex, then a closing-edge semi check — two
  hash-partitioned equi-joins over the (much smaller) thresholded edge
  set. The ``p1 < p2`` orientation halves the edge list and makes each
  triangle count exactly once; at adversarial degree distributions the
  standard refinement is orientation by (degree, id) instead of id,
  which bounds per-vertex out-degree to O(sqrt(E)) — noted here, not
  needed for basket graphs whose degree is bounded by basket size ×
  order multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import load_table
from eventstream_benchmark_spark.operators._cache import (
    release_scoped_persists,
    scoped_persist,
)
from eventstream_benchmark_spark.operators._util import bigint

COPURCHASE_TOPK = 50
TRIANGLE_MIN_ORDERS = 2  # edge threshold: parts co-purchased ≥ twice


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Distinct (order, part) → same-order part pairs, oriented
    p1 < p2 so each unordered pair appears once, with its order
    multiplicity."""
    d = li.select("l_orderkey", "l_partkey").distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(bigint(F.count("*")).alias("n_orders"))
    )


def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs most often
    bought in the same order. The classic association-mining primitive
    (support counting) as one self-join + groupBy; the top-k is a
    TakeOrderedAndProject with a deterministic (n DESC, p1, p2)
    tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _copurchase_edges(li)
        .orderBy(F.desc("n_orders"), "p1", "p2")
        .limit(COPURCHASE_TOPK)
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the thresholded co-purchase graph (edges =
    part pairs co-bought in ≥ TRIANGLE_MIN_ORDERS orders): the global
    clustering signal over the basket graph. Edge-iterator scheme —
    wedges a<b<c from (a,b)⋈(b,c), closed by the (a,c) edge — so every
    triangle is counted exactly once."""
    release_scoped_persists()
    li = load_table(spark, sf_dir, "lineitem")
    # three consumers (wedge join ×2 sides, edge/vertex stats) — persist
    # the thresholded edge set once instead of re-running the basket
    # self-join per branch
    e = scoped_persist(
        _copurchase_edges(li)
        .filter(F.col("n_orders") >= TRIANGLE_MIN_ORDERS)
        .select("p1", "p2")
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    triangles = ab.join(bc, F.col("ab.p2") == F.col("bc.p1")).join(
        ac,
        (F.col("ac.p1") == F.col("ab.p1")) & (F.col("ac.p2") == F.col("bc.p2")),
    )
    verts = e.select(F.col("p1").alias("v")).union(e.select(F.col("p2").alias("v")))
    return (
        triangles.agg(bigint(F.count("*")).alias("n_triangles"))
        .crossJoin(e.agg(bigint(F.count("*")).alias("n_edges")))
        .crossJoin(verts.agg(bigint(F.countDistinct("v")).alias("n_vertices")))
    )


QUERIES = {
    "copurchase_part_pairs": copurchase_part_pairs,
    "graph_triangle_count": graph_triangle_count,
}

_EDGES_CTE = """
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
"""

ORACLES = {
    "copurchase_part_pairs": f"""
        WITH {_EDGES_CTE}
        SELECT p1, p2, n_orders FROM edges
        ORDER BY n_orders DESC, p1, p2 LIMIT {COPURCHASE_TOPK}
    """,
    "graph_triangle_count": f"""
        WITH {_EDGES_CTE},
        e AS (SELECT p1, p2 FROM edges WHERE n_orders >= {TRIANGLE_MIN_ORDERS})
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM e ab
             JOIN e bc ON ab.p2 = bc.p1
             JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2) AS n_triangles,
            (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
            (SELECT CAST(count(*) AS BIGINT) FROM
                (SELECT p1 AS v FROM e UNION SELECT p2 FROM e)) AS n_vertices
    """,
}
