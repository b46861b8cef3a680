"""Round-7 hardening pins.

1. ``_sort_split_points`` must select the k values at EXACTLY the
   sorted positions ``ntile(SORT_RUNS)`` tile maxima occupy — the
   bucketed keyed-window spelling and the single-partition ntile
   spelling are interchangeable BY VALUE, which is what lets the
   DuckDB oracle keep its honest single-node ntile replay while the
   Spark plan carries no data-sized unkeyed window. Pinned over the
   adversarial shapes the closed-form position rule must survive:
   heavy ties (multiset positions, not row identity), n < RUNS (empty
   ntile tiles produce no split point), n == RUNS, a single row, an
   empty sample, all keys in one histogram bucket, and one key per
   bucket.
2. The family-shared persist registry: one build per (app, fixture)
   key, re-persist after an external clearCache, and full release at
   harness boundaries.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


_CASES = {
    "ties_heavy": [5] * 20 + [7] * 13 + [9],
    "n_lt_runs": [3, 1, 2],
    "n_eq_runs": list(range(8)),
    "single": [42],
    "empty": [],
    "random_997": [random.Random(7).randrange(0, 10**15) for _ in range(997)],
    "one_bucket": [1000 + i for i in range(100)],
    "one_per_bucket": [i * (1 << 33) for i in range(50)],
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_split_points_match_ntile_positions(spark, name):
    from eventstream_benchmark_spark.operators.relational import (
        SORT_RUNS,
        _sort_split_points,
    )

    ks = _CASES[name]
    df = (
        spark.createDataFrame([(int(x),) for x in ks], "k long")
        if ks
        else spark.createDataFrame([], "k long")
    )
    new = _sort_split_points(df).collect()[0]["bs"]
    old = (
        df.withColumn("t", F.ntile(SORT_RUNS).over(Window.orderBy("k")))
        .filter(F.col("t") < SORT_RUNS)
        .groupBy("t")
        .agg(F.max("k").alias("b"))
        .agg(F.sort_array(F.collect_list("b")).alias("bs"))
    ).collect()[0]["bs"]
    assert new == old


def test_shared_persist_lifecycle(spark, sf_small):
    from eventstream_benchmark_spark.operators._cache import (
        _SHARED,
        release_shared_persists,
        shared_persist,
    )

    builds = []
    key = ("test_family", spark.sparkContext.applicationId, "fixture")

    def builder():
        builds.append(1)
        return spark.range(10).withColumn("x", F.col("id") * 2)

    a = shared_persist(key, builder)
    b = shared_persist(key, builder)
    assert a is b and len(builds) == 1 and a.is_cached
    # an external clearCache must not leave a silently-unpersisted
    # entry in the registry: the next fetch re-persists (no rebuild)
    spark.catalog.clearCache()
    c = shared_persist(key, builder)
    assert c is a and len(builds) == 1 and c.is_cached
    release_shared_persists()
    assert key not in _SHARED and not a.is_cached


def _family_keys(prefix: str):
    from eventstream_benchmark_spark.operators._cache import _SHARED

    return [k for k in _SHARED if k[0] == prefix]


def test_dedup_family_shares_one_pair_build(spark, sf_small):
    """The three MinHash pair-set consumers must ride ONE family-shared
    build — and consuming the shared frame must change nothing about
    the result (cold rebuild == shared read)."""
    from eventstream_benchmark_spark.operators._cache import (
        release_shared_persists,
    )
    from eventstream_benchmark_spark.operators import all_queries

    qs = all_queries()
    release_shared_persists()
    cold = sorted(map(tuple, qs["dedup_cluster_cc"](spark, sf_small).collect()))
    # round 10: cluster CC consumes the REP-level building blocks, not
    # the member-expanded pair set — it registers exactly one build of
    # each block and none of the expansion
    assert len(_family_keys("minhash_rep_pairs")) == 1
    assert len(_family_keys("minhash_membership")) == 1
    assert len(_family_keys("minhash_pairs")) == 0
    # the expansion consumers must ride the SAME block builds and one
    # shared expansion — no second build of anything for the fixture
    qs["dedup_minhash_lsh"](spark, sf_small).count()
    qs["dedup_recall_eval"](spark, sf_small).count()
    assert len(_family_keys("minhash_pairs")) == 1
    assert len(_family_keys("minhash_rep_pairs")) == 1
    assert len(_family_keys("minhash_membership")) == 1
    shared = sorted(map(tuple, qs["dedup_cluster_cc"](spark, sf_small).collect()))
    assert shared == cold
    release_shared_persists()


def test_embedding_family_shares_ivf_and_pair_builds(spark, sf_small):
    """ann_ivf_cosine + both SemDeDup queries share one IVF model
    (centroids + inverted file); the SemDeDup victim set and the
    flat embedding-cosine pair set are each built once; and the eval
    composed from shared frames equals the eval composed cold."""
    from eventstream_benchmark_spark.operators._cache import (
        release_shared_persists,
    )
    from eventstream_benchmark_spark.operators import all_queries

    qs = all_queries()
    release_shared_persists()
    cold = qs["dedup_semantic_recall_eval"](spark, sf_small).collect()
    for fam in ("ivf_refined", "ivf_assigned", "semdedup_victims", "emb_cosine_pairs"):
        assert len(_family_keys(fam)) == 1, fam
    qs["ann_ivf_cosine"](spark, sf_small).count()
    qs["dedup_semantic_cluster"](spark, sf_small).count()
    qs["dedup_embedding_cosine"](spark, sf_small).count()
    for fam in ("ivf_refined", "ivf_assigned", "semdedup_victims", "emb_cosine_pairs"):
        assert len(_family_keys(fam)) == 1, fam
    shared = qs["dedup_semantic_recall_eval"](spark, sf_small).collect()
    assert shared == cold
    release_shared_persists()


def test_min_label_cc_deep_chain_converges(spark):
    """A 200-node path is the adversarial shape for fixed-round label
    propagation: a 5-round unrolling covers diameters only to ~62
    (d_r = 2·d_{r-1}+2 per min-hop + pointer-doubling round), so the
    far end of the chain would keep non-minimal labels. The
    loop-to-fixpoint spelling must label every node with the chain's
    minimum id — and multi-component graphs must keep components
    separate."""
    from eventstream_benchmark_spark.operators.dedup import _min_label_cc

    n = 200
    chain = [(i, i + 1) for i in range(n - 1)]
    # a second, disjoint component with a non-zero minimum
    island = [(1000, 1001), (1001, 1002)]
    pairs = spark.createDataFrame(chain + island, "d1 long, d2 long")
    labels = {r.doc_id: r.label for r in _min_label_cc(pairs).collect()}
    assert len(labels) == n + 3
    assert all(labels[i] == 0 for i in range(n))
    assert all(labels[i] == 1000 for i in (1000, 1001, 1002))


def test_checksum_mod_is_exact_past_int64(spark):
    """The export-manifest checksum spelling — decimal(38,0) sum +
    pmod(CHECKSUM_MOD) — must stay exact where a raw BIGINT sum does
    not survive: fp values near 2^62 summed over a handful of rows
    already exceed 2^63. Under this environment's Spark 4 default
    (ansi.enabled=true, verified here) the raw spelling RAISES
    ARITHMETIC_OVERFLOW — i.e. the query simply dies at 100 TB — and
    under ansi=false clusters it wraps silently; DuckDB raises at its
    HUGEINT→BIGINT cast. The 128-bit + explicit-modulus spelling is
    the only variant with a DEFINED value, identical in both engines.
    Pins that contract against a drive-by simplification back to
    sum(bigint)."""
    import duckdb

    from eventstream_benchmark_spark.operators.pipeline import CHECKSUM_MOD

    vals = [(1 << 62) - 3, (1 << 62) - 1, (1 << 61) + 7, 12345, (1 << 60)]
    expected = sum(vals) % CHECKSUM_MOD
    assert sum(vals) >= 1 << 63, "fixture must actually exceed int64"

    df = spark.createDataFrame([(v,) for v in vals], "fp long")
    got = df.agg(
        F.pmod(F.sum(F.col("fp").cast("decimal(38,0)")), F.lit(CHECKSUM_MOD))
        .cast("bigint")
        .alias("c")
    ).collect()[0]["c"]
    assert got == expected

    # the raw-bigint spelling demonstrably does NOT survive the same
    # input: ANSI Spark raises (the failure the decimal spelling
    # closes); a non-ANSI session would wrap to a value != the true sum
    try:
        wrapped = df.agg(F.sum("fp").alias("s")).collect()[0]["s"]
        assert wrapped != sum(vals), "int64 sum cannot hold this total"
    except Exception:
        pass  # ANSI overflow raise — the expected failure mode here

    # DuckDB twin: HUGEINT sum % MOD == the same exact value
    duck = duckdb.connect().execute(
        f"SELECT CAST(sum(CAST(v AS HUGEINT)) % {CHECKSUM_MOD} AS BIGINT) "
        f"FROM (SELECT unnest({vals!r}) AS v)"
    ).fetchone()[0]
    assert duck == expected


def test_zero_denominator_degrades_to_null_not_crash(spark):
    """ANSI alignment pins: this environment's Spark 4 default
    (ansi.enabled=true) raises DIVIDE_BY_ZERO on every division form
    while DuckDB yields NULL — so the shared guards must turn the
    degenerate-but-plausible zero denominators (zero-norm embedding
    vectors, constant series, one-sample groups) into NULL, matching
    the oracle, instead of crashing the job at scale."""
    import duckdb

    from eventstream_benchmark_spark.operators._util import (
        floor_micro,
        null_safe_div,
    )
    from eventstream_benchmark_spark.operators.similarity import _cos, _dot, _norm

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    # a zero vector alongside a real one: the pair cosine must be NULL
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, 2.0, 2.0])], "vec_id long, v array<double>"
    )
    a, b = df.alias("a"), df.alias("b")
    rows = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            _cos(
                _dot(F.col("a.v"), F.col("b.v")),
                _norm(F.col("a.v")),
                _norm(F.col("b.v")),
            ).alias("c")
        )
        .collect()
    )
    assert len(rows) == 1 and rows[0]["c"] is None

    # floor_micro: zero denominator -> NULL (DuckDB twin agrees)
    fm = spark.range(1).select(floor_micro(F.lit(5), F.lit(0)).alias("m")).collect()
    assert fm[0]["m"] is None
    duck = duckdb.connect().execute(
        "SELECT CAST(floor(1000000.0 * (CAST(5 AS DOUBLE) / CAST(0 AS DOUBLE)))"
        " AS BIGINT)"
    ).fetchone()[0]
    assert duck is None

    # null_safe_div leaves nonzero denominators bit-identical
    val = spark.range(1).select(
        (null_safe_div(F.lit(1.0), F.lit(3.0)) == F.lit(1.0) / F.lit(3.0)).alias("eq")
    ).collect()
    assert val[0]["eq"] is True
