"""Seeded randomized oracle sweeps for the embedding/similarity pack.

The driver fixtures' embeddings are well-conditioned gaussian-ish
vectors; this sweep generates random corpora that PLANT the geometric
degeneracies the lanes document but the fixtures rarely produce:

* EXACT duplicate vectors (cosine = 1.0 — the τ filters' upper
  boundary, and identical r6-rounded scores whose rankings fall to
  the vec_id tie-break);
* SCALED copies (2·v): cosine exactly 1.0 with a DIFFERENT norm —
  normalization bugs score these wrong, quantizers see them as
  distinct;
* NEGATED copies (−v): cosine exactly −1.0, opposite LSH sign bits;
* a ZERO vector: the null_safe_div cosine guard (ANSI Spark would
  raise, DuckDB yields NULL — both lanes must agree on
  NULL-undefined, NULLs-last, fails-every-τ);
* small perturbations and half-mixtures, so verified-pair cosines
  land around the SWEEP_TAUS calibration range instead of near 0.

All components live on the 1/16 dyadic grid: exactly representable
in float32, exact micro-int quantization (x·10⁶ is a whole multiple
of 62500 — no 0-dp boundary at all), and every sequential fold sees
identical doubles in both engines. The lanes whose arithmetic is
engine-accumulated (stddev in dim_stats) keep their documented
ulp-vs-boundary discipline; everything else is decision-free by
construction.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.sweep_util import sweep_check

DIM = 64

SWEPT = (
    "embed_cosine_topk",
    "knn_bruteforce_topk",
    "embed_dim_stats",
    "embed_centroid_drift",
    "embed_quantize_int8",
    "embed_binary_quantize",
    "embed_pq_encode",
    "embed_matryoshka_energy",
    "ann_lsh_cosine",
    "ann_lsh_query_topk",
    "ann_ivf_cosine",
    "dedup_embedding_cosine",
    "dedup_threshold_sweep",
    "dedup_semantic_cluster",
    "dedup_semantic_recall_eval",
    "decontaminate_semantic_embed",
)


def _vec(rng: random.Random) -> list[float]:
    return [rng.randint(-32, 32) / 16.0 for _ in range(DIM)]


def _build_embeddings(rng: random.Random) -> list[list[float]]:
    n_base = rng.randint(60, 100)
    vecs = [_vec(rng) for _ in range(n_base)]
    planted: list[list[float]] = []
    # one of each kind unconditionally, then random extras: seed 41's
    # random kinds were [1,2,1,2] — no exact duplicate and no
    # perturbation — so the coverage is pinned, not left to the roll
    kinds = [0, 1, 2, 3] + [rng.randrange(4) for _ in range(rng.randint(0, 4))]
    for kind in kinds:
        v = rng.choice(vecs)
        if kind == 0:
            planted.append(list(v))  # exact duplicate
        elif kind == 1:
            planted.append([2.0 * x for x in v])  # scaled: cos=1, norm x2
        elif kind == 2:
            planted.append([-x for x in v])  # negated: cos=-1
        else:
            w = list(v)  # small perturbation: cos near 1
            for _ in range(rng.randint(1, 6)):
                w[rng.randrange(DIM)] += rng.randint(-8, 8) / 16.0
            planted.append(w)
    # half-mixtures: cosine lands mid-range, near the SWEEP_TAUS band
    for _ in range(rng.randint(3, 6)):
        v, u = rng.choice(vecs), _vec(rng)
        planted.append([(a + b) / 2.0 for a, b in zip(v, u)])
    vecs.extend(planted)
    vecs.append([0.0] * DIM)  # zero vector: NULL-cosine guard
    # shuffle so planted shapes land on both vec_id parities and some
    # fall inside the first-16 IVF seed / first-10 query prefixes
    rng.shuffle(vecs)
    return vecs


@pytest.mark.parametrize("seed", [41, 6006])
def test_similarity_family_randomized_oracle_agreement(spark, tmp_path, seed):
    rng = random.Random(seed)
    vecs = _build_embeddings(rng)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(
                [rng.randint(0, 9) for _ in vecs], pa.int32()
            ),
        }
    )
    root = tmp_path / f"emb{seed}"
    root.mkdir()
    pq.write_table(tbl, str(root / "embeddings.parquet"))
    sweep_check(spark, str(root), SWEPT, ("embeddings",), seed)
