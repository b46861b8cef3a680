"""Targeted checks for approximate / stubbed north-star operators that
the DuckDB oracle can't hash-verify: ANN recall floors and multimodal
byte-plumbing equivalence against plain NumPy."""

from __future__ import annotations

import numpy as np
import pandas as pd

from eventstream_benchmark_spark.operators.multimodal import (
    FRAMES_PER_VIDEO,
    TARGET_H,
    TARGET_W,
    media_table,
    multimodal_frame_sample,
    multimodal_resize,
)
from eventstream_benchmark_spark.operators.similarity import (
    KNN_K,
    ann_ivf_cosine,
    knn_bruteforce_topk,
)


def test_ivf_recall_vs_bruteforce(spark, sf_small):
    exact = knn_bruteforce_topk(spark, sf_small).toPandas()
    approx = ann_ivf_cosine(spark, sf_small).toPandas()
    exact_sets = exact.groupby("q_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("q_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / KNN_K for q in exact_sets.index
    ]
    # probing 4/16 clusters after one Lloyd step: expect to recover most
    # true neighbors on the fixture corpus
    assert np.mean(recalls) >= 0.5, f"mean IVF recall {np.mean(recalls):.2f}"
    # and the approx result respects its own contract
    assert (approx["rk"] <= KNN_K).all()


def test_resize_budget_and_checksum(spark, sf_small):
    out = multimodal_resize(spark, sf_small).toPandas()
    imgs = media_table(spark, sf_small).filter("media_type = 'image/png'")
    rows = imgs.select("payload").toPandas()
    assert int(out["n_images"].iloc[0]) == len(rows)
    # fixed output budget: every image resized to exactly W*H bytes
    assert int(out["total_out_bytes"].iloc[0]) == len(rows) * TARGET_W * TARGET_H
    # checksum equivalence vs plain NumPy on the same payloads
    want = 0
    for payload in rows["payload"]:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n_out = TARGET_W * TARGET_H
        idx = (np.arange(n_out, dtype=np.int64) * arr.size) // n_out
        want += int(arr[idx].astype(np.int64).sum())
    assert int(out["pixel_sum"].iloc[0]) == want


def test_frame_sample_fanout(spark, sf_small):
    out = multimodal_frame_sample(spark, sf_small).toPandas()
    vids = media_table(spark, sf_small).filter("media_type = 'video/mp4'")
    n_vids = vids.count()
    assert list(out["frame_idx"]) == list(range(FRAMES_PER_VIDEO))
    assert (out["n_frames"] == n_vids).all()
    # frames partition the payload bytes exactly: sum of frame checksums
    # per video == full-payload byte sum
    pdf = vids.select("payload").toPandas()
    want = sum(int(np.frombuffer(p, dtype=np.uint8).astype(np.int64).sum()) for p in pdf["payload"])
    assert int(out["checksum_sum"].sum()) == want


def test_scoped_persists_bounded_and_released(spark, sf_small):
    """The _cache.py contract, end to end: during a sweep at most one
    query's intermediates occupy executor storage (each persisting query
    releases its predecessor's at entry), and the harness-side release
    leaves nothing behind."""
    from eventstream_benchmark_spark.operators import _cache, all_queries

    qs = all_queries()
    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_ivf_cosine",
    ):
        df = qs[name](spark, sf_small)
        df.count()
        # minhash persists shingles + base hashes + signatures;
        # everything else one table
        assert len(_cache._LIVE) <= 3, name
    _cache.release_scoped_persists()
    assert not _cache._LIVE
