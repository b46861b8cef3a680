"""Multimodal-column plumbing (north-star ops).

Treats media as opaque ``binary`` columns with typed metadata and runs
decode / feature-extraction as Arrow-batched ``mapInPandas`` — the
real 100 TB shape (schema, partitioning, batch iteration, UDF
signatures). The container has no image/audio libraries, so the
decode step is a clearly-marked deterministic stub
(``_decode_stub``); a real deployment swaps in PIL/ffmpeg inside the
same batch loop. Rows-only driver check; the checksum math is
asserted against a NumPy reference in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstream_benchmark_spark.io import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, checksum bigint, "
    "width int, height int, decoder string"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture stand-in for a media lake table: documents' text bytes
    as the opaque payload plus typed metadata columns."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        ((F.col("n_chars") * 3) % 480).cast("int").alias("height"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder: deterministic features from raw bytes.

    Real decode (PIL.Image.open / soundfile / pyav frame sampling) is
    not available in this container; this stub keeps the byte-level
    contract (length + rolling checksum) so the Spark plumbing is
    real and testable end-to-end.
    """
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    return {
        "byte_len": int(arr.size),
        "checksum": int((arr.astype(np.int64) * (np.arange(arr.size) % 31 + 1)).sum()),
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = pdf["payload"].map(_decode_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": feats.map(lambda f: f["byte_len"]),
                "checksum": feats.map(lambda f: f["checksum"]),
                "width": pdf["width"],
                "height": pdf["height"],
                "decoder": "stub-v1",
            }
        )


def multimodal_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads, then a
    per-media-type aggregate (so the driver check is small + stable)."""
    feats = media_table(spark, sf_dir).mapInPandas(_extract_batches, FEATURE_SCHEMA)
    return feats.groupBy("media_type", "decoder").agg(
        F.count("*").alias("n"),
        F.sum("byte_len").alias("total_bytes"),
        F.sum("checksum").alias("checksum_sum"),
    )


# --------------------------------------------------------------------------
# resize (image path)
# --------------------------------------------------------------------------

TARGET_W, TARGET_H = 64, 64


def _resize_stub(payload: bytes, w: int, h: int) -> tuple[bytes, int]:
    """STUB resize: nearest-neighbor downsample of the raw byte grid to
    TARGET_W*TARGET_H bytes (a real deployment decodes with PIL and
    resizes pixels inside this same batch loop). Deterministic; the
    output byte budget is fixed so downstream batch sizes are
    predictable — the property that matters for 100 TB planning."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    n_out = TARGET_W * TARGET_H
    if arr.size == 0:
        return b"\x00" * n_out, 0
    idx = (np.arange(n_out, dtype=np.int64) * arr.size) // n_out
    out = arr[idx]
    return out.tobytes(), int(out.astype(np.int64).sum())


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        resized = [_resize_stub(p, w, h) for p, w, h in
                   zip(pdf["payload"], pdf["width"], pdf["height"])]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_w": TARGET_W,
                "out_h": TARGET_H,
                "out_bytes": [len(r[0]) for r in resized],
                "pixel_sum": [r[1] for r in resized],
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-lane resize: filter to image rows (predicate pushes to the
    scan), Arrow-batched fixed-budget resize, per-partition-friendly
    row-level output summarized for the driver check."""
    images = media_table(spark, sf_dir).filter(F.col("media_type") == "image/png")
    out = images.mapInPandas(
        _resize_batches,
        "doc_id bigint, out_w int, out_h int, out_bytes bigint, pixel_sum bigint",
    )
    return out.agg(
        F.count("*").alias("n_images"),
        F.sum("out_bytes").alias("total_out_bytes"),
        F.sum("pixel_sum").alias("pixel_sum"),
    )


# --------------------------------------------------------------------------
# frame sampling (video path)
# --------------------------------------------------------------------------

FRAMES_PER_VIDEO = 4


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One row in → FRAMES_PER_VIDEO rows out (the row-explosion shape
    real frame sampling has; pyav frame decode replaces the byte-slice
    stub). Emits (doc_id, frame_idx, frame_bytes, frame_checksum)."""
    import numpy as np

    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            splits = np.array_split(arr, FRAMES_PER_VIDEO)
            for k, frame in enumerate(splits):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(k)
                rows["frame_bytes"].append(int(frame.size))
                rows["frame_checksum"].append(int(frame.astype(np.int64).sum()))
        yield pd.DataFrame(rows)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-lane frame sampling: one input row fans out to k frame
    rows inside mapInPandas (no shuffle — the fan-out happens within
    the partition), then a compact per-frame-index aggregate."""
    videos = media_table(spark, sf_dir).filter(F.col("media_type") == "video/mp4")
    frames = videos.mapInPandas(
        _frame_sample_batches,
        "doc_id bigint, frame_idx int, frame_bytes bigint, frame_checksum bigint",
    )
    return (
        frames.groupBy("frame_idx")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("frame_bytes").alias("total_bytes"),
            F.sum("frame_checksum").alias("checksum_sum"),
        )
        .orderBy("frame_idx")
    )


QUERIES = {
    "multimodal_extract": multimodal_extract,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES: dict[str, str] = {}
