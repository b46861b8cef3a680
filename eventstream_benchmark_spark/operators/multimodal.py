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


QUERIES = {
    "multimodal_extract": multimodal_extract,
}

ORACLES: dict[str, str] = {}
