"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partition-friendly batch shapes, Arrow
mapInPandas kernels) is real and tested; the codec step is stubbed behind
DecodeUnavailable / a deterministic fake because no image/audio libraries
exist in this container. Swapping in a real decoder changes ONE function
(_decode_image_bytes) and nothing else.

Design notes for 100 TB:
- media blobs stay in their own column; metadata columns (width/height/
  duration/codec) are extracted once at ingest so downstream filters prune
  without touching blobs (parquet column pruning does the heavy lifting).
- kernels are mapInPandas over Arrow batches: ~10 MB of blobs per batch
  (spark.sql.execution.arrow.maxRecordsPerBatch tuned by blob size), one
  Python worker per core, no per-row Python.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "doc_id string, media binary, media_type string, width int, height int, n_frames int"
)
FEATURE_SCHEMA = "doc_id string, width int, height int, mean_px double, feat array<float>"


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-codec path: no image/audio libs in this container."""


def synth_media_table(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic fake media: blob = seeded bytes; metadata encodes the
    fake 'image' dims so the plumbing has real values to carry."""
    rows = []
    for i in range(n_rows):
        rng = np.random.default_rng(zlib.crc32(f"img-{i}".encode()) ^ 42)
        w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
        blob = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        rows.append((f"img-{i:06d}", bytearray(blob), "image/fake-gray", w, h, 1))
    return spark.createDataFrame(rows, schema=IMAGE_SCHEMA)


def _decode_image_bytes(blob: bytes, media_type: str, width: int, height: int) -> np.ndarray:
    """Codec seam. Real formats raise until a decoder library is installed;
    the deterministic fake format decodes to a (h, w) uint8 array."""
    if media_type == "image/fake-gray":
        return np.frombuffer(blob, dtype=np.uint8)[: width * height].reshape(height, width)
    raise DecodeUnavailable(
        f"no decoder for {media_type!r} in this environment; "
        "install a codec and extend _decode_image_bytes"
    )


def extract_image_features(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode -> resize(feat_dim x 1 row-mean pyramid) -> feature vector.
    mapInPandas kernel: whole Arrow batch per call, numpy throughout."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, means = [], []
            for blob, mt, w, h in zip(pdf["media"], pdf["media_type"], pdf["width"], pdf["height"]):
                img = _decode_image_bytes(bytes(blob), mt, int(w), int(h))
                means.append(float(img.mean()))
                # crude 'resize': split rows into feat_dim horizontal bands,
                # take each band's mean — deterministic, library-free
                bands = np.array_split(img.astype(np.float32), feat_dim, axis=0)
                feats.append(np.array([b.mean() for b in bands], dtype=np.float32))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "width": pdf["width"], "height": pdf["height"],
                "mean_px": means, "feat": feats,
            })

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame-sampling plumbing: one row per kept frame index. For the
    fake format n_frames==1; the explode shape is what a real decoder feeds."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1)
    kept = F.filter(idx, lambda i: i % every_n == 0)
    return df.select(
        "doc_id", "media_type", F.explode(kept).alias("frame_idx"), "width", "height"
    )
