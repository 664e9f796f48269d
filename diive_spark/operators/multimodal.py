"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partition-friendly batch shapes, Arrow
mapInPandas kernels) is real and tested, and the codec seam now decodes the
dominant interchange formats with STDLIB-ONLY codecs (functions/codecs.py):
sequential AND progressive JPEG (T.81 Huffman + DCT, spectral selection +
successive approximation), PNG via zlib inflate + spec unfilter, WAV via
struct RIFF/PCM parsing, FLAC. A deterministic fake format remains for
plumbing-only tests; the remaining exotic formats (arithmetic-coded JPEG,
WebP, MP3/Vorbis/Opus PCM, ...) still raise DecodeUnavailable until a
codec library is installed — swapping one in changes ONE function
(_decode_image_bytes / _decode_audio_bytes) and nothing else.

Design notes for 100 TB:
- media blobs stay in their own column; metadata columns (width/height/
  duration/codec) are extracted once at ingest so downstream filters prune
  without touching blobs (parquet column pruning does the heavy lifting).
- kernels are mapInPandas over Arrow batches: ~10 MB of blobs per batch
  (spark.sql.execution.arrow.maxRecordsPerBatch tuned by blob size), one
  Python worker per core. The ONLY per-row Python is the codec call itself —
  inherent, since codecs decode one variable-shaped blob at a time; every
  arithmetic step after decode is numpy, and the per-row cost is amortized
  by the decode work (ms per image vs ns of loop overhead).
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


def synth_media_table(spark, n_rows: int = 64, fmt: str = "fake-gray") -> DataFrame:
    """Deterministic synthetic media. ``fmt='fake-gray'`` emits raw seeded
    bytes (plumbing-only); ``fmt='png'`` emits REAL PNG-encoded blobs
    (grayscale, via the stdlib codec) so the decode path itself is
    exercised."""
    rows = []
    for i in range(n_rows):
        rng = np.random.default_rng(zlib.crc32(f"img-{i}".encode()) ^ 42)
        w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if fmt == "png":
            from diive_spark.functions.codecs import encode_png
            rows.append((f"img-{i:06d}", bytearray(encode_png(px)),
                         "image/png", w, h, 1))
        elif fmt == "jpeg":
            from diive_spark.functions.codecs import encode_jpeg
            rows.append((f"img-{i:06d}",
                         bytearray(encode_jpeg(px, quality=92)),
                         "image/jpeg", w, h, 1))
        else:
            rows.append((f"img-{i:06d}", bytearray(px.tobytes()),
                         "image/fake-gray", w, h, 1))
    return spark.createDataFrame(rows, schema=IMAGE_SCHEMA)


def _decode_image_bytes(blob: bytes, media_type: str, width: int, height: int) -> np.ndarray:
    """Codec seam. JPEG (sequential AND progressive, T.81 Huffman + DCT)
    and PNG decode via the stdlib-only codecs (functions/codecs.py); the
    deterministic fake format decodes to a (h, w) uint8 array; anything
    else (arithmetic-coded JPEG, webp, ...) raises until a codec library
    is installed. Multichannel images are collapsed to grayscale (channel
    mean) so every feature path sees (h, w)."""
    if media_type == "image/fake-gray":
        return np.frombuffer(blob, dtype=np.uint8)[: width * height].reshape(height, width)
    if media_type == "image/png" or bytes(blob[:8]) == b"\x89PNG\r\n\x1a\n":
        from diive_spark.functions.codecs import decode_png
        img = decode_png(bytes(blob))
        return img if img.ndim == 2 else img.mean(axis=2).astype(np.uint8)
    if media_type in ("image/jpeg", "image/jpg") \
            or bytes(blob[:2]) == b"\xff\xd8":
        from diive_spark.functions.codecs import CodecError, decode_jpeg
        try:
            img = decode_jpeg(bytes(blob))
        except CodecError as exc:
            if "non-baseline" in str(exc):
                raise DecodeUnavailable(
                    f"JPEG frame unsupported by the stdlib baseline codec: "
                    f"{exc}") from exc
            raise
        return img if img.ndim == 2 else img.mean(axis=2).astype(np.uint8)
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


AUDIO_SCHEMA = (
    "doc_id string, media binary, media_type string, sample_rate int, n_samples int"
)
AUDIO_FEATURE_SCHEMA = (
    "doc_id string, sample_rate int, n_samples int, duration_sec double, "
    "rms double, zero_cross_rate double, peak double"
)


def synth_audio_table(spark, n_rows: int = 64, fmt: str = "fake-pcm16") -> DataFrame:
    """Deterministic synthetic audio: seeded 16-bit PCM mono, either as raw
    sample bytes (``fmt='fake-pcm16'``) or wrapped as REAL RIFF/WAV files
    (``fmt='wav'``, via the stdlib codec)."""
    rows = []
    for i in range(n_rows):
        rng = np.random.default_rng(zlib.crc32(f"aud-{i}".encode()) ^ 7)
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(sr // 4, sr))  # 0.25-1 s
        t = np.arange(n, dtype=np.float64)
        f0 = float(rng.uniform(100, 1000))
        wave = (3000 * np.sin(2 * np.pi * f0 * t / sr)
                + rng.normal(0, 200, n)).astype(np.int16)
        if fmt == "wav":
            from diive_spark.functions.codecs import encode_wav
            rows.append((f"aud-{i:06d}", bytearray(encode_wav(wave, sr)),
                         "audio/wav", sr, n))
        elif fmt == "flac":
            from diive_spark.functions.codecs import encode_flac
            rows.append((f"aud-{i:06d}",
                         bytearray(encode_flac(
                             wave.astype(np.int64), sr, use_lpc=True)),
                         "audio/flac", sr, n))
        else:
            rows.append((f"aud-{i:06d}", bytearray(wave.tobytes()),
                         "audio/fake-pcm16", sr, n))
    return spark.createDataFrame(rows, schema=AUDIO_SCHEMA)


def _decode_audio_bytes(blob: bytes, media_type: str) -> np.ndarray:
    """Audio codec seam: WAV (RIFF/PCM) and FLAC (the dominant lossless
    speech-corpus format — LibriSpeech/MLS ship as FLAC) decode via the
    stdlib-only codecs in functions/codecs.py (multichannel averaged to
    mono); fake PCM decodes with frombuffer. MP3 et al: the full frame
    structure (headers, durations, bitrates, VBR tags) parses via
    codecs.parse_mpeg_audio / extract_audio_metadata — the path curation
    filters actually need — but PCM decode still raises. The blocker is
    verifiability, not effort: Layer III needs the 512-entry synthesis
    window and 34 Annex-B Huffman tables, which are lookup data (not
    derivable), and with no real MP3 fixture reachable here a
    self-round-trip test cannot distinguish correct tables from
    mistranscribed ones (an encoder/decoder pair sharing the error still
    round-trips) — so shipping them would be a silently-wrong codec.
    Install a codec library (or add a verified fixture) and extend this
    seam."""
    if media_type == "audio/fake-pcm16":
        return np.frombuffer(blob, dtype=np.int16).astype(np.float64)
    if media_type in ("audio/wav", "audio/x-wav") or bytes(blob[:4]) == b"RIFF":
        from diive_spark.functions.codecs import decode_wav
        x, _rate = decode_wav(bytes(blob))
        return x if x.ndim == 1 else x.mean(axis=1)
    if media_type in ("audio/flac", "audio/x-flac") \
            or bytes(blob[:4]) == b"fLaC":
        from diive_spark.functions.codecs import decode_flac
        x, _rate = decode_flac(bytes(blob))
        return x if x.ndim == 1 else x.mean(axis=1)
    raise DecodeUnavailable(
        f"no decoder for {media_type!r} in this environment; "
        "install a codec and extend _decode_audio_bytes"
    )


AUDIO_METADATA_SCHEMA = (
    "doc_id string, container string, sample_rate int, channels int, "
    "n_samples bigint, duration_sec double, bitrate_kbps double, "
    "n_frames bigint, is_vbr boolean"
)


def extract_audio_metadata(df: DataFrame) -> DataFrame:
    """Container metadata WITHOUT PCM decode (codecs.parse_audio_metadata):
    WAV fmt/data chunks, FLAC STREAMINFO, and the full MPEG audio (MP3)
    frame walk — version/layer/bitrate tables, Xing/Info/VBRI VBR headers,
    ID3 skip. This is the operator a crawled-audio curation pass actually
    runs at 100 TB: duration/bitrate/channel/VBR gates filter the corpus
    before any sample is decoded, so the kernel's cost is header bytes,
    not media bytes. (MP3 PCM decode itself stays behind DecodeUnavailable
    — see _decode_audio_bytes — but every MP3 passes through THIS operator
    fine.) Same Arrow-batched mapInPandas shape as the feature kernels."""
    from diive_spark.functions.codecs import parse_audio_metadata

    from diive_spark.functions.codecs import CodecError

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                try:
                    m = parse_audio_metadata(bytes(blob))
                except CodecError:
                    # crawled audio is routinely truncated or glued — a
                    # single garbage blob must not fail the whole stage
                    # (r8 ADVICE fix). container=NULL marks the row so a
                    # downstream filter drops it.
                    rows.append((doc_id, None, None, None, None,
                                 None, None, None, None))
                    continue
                rows.append((doc_id, m["container"], m["sample_rate"],
                             m["channels"], m["n_samples"],
                             m["duration_sec"], m["bitrate_kbps"],
                             m["n_frames"], bool(m["is_vbr"])))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "container", "sample_rate", "channels",
                "n_samples", "duration_sec", "bitrate_kbps", "n_frames",
                "is_vbr"])

    return df.select("doc_id", "media").mapInPandas(
        kernel, schema=AUDIO_METADATA_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Decode -> per-clip features (duration, RMS, zero-crossing rate, peak).
    Same batch shape as the image kernel; per-row step = the codec call."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, zcr, peak, dur = [], [], [], []
            for blob, mt, sr in zip(pdf["media"], pdf["media_type"], pdf["sample_rate"]):
                x = _decode_audio_bytes(bytes(blob), mt)
                n = len(x)
                dur.append(n / float(sr))
                rms.append(float(np.sqrt(np.mean(x * x))) if n else 0.0)
                zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0)
                peak.append(float(np.abs(x).max()) if n else 0.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "sample_rate": pdf["sample_rate"],
                "n_samples": pdf["n_samples"], "duration_sec": dur,
                "rms": rms, "zero_cross_rate": zcr, "peak": peak,
            })

    return df.mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)
