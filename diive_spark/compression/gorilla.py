"""Gorilla compression for rolled-up points: XOR float encoding +
delta-of-delta timestamp encoding, packed per (series, time-block) into
binary columns via vectorized Arrow grouped maps.

Scheme (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015 — public paper):

Timestamps (int64 seconds):
    header: ts[0] as 64 raw bits, then delta[0] as 64 raw bits;
    each subsequent delta-of-delta D:
        D == 0                  -> '0'
        -63   <= D <= 64        -> '10'   + 7-bit  (D + 63)
        -255  <= D <= 256       -> '110'  + 9-bit  (D + 255)
        -2047 <= D <= 2048      -> '1110' + 12-bit (D + 2047)
        else                    -> '1111' + 64-bit two's-complement D

Values (float64):
    header: v[0] raw 64 bits; each subsequent XOR with previous:
        xor == 0 -> '0'
        else     -> '1' + 6-bit leading-zero count + 6-bit (siglen-1)
                        + siglen significant bits
    (Simplification vs the paper: the '10' previous-window-reuse case is
    dropped — every nonzero XOR writes its own window. Compression is
    slightly lower; the format stays self-describing and exact.)

The encoder is fully vectorized numpy (bit-matrix + boolean-mask packing, no
per-point Python); the decoder walks bits sequentially (verification /
read-back path — at scale, reads go through the rollup tables, blobs are the
archival tier). Round-trip identity is tested per block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# bit packing primitives (vectorized)
# ---------------------------------------------------------------------------


def _pack_fields(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack variable-width bit fields (big-endian within each field) into
    bytes. values: uint64 array; nbits: int array (0..64), rows with 0 bits
    contribute nothing."""
    values = values.astype(np.uint64, copy=True)
    nbits = nbits.astype(np.int64)
    values[nbits == 0] = 0
    shift = ((64 - nbits) % 64).astype(np.uint64)
    shifted = values << shift
    bitmat = np.unpackbits(shifted.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    mask = np.arange(64)[None, :] < nbits[:, None]
    bitstream = bitmat[mask]  # row-major: fields concatenated in order
    return np.packbits(bitstream).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, blob: bytes):
        self.bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        for b in self.bits[self.pos:self.pos + n]:
            out = (out << 1) | int(b)
        self.pos += n
        return out


# ---------------------------------------------------------------------------
# timestamps: delta-of-delta
# ---------------------------------------------------------------------------

_TS_RANGES = [(64, 7, 0b10, 2), (256, 9, 0b110, 3), (2048, 12, 0b1110, 4)]


def encode_timestamps(ts: np.ndarray) -> bytes:
    ts = ts.astype(np.int64)
    n = len(ts)
    header_vals = [np.uint64(n)]
    header_bits = [64]
    if n == 0:
        return _pack_fields(np.array(header_vals, dtype=np.uint64), np.array(header_bits))
    header_vals.append(np.uint64(ts[0]))
    header_bits.append(64)
    if n == 1:
        return _pack_fields(np.array(header_vals, dtype=np.uint64), np.array(header_bits))
    deltas = np.diff(ts)
    header_vals.append(deltas[0].astype(np.uint64))
    header_bits.append(64)
    dod = np.diff(deltas)

    m = len(dod)
    ctrl = np.zeros(m, dtype=np.uint64)
    ctrl_bits = np.zeros(m, dtype=np.int64)
    payload = np.zeros(m, dtype=np.uint64)
    payload_bits = np.zeros(m, dtype=np.int64)

    done = dod == 0
    ctrl_bits[done] = 1  # ctrl 0, 1 bit
    for bound, pbits, prefix, plen in _TS_RANGES:
        sel = (~done) & (dod > -bound) & (dod <= bound)
        ctrl[sel] = prefix
        ctrl_bits[sel] = plen
        payload[sel] = (dod[sel] + bound - 1).astype(np.uint64)
        payload_bits[sel] = pbits
        done |= sel
    rest = ~done
    ctrl[rest] = 0b1111
    ctrl_bits[rest] = 4
    payload[rest] = dod[rest].astype(np.uint64)  # two's complement
    payload_bits[rest] = 64

    vals = np.concatenate([np.array(header_vals, dtype=np.uint64),
                           np.column_stack([ctrl, payload]).reshape(-1)])
    bits = np.concatenate([np.array(header_bits, dtype=np.int64),
                           np.column_stack([ctrl_bits, payload_bits]).reshape(-1)])
    return _pack_fields(vals, bits)


def _to_i64(raw: int) -> int:
    return raw - (1 << 64) if raw >= (1 << 63) else raw


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(64)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = _to_i64(r.read(64))
    out = [first]
    if n == 1:
        return np.array(out, dtype=np.int64)
    delta = _to_i64(r.read(64))
    out.append(first + delta)
    for _ in range(n - 2):
        if r.read(1) == 0:
            dod = 0
        else:
            matched = False
            for bound, pbits, _prefix, _plen in _TS_RANGES:
                if r.read(1) == 0:
                    dod = r.read(pbits) - bound + 1
                    matched = True
                    break
            if not matched:
                dod = _to_i64(r.read(64))
        delta = delta + dod
        out.append(out[-1] + delta)
    return np.array(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# values: XOR
# ---------------------------------------------------------------------------

def encode_values(vals: np.ndarray) -> bytes:
    v = np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64)
    n = len(v)
    head_v = [np.uint64(n)]
    head_b = [64]
    if n == 0:
        return _pack_fields(np.array(head_v, dtype=np.uint64), np.array(head_b))
    head_v.append(v[0])
    head_b.append(64)
    if n == 1:
        return _pack_fields(np.array(head_v, dtype=np.uint64), np.array(head_b))

    xor = v[1:] ^ v[:-1]
    m = len(xor)
    bitmat = np.unpackbits(xor.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    nonzero = xor != 0
    lz = np.where(nonzero, bitmat.argmax(axis=1), 0).astype(np.int64)
    tz = np.where(nonzero, bitmat[:, ::-1].argmax(axis=1), 0).astype(np.int64)
    lz = np.minimum(lz, 63)
    slen = np.where(nonzero, 64 - lz - tz, 0).astype(np.int64)
    sig = np.where(nonzero, xor >> tz.astype(np.uint64), np.uint64(0))

    # field 1: control+lz+slen -> '1' + 6 + 6 = 13 bits (or single '0' bit)
    f1 = np.where(
        nonzero,
        (np.uint64(1) << np.uint64(12)) | (lz.astype(np.uint64) << np.uint64(6)) | (slen - 1).clip(0).astype(np.uint64),
        np.uint64(0),
    )
    f1_bits = np.where(nonzero, 13, 1)
    f2 = sig
    f2_bits = np.where(nonzero, slen, 0)

    vals_arr = np.concatenate([np.array(head_v, dtype=np.uint64),
                               np.column_stack([f1, f2]).reshape(-1)])
    bits_arr = np.concatenate([np.array(head_b, dtype=np.int64),
                               np.column_stack([f1_bits, f2_bits]).reshape(-1)])
    return _pack_fields(vals_arr, bits_arr)


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(64)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    cur = np.uint64(r.read(64))
    out = [cur]
    for _ in range(n - 1):
        if r.read(1) == 0:
            out.append(out[-1])
        else:
            lz = r.read(6)
            slen = r.read(6) + 1
            sig = r.read(slen)
            tz = 64 - lz - slen
            xor = np.uint64(sig) << np.uint64(tz)
            out.append(out[-1] ^ xor)
    return np.array(out, dtype=np.uint64).view(np.float64)


def encode_values32(vals: np.ndarray) -> bytes:
    """float32 XOR variant: same Gorilla scheme over 32-bit words — control
    '1' + 5-bit leading-zeros + 5-bit significant-length (11 bits vs the
    64-bit mode's 13) and half-width payloads. For float32-born data
    (metrics, embedding stats) this roughly halves the value stream at zero
    decode cost; values are cast to float32 first, so the round trip is
    bit-exact on the FLOAT32 values (lossy only vs a wider source)."""
    v = np.ascontiguousarray(vals, dtype=np.float32).view(np.uint32)
    n = len(v)
    head_v = [np.uint64(n)]
    head_b = [64]
    if n == 0:
        return _pack_fields(np.array(head_v, dtype=np.uint64), np.array(head_b))
    head_v.append(np.uint64(v[0]))
    head_b.append(32)
    if n == 1:
        return _pack_fields(np.array(head_v, dtype=np.uint64), np.array(head_b))

    xor = v[1:] ^ v[:-1]
    bitmat = np.unpackbits(xor.astype(">u4").view(np.uint8).reshape(-1, 4), axis=1)
    nonzero = xor != 0
    lz = np.where(nonzero, bitmat.argmax(axis=1), 0).astype(np.int64)
    tz = np.where(nonzero, bitmat[:, ::-1].argmax(axis=1), 0).astype(np.int64)
    lz = np.minimum(lz, 31)
    slen = np.where(nonzero, 32 - lz - tz, 0).astype(np.int64)
    sig = np.where(nonzero, xor >> tz.astype(np.uint32), np.uint32(0))

    f1 = np.where(
        nonzero,
        (np.uint64(1) << np.uint64(10))
        | (lz.astype(np.uint64) << np.uint64(5))
        | (slen - 1).clip(0).astype(np.uint64),
        np.uint64(0),
    )
    f1_bits = np.where(nonzero, 11, 1)
    f2 = sig.astype(np.uint64)
    f2_bits = np.where(nonzero, slen, 0)

    vals_arr = np.concatenate([np.array(head_v, dtype=np.uint64),
                               np.column_stack([f1, f2]).reshape(-1)])
    bits_arr = np.concatenate([np.array(head_b, dtype=np.int64),
                               np.column_stack([f1_bits, f2_bits]).reshape(-1)])
    return _pack_fields(vals_arr, bits_arr)


def decode_values32(blob: bytes) -> np.ndarray:
    """Inverse of encode_values32; returns float32."""
    r = _BitReader(blob)
    n = r.read(64)
    if n == 0:
        return np.empty(0, dtype=np.float32)
    cur = np.uint32(r.read(32))
    out = [cur]
    for _ in range(n - 1):
        if r.read(1) == 0:
            out.append(out[-1])
        else:
            lz = r.read(5)
            slen = r.read(5) + 1
            sig = r.read(slen)
            tz = 32 - lz - slen
            xor = np.uint32(sig) << np.uint32(tz)
            out.append(out[-1] ^ xor)
    return np.array(out, dtype=np.uint32).view(np.float32)


# ---------------------------------------------------------------------------
# Spark surface: pack/unpack rollup tiers per (key, block)
# ---------------------------------------------------------------------------

def pack_blocks(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    block_seconds: int = 86400,
    value_dtype: str = "float64",
) -> DataFrame:
    """Pack a rollup tier into one binary row per (key, block): Gorilla
    timestamps + values, with raw/packed byte counts for compression-ratio
    accounting. One shuffle on (key, block) — at the rollup tiers this is
    tiny relative to raw data. ``value_dtype='float32'`` uses the half-width
    XOR codec (bit-exact for float32-born values; lossy vs float64)."""
    blk = (F.unix_timestamp(F.col(ts_col)) / block_seconds).cast("bigint")
    src = df.select(
        *key_cols,
        blk.alias("block_id"),
        F.unix_timestamp(F.col(ts_col)).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )

    out_schema = ", ".join(
        [f"{c} string" for c in key_cols]
        + ["block_id bigint", "n_points bigint", "ts_blob binary", "val_blob binary",
           "raw_bytes bigint", "packed_bytes bigint"]
    )

    f32 = value_dtype == "float32"

    def pack(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts")
        ts = pdf["_ts"].to_numpy(dtype=np.int64)
        vals = pdf["_v"].to_numpy(dtype=np.float64)
        ts_blob = encode_timestamps(ts)
        val_blob = encode_values32(vals) if f32 else encode_values(vals)
        row = {k: [keys[i]] for i, k in enumerate(key_cols)}
        row["block_id"] = [keys[len(key_cols)]]
        row.update(
            n_points=[len(ts)],
            ts_blob=[ts_blob],
            val_blob=[val_blob],
            raw_bytes=[len(ts) * (12 if f32 else 16)],
            packed_bytes=[len(ts_blob) + len(val_blob)],
        )
        return pd.DataFrame(row)

    # explicit numbered repartition on the group key: the encode kernel is
    # Python-CPU-bound, and AQE's size-based coalescing would fold a small
    # tier's shuffle onto one partition, serialising every block through a
    # single Python worker (see halo.apply_with_halo — same trap). At
    # scale block count >> cores, so tasks stay full either way.
    sc = df.sparkSession.sparkContext
    src = src.repartition(max(sc.defaultParallelism, 1),
                          *key_cols, "block_id")
    return src.groupBy(*key_cols, "block_id").applyInPandas(pack, schema=out_schema)


def unpack_blocks(packed: DataFrame, key_cols: list[str],
                  value_dtype: str = "float64") -> DataFrame:
    """Inverse of pack_blocks: one row per point (ts epoch seconds, value).
    ``value_dtype`` must match the packing; float32 blobs upcast to double
    in the output column (exactly representable)."""
    out_schema = ", ".join(
        [f"{c} string" for c in key_cols] + ["ts bigint", "value double"]
    )
    # floor the decode parallelism at the cluster core count: a packed
    # tier is tiny in BYTES (that is the point of packing) so a cached or
    # AQE-coalesced input often arrives on 1-2 partitions, serialising the
    # Python decode loop; blobs are self-contained, so a round-robin
    # spread is free of semantics. Inputs already wider than the core
    # count (the 100 TB case) are left untouched.
    sc = packed.sparkSession.sparkContext
    if packed.rdd.getNumPartitions() < sc.defaultParallelism:
        packed = packed.repartition(sc.defaultParallelism)

    def unpack(pdf_iter):
        # one decode call per BLOCK (a blob is a single encoded unit holding
        # thousands of points); batch assembly via np.repeat/concatenate —
        # no per-row pandas iteration
        for pdf in pdf_iter:
            if not len(pdf):
                yield pd.DataFrame(columns=[*key_cols, "ts", "value"])
                continue
            ts_list = [decode_timestamps(bytes(b)) for b in pdf["ts_blob"]]
            dec = decode_values32 if value_dtype == "float32" else decode_values
            val_list = [dec(bytes(b)).astype(np.float64) for b in pdf["val_blob"]]
            counts = np.fromiter((len(t) for t in ts_list), dtype=np.int64, count=len(ts_list))
            out = {c: np.repeat(pdf[c].to_numpy(), counts) for c in key_cols}
            out["ts"] = np.concatenate(ts_list)
            out["value"] = np.concatenate(val_list)
            yield pd.DataFrame(out)

    return packed.mapInPandas(unpack, schema=out_schema)
