"""Dependency-free media codecs (stdlib only): PNG via zlib, WAV via struct.

These make the multimodal codec seam (operators/multimodal.py) EXECUTABLE on
real encoded bytes without any image/audio library: PNG is deflate (zlib, in
the stdlib) plus the five scanline filters of the spec; WAV PCM is a RIFF
header plus raw samples. Exotic formats (JPEG, MP3, ...) remain behind
``DecodeUnavailable`` — the seam's contract is unchanged, the common
interchange formats just work now.

Decoders are kernel-side helpers (called per blob inside Arrow-batched
mapInPandas kernels); the per-pixel unfilter loop runs once per scanline in
numpy, which is fine for the thumbnail/feature-extract shapes the engine
processes — a production pipeline at 100 TB would swap in a native codec at
this exact seam without touching any Spark plumbing.

PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace. WAV subset: PCM integer 8/16/32-bit, any channel
count.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class CodecError(ValueError):
    """Malformed or unsupported media bytes."""


# --------------------------------------------------------------------------- #
# PNG
# --------------------------------------------------------------------------- #
def decode_png(blob: bytes) -> np.ndarray:
    """Decode a PNG into a uint8 array: (h, w) for grayscale, (h, w, c)
    otherwise. Supports bit depth 8, color types 0/2/4/6, interlace 0."""
    if blob[:8] != _PNG_SIG:
        raise CodecError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos:pos + 4])
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise CodecError(f"unsupported PNG bit depth {depth}")
            if color_type not in _CHANNELS:
                raise CodecError(f"unsupported PNG color type {color_type}")
            if interlace != 0:
                raise CodecError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise CodecError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise CodecError("PNG data truncated")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).astype(np.int32)
        if ftype == 0:                       # None
            cur = line
        elif ftype == 2:                     # Up
            cur = (line + prev) & 0xFF
        else:
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:               # Sub
                    cur[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:             # Average
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:             # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
                else:
                    raise CodecError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(height, width, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """Encode a uint8 array ((h, w) gray or (h, w, c) with c in 2/3/4) as a
    valid PNG (filter 0 scanlines, one zlib IDAT)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise CodecError(f"cannot encode {ch}-channel image")
    raw = bytearray()
    flat = a.reshape(h, w * ch)
    for y in range(h):
        raw.append(0)
        raw += flat[y].tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


# --------------------------------------------------------------------------- #
# WAV (RIFF PCM)
# --------------------------------------------------------------------------- #
def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV. Returns (samples, sample_rate): samples is float64,
    shape (n,) mono or (n, channels). 8-bit is unsigned (centred at 128 ->
    shifted to signed), 16/32-bit little-endian signed."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (length,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise CodecError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise CodecError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64)
    else:
        raise CodecError(f"unsupported WAV bit depth {bits}")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch)
    return x, int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode samples ((n,) or (n, channels)) as PCM WAV."""
    a = np.asarray(samples)
    n_ch = 1 if a.ndim == 1 else a.shape[1]
    if bits == 16:
        payload = a.astype("<i2").tobytes()
    elif bits == 8:
        payload = (a + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 32:
        payload = a.astype("<i4").tobytes()
    else:
        raise CodecError(f"unsupported WAV bit depth {bits}")
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate,
                      sample_rate * block, block, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
