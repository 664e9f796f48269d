"""Dependency-free media codecs (stdlib + numpy only): PNG via zlib, WAV
via struct, baseline JPEG via spec Huffman + DCT, FLAC (full decoder +
lossless encoder) via spec rice/LPC coding.

These make the multimodal codec seam (operators/multimodal.py) EXECUTABLE on
real encoded bytes without any image/audio library: PNG is deflate (zlib, in
the stdlib) plus the five scanline filters of the spec; WAV PCM is a RIFF
header plus raw samples; JPEG is ITU-T T.81 baseline sequential — marker
parse, canonical Huffman entropy decode, dequantize, 2-D IDCT as two 8x8
matrix products vectorized over all blocks, chroma upsampling and JFIF
YCbCr->RGB; FLAC is bit-exact lossless coding — rice-coded residuals of
fixed or LPC predictors with CRC-8/16 and MD5 integrity checks.
Remaining exotic formats (arithmetic-coded JPEG, MP3/Vorbis/Opus PCM,
WebP, ...) stay behind ``DecodeUnavailable`` — the seam's contract is
unchanged, the dominant interchange formats just work now.

Decoders are kernel-side helpers (called per blob inside Arrow-batched
mapInPandas kernels); the per-symbol Huffman walk is the only Python loop
and is fine for the thumbnail/feature-extract shapes the engine processes —
a production pipeline at 100 TB would swap in a native codec at this exact
seam without touching any Spark plumbing.

PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace. WAV subset: PCM integer 8/16/32-bit, any channel
count. JPEG subset: baseline sequential Huffman (SOF0/1, interleaved or
multi-scan non-interleaved) AND progressive (SOF2: spectral selection +
successive approximation, all four scan kinds of T.81 G.1.2, EOB runs,
interleaved and non-interleaved scans), 8-bit, grayscale or YCbCr with
any 1/2-factor subsampling (4:4:4, 4:2:2, 4:2:0), restart intervals; the
bundled encoder writes spec-compliant grayscale/4:4:4/4:2:0 JFIF —
baseline with the Annex K tables, or progressive (libjpeg's standard
scan script) with per-scan OPTIMIZED Huffman tables built by the Annex
K.2 procedure (required: the typical tables carry no EOBn symbols).
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


# --------------------------------------------------------------------------- #
# JPEG (ITU-T T.81 baseline sequential)
# --------------------------------------------------------------------------- #
#: zigzag scan order: index = zigzag position, value = raster position
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal 8-point DCT-II matrix: A @ x = DCT(x); A.T @ X @ A = IDCT
_DCT_A = np.array([[np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
                    * np.cos((2 * n + 1) * k * np.pi / 16.0)
                    for n in range(8)] for k in range(8)])

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_K_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
_K_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_K_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_K_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# Annex K.1 luminance / K.2 chrominance quantization tables (raster order)
_K_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_K_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _huff_decode_map(bits, vals):
    """Canonical Huffman: (code_length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise CodecError("JPEG entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise CodecError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples (pre-shift)."""
    return np.einsum("ij,njk,kl->nil", _DCT_A.T, coefs, _DCT_A)


def _entropy_segments(blob: bytes, start: int):
    """Split the scan's entropy-coded bytes at RST/terminating markers.
    Returns (segments, end_pos): each segment is destuffed (FF00 -> FF)."""
    segs = []
    cur = bytearray()
    i = start
    while i < len(blob):
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = blob[i + 1] if i + 1 < len(blob) else 0xD9
        if nxt == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # any real marker terminates the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a JPEG into uint8: (h, w) for one component, (h, w, 3) RGB
    for YCbCr. Covers baseline/extended sequential (SOF0/1) — interleaved
    single-scan fast path or multi-scan non-interleaved — and progressive
    (SOF2) with spectral selection, successive approximation and EOB runs
    (T.81 G.1.2). Arithmetic-coded and lossless frames raise CodecError —
    the documented seam. Cross-implementation checked against bundled
    libjpeg-produced progressive files (test_codecs)."""
    if blob[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    stores = None  # persistent per-component zigzag coefficients (multi-scan)
    restart_interval = 0
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise CodecError(f"JPEG marker sync lost at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i + 4 <= len(blob) and blob[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(blob):
            break
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", blob[i + 2:i + 4])
        data = blob[i + 4:i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(data[p:p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(data[p:p + 128], ">u2").astype(np.int64)
                    p += 128
                raster = np.empty(64, np.int64)
                raster[_ZIGZAG] = tbl
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 15
                bits = list(data[p + 1:p + 17])
                n = sum(bits)
                vals = list(data[p + 17:p + 17 + n])
                p += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_map(bits, vals)
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise CodecError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise CodecError(
                f"non-baseline JPEG frame (SOF{marker - 0xC0}) unsupported")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise CodecError("JPEG SOS before SOF")
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None)
                if comp is None:
                    raise CodecError(f"JPEG scan names unknown component {cs}")
                scan.append((comp, tt >> 4, tt & 15))
            p = 1 + 2 * ns
            ss, se, ahal = data[p], data[p + 1], data[p + 2]
            if not frame["prog"] and ns == len(frame["comps"]):
                # single interleaved sequential scan: the fast path
                segs, _end = _entropy_segments(blob, i)
                return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                                    segs, restart_interval)
            if stores is None:
                hmax = max(c["h"] for c in frame["comps"])
                vmax = max(c["v"] for c in frame["comps"])
                mcux = -(-frame["w"] // (8 * hmax))
                mcuy = -(-frame["h"] // (8 * vmax))
                stores = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"] * mcux * c["h"], 64), np.int64)
                    for c in frame["comps"]
                }
            segs, end = _entropy_segments(blob, i)
            _decode_scan_general(frame, scan, ss, se, ahal >> 4, ahal & 15,
                                 huff_dc, huff_ac, stores, segs,
                                 restart_interval)
            i = end
        # APPn / COM / others: skipped
    if stores is not None:
        return _assemble_multiscan(frame, stores, qt)
    raise CodecError("JPEG has no SOS scan")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, segs, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # per-component coefficient stores (blocks in MCU raster order)
    store = []
    for comp, _td, _ta in scan:
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        store.append(np.zeros((bh * bw, 8, 8), dtype=np.float64))
    preds = [0] * len(scan)
    seg_idx = 0
    reader = _BitReader(segs[0])
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise CodecError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, (comp, td, ta) in enumerate(scan):
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coef = np.zeros(64, dtype=np.float64)
                    s = reader.read_symbol(huff_dc[td])
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[ci] += diff
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(huff_ac[ta])
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise CodecError("JPEG AC index overflow")
                        coef[_ZIGZAG[k]] = _extend(reader.read_bits(size),
                                                   size)
                        k += 1
                    bw = mcux * comp["h"]
                    row = my * comp["v"] + by
                    col = mx * comp["h"] + bx
                    store[ci][row * bw + col] = coef.reshape(8, 8)
    # dequantize + IDCT per component, assemble planes, upsample
    planes = []
    for ci, (comp, _td, _ta) in enumerate(scan):
        q = qt[comp["tq"]].astype(np.float64)
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        px = _idct_blocks(store[ci] * q) + 128.0
        plane = (px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:h, :w])
    return _planes_to_img(planes)


def _planes_to_img(planes) -> np.ndarray:
    """Full-resolution component planes -> uint8 image (JFIF YCbCr->RGB)."""
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise CodecError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255) \
        .astype(np.uint8)


def _scan_geom(frame, scan_comps):
    """Unit iteration geometry for one scan (T.81 A.2): scans with several
    components step MCUs over the frame grid; single-component scans step
    the component's TRUE block grid (ceil of its scaled dimensions), which
    can be smaller than its MCU-padded store. Returns (n_units, unit_fn)
    where unit_fn(u) lists (scan_ci, store_block_index)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    if len(scan_comps) == 1:
        comp = scan_comps[0]
        cw = -(-(frame["w"] * comp["h"]) // hmax)
        ch = -(-(frame["h"] * comp["v"]) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        pad_bw = mcux * comp["h"]

        def unit(u, _bw=bw, _pad=pad_bw):
            row, col = divmod(u, _bw)
            return ((0, row * _pad + col),)

        return bw * bh, unit

    def unit(m):
        my, mx = divmod(m, mcux)
        out = []
        for ci, comp in enumerate(scan_comps):
            pad_bw = mcux * comp["h"]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    out.append((ci, (my * comp["v"] + by) * pad_bw
                                + mx * comp["h"] + bx))
        return out

    return mcux * mcuy, unit


def _ac_first(reader, coef, ss, se, al, ac_tbl, eobrun):
    """AC coefficients, first pass for this band (T.81 G.1.2.2; also the
    AC half of a sequential scan when al == 0). ``coef`` is the block's
    flat zigzag store. Returns the remaining EOB run."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise CodecError("JPEG AC index overflow")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(reader, coef, ss, se, al, ac_tbl, eobrun):
    """AC successive-approximation refinement (T.81 G.1.2.3): one
    correction bit per already-nonzero coefficient, new coefficients
    appear as +-(1<<al). Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_tbl)
            r, s = rs >> 4, rs & 15
            s_val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15 (ZRL): pass 16 zero-history positions
            else:
                if s != 1:
                    raise CodecError("JPEG AC refinement size != 1")
                s_val = p1 if reader.read_bit() else m1
            while k <= se:
                if coef[k]:
                    if reader.read_bit() and not (coef[k] & p1):
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                coef[k] = s_val
            k += 1
    if eobrun:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            if coef[k]:
                if reader.read_bit() and not (coef[k] & p1):
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_general(frame, scan, ss, se, ah, al, huff_dc, huff_ac,
                         stores, segs, restart_interval):
    """One scan of a multi-scan JPEG (progressive SOF2, or non-interleaved
    sequential SOF0/1) into the persistent per-component zigzag stores."""
    comps = [c for c, _, _ in scan]
    n_units, unit_fn = _scan_geom(frame, comps)
    preds = [0] * len(scan)
    eobrun = 0
    seg_idx = 0
    reader = _BitReader(segs[0])
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise CodecError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = [0] * len(scan)
            eobrun = 0
        for ci, bidx in unit_fn(u):
            comp, td, ta = scan[ci]
            coef = stores[comp["id"]][bidx]
            if ss == 0 and ah == 0:
                # DC first (plus, for sequential scans, the AC tail)
                s = reader.read_symbol(huff_dc[td])
                preds[ci] += _extend(reader.read_bits(s), s) if s else 0
                coef[0] = preds[ci] << al
                if se > 0:
                    eobrun = _ac_first(reader, coef, 1, se, al,
                                       huff_ac[ta], eobrun)
            elif ss == 0:  # DC refinement: one appended bit per block
                if reader.read_bit():
                    coef[0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first(reader, coef, ss, se, al,
                                   huff_ac[ta], eobrun)
            else:
                eobrun = _ac_refine(reader, coef, ss, se, al,
                                    huff_ac[ta], eobrun)


def _assemble_multiscan(frame, stores, qt):
    """Dequantize + IDCT the accumulated zigzag stores, upsample, crop."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = []
    for comp in frame["comps"]:
        q = qt[comp["tq"]].astype(np.float64)
        zz = stores[comp["id"]].astype(np.float64)
        raster = np.zeros_like(zz)
        raster[:, _ZIGZAG] = zz
        bw, bh = mcux * comp["h"], mcuy * comp["v"]
        px = _idct_blocks(raster.reshape(-1, 8, 8) * q) + 128.0
        plane = (px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])
    return _planes_to_img(planes)


def _huff_encode_map(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitWriter:
    """MSB-first writer with T.81 byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _quality_tables(quality: int):
    """libjpeg-style quality scaling of the Annex K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qs = []
    for base in (_K_Q_LUM, _K_Q_CHR):
        q = (base * scale + 50) // 100
        qs.append(np.clip(q, 1, 255).astype(np.int64))
    return qs  # raster order


def _mag_bits(v: int):
    """(size, code) pair for a signed coefficient value (T.81 F.1.4.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_block(writer, coef_zz, pred, dc_map, ac_map):
    """Encode one quantized block (zigzag order). Returns new DC pred."""
    dc = int(coef_zz[0])
    s, code = _mag_bits(dc - pred)
    c, ln = dc_map[s]
    writer.write(c, ln)
    if s:
        writer.write(code, s)
    run = 0
    nz = np.nonzero(coef_zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_map[0xF0]
            writer.write(c, ln)
            run -= 16
        s, code = _mag_bits(v)
        c, ln = ac_map[(run << 4) | s]
        writer.write(c, ln)
        writer.write(code, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_map[0x00]  # EOB
        writer.write(c, ln)
    return dc


def _plane_blocks(plane: np.ndarray, q_raster: np.ndarray) -> np.ndarray:
    """Level-shift, pad to 8-multiples (edge replicate), DCT, quantize.
    Returns (by, bx, 64) int64 zigzag coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:h, w:] = padded[:h, w - 1:w]
    padded[h:, w:] = padded[h - 1, w - 1]
    padded -= 128.0
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    coefs = np.einsum("ij,njk,kl->nil", _DCT_A, blocks, _DCT_A.T)
    q = q_raster.reshape(8, 8).astype(np.float64)
    quant = np.round(coefs / q).astype(np.int64).reshape(-1, 64)
    zz = quant[:, _ZIGZAG]
    return zz.reshape(by, bx, 64)


def _prep_components(img: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: color transform, subsampling, DCT +
    quantization. Returns (h, w, gray, samp, comp_zz, q_lum_r, q_chr_r,
    mcux, mcuy) with comp_zz grown to full MCU coverage."""
    a = np.asarray(img, dtype=np.uint8).astype(np.float64)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise CodecError("encode_jpeg wants (h, w) or (h, w, 3) uint8")
    if subsample not in ("444", "420"):
        raise CodecError(f"unsupported subsampling {subsample!r}")
    h, w = a.shape[:2]
    q_lum_r, q_chr_r = _quality_tables(quality)

    if gray:
        planes = [a]
        samp = [(1, 1)]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            def box2(p):
                ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                pad = np.empty((ph, pw), np.float64)
                pad[:p.shape[0], :p.shape[1]] = p
                pad[p.shape[0]:, :p.shape[1]] = p[-1:, :]
                pad[:, p.shape[1]:] = pad[:, p.shape[1] - 1:p.shape[1]]
                return pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, box2(cb), box2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # per-component zigzag blocks, grown to full MCU coverage
    comp_zz = []
    for p, (sh, sv), qr in zip(
            planes, samp, [q_lum_r] + [q_chr_r] * (len(planes) - 1)):
        zz = _plane_blocks(p, qr)
        need_by, need_bx = mcuy * sv, mcux * sh
        by, bx, _ = zz.shape
        if (by, bx) != (need_by, need_bx):
            grown = np.zeros((need_by, need_bx, 64), np.int64)
            grown[:by, :bx] = zz
            if need_by > by:
                grown[by:, :bx] = zz[-1:, :]
            if need_bx > bx:
                grown[:, bx:] = grown[:, bx - 1:bx]
            zz = grown
        comp_zz.append(zz)
    return h, w, gray, samp, comp_zz, q_lum_r, q_chr_r, mcux, mcuy


def _jpeg_headers(h, w, gray, samp, q_lum_r, q_chr_r, sof_marker,
                  restart_interval=0):
    """SOI + APP0 + DQT(s) + optional DRI + SOF as a bytearray."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(q_lum_r[_ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(q_chr_r[_ZIGZAG].tolist()))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(samp)))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(sof_marker, bytes(sof))
    return out


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as JFIF JPEG.
    Baseline (default): Annex K quantization (quality-scaled) + Annex K
    typical Huffman tables, single interleaved scan, optional 4:2:0
    chroma subsampling and restart intervals. ``progressive=True`` writes
    an SOF2 stream with libjpeg's standard scan script (spectral
    selection + two successive-approximation levels) and per-scan
    optimized Huffman tables; restart_interval is ignored there. Both
    modes quantize identically, so decode(progressive) is bit-identical
    to decode(baseline) — the round-trip test exploits that."""
    if progressive:
        prep = _prep_components(img, quality, subsample)
        ncomp = 1 if prep[2] else 3
        return _encode_multiscan(prep, _std_progressive_script(ncomp), 0xC2)
    h, w, gray, samp, comp_zz, q_lum_r, q_chr_r, mcux, mcuy = \
        _prep_components(img, quality, subsample)

    dc_lum = _huff_encode_map(*_K_DC_LUM)
    ac_lum = _huff_encode_map(*_K_AC_LUM)
    dc_chr = _huff_encode_map(*_K_DC_CHR)
    ac_chr = _huff_encode_map(*_K_AC_CHR)
    ncomp = len(samp)
    maps = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (ncomp - 1)

    writer = _BitWriter()
    preds = [0] * ncomp
    chunks = []
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            chunks.append(bytes(writer.out))
            chunks.append(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, ((sh, sv), (dcm, acm)) in enumerate(zip(samp, maps)):
            for byy in range(sv):
                for bxx in range(sh):
                    zz = comp_zz[ci][my * sv + byy, mx * sh + bxx]
                    preds[ci] = _encode_block(writer, zz, preds[ci],
                                              dcm, acm)
    writer.flush()
    chunks.append(bytes(writer.out))
    entropy = b"".join(chunks)

    out = _jpeg_headers(h, w, gray, samp, q_lum_r, q_chr_r, 0xC0,
                        restart_interval)
    for tc_th, (bits, vals) in ((0x00, _K_DC_LUM), (0x10, _K_AC_LUM),
                                *(() if gray else
                                  ((0x01, _K_DC_CHR), (0x11, _K_AC_CHR)))):
        out += _seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------- #
# progressive JPEG encoder (SOF2)
# --------------------------------------------------------------------------- #

def _build_huffman(freq_map: dict) -> tuple[list, list]:
    """Optimal length-limited JPEG Huffman table from symbol frequencies —
    the T.81 Annex K.2 procedure: pairwise merge with the reserved
    pseudo-symbol 256 (keeps the all-ones codeword unassigned), then fold
    code lengths above 16 down (Figure K.3). Returns (bits, vals)."""
    freq = np.zeros(257, np.int64)
    for sym, n in freq_map.items():
        freq[sym] = n
    freq[256] = 1
    codesize = np.zeros(257, np.int64)
    others = np.full(257, -1, np.int64)
    while True:
        nz = np.nonzero(freq)[0]
        if len(nz) < 2:
            break
        # v1 = least-frequent (ties -> largest symbol), v2 = next least
        order = nz[np.lexsort((-nz, freq[nz]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(33, np.int64)
    for cs in codesize[codesize > 0]:
        bits[min(int(cs), 32)] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's (longest) codeword
    syms = [s for s in range(256) if codesize[s] > 0]
    syms.sort(key=lambda s: (codesize[s], s))
    return [int(b) for b in bits[1:17]], syms


class _HuffStats:
    """Statistics pass: counts Huffman symbols, discards raw bits."""

    __slots__ = ("dc", "ac")

    def __init__(self):
        self.dc = {}
        self.ac = {}

    def dc_sym(self, s):
        self.dc[s] = self.dc.get(s, 0) + 1

    def ac_sym(self, s):
        self.ac[s] = self.ac.get(s, 0) + 1

    def bits(self, v, n):
        pass

    def bit(self, b):
        pass


class _HuffEmit:
    """Emission pass: writes symbols through the scan's built tables."""

    __slots__ = ("w", "dc_map", "ac_map")

    def __init__(self, dc_map, ac_map):
        self.w = _BitWriter()
        self.dc_map = dc_map
        self.ac_map = ac_map

    def dc_sym(self, s):
        c, ln = self.dc_map[s]
        self.w.write(c, ln)

    def ac_sym(self, s):
        c, ln = self.ac_map[s]
        self.w.write(c, ln)

    def bits(self, v, n):
        if n:
            self.w.write(v, n)

    def bit(self, b):
        self.w.write(1 if b else 0, 1)


def _std_progressive_script(ncomp: int):
    """libjpeg's standard progressive scan script (jcparam.c): DC first at
    Al=1, AC first passes (luma split 1-5 / 6-63 at Al=2, chroma 1-63 at
    Al=1), then the successive-approximation refinements. Entries are
    (comp_indices, Ss, Se, Ah, Al)."""
    if ncomp == 1:
        return [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0), ([0], 1, 63, 1, 0)]


def _enc_blocks_in_scan(comp_zz, samp, mcux, mcuy, w, h, comp_ids):
    """Yield (scan_ci, zigzag_block) in scan order — the mirror of the
    decoder's _scan_geom: MCU-interleaved for multi-component scans, the
    TRUE block grid for single-component scans."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if len(comp_ids) == 1:
        ci = comp_ids[0]
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        for row in range(bh):
            for col in range(bw):
                yield 0, comp_zz[ci][row, col]
        return
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for sci, ci in enumerate(comp_ids):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    yield sci, comp_zz[ci][my * sv + by, mx * sh + bx]


def _enc_ac_first(out, blocks, ss, se, al):
    """AC first pass with EOB-run accumulation (T.81 G.1.2.2 encoder)."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            out.ac_sym(r << 4)
            out.bits(eobrun - (1 << r), r)
            eobrun = 0

    for blk in blocks:
        nz = [k for k in range(ss, se + 1) if abs(int(blk[k])) >> al]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        prev = ss - 1
        for k in nz:
            r = k - prev - 1
            while r > 15:
                out.ac_sym(0xF0)
                r -= 16
            v = int(blk[k])
            tval = abs(v) >> al
            if v < 0:
                tval = -tval
            s, code = _mag_bits(tval)
            out.ac_sym((r << 4) | s)
            out.bits(code, s)
            prev = k
        if nz[-1] != se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(out, blocks, ss, se, al):
    """AC refinement pass (T.81 G.1.2.3 encoder, libjpeg's buffered-bit
    scheme): newly-nonzero coefficients get (run, 1) symbols + sign;
    already-nonzero coefficients owe one correction bit each, buffered so
    they land after the symbol (or after the EOBn that closes a run)."""
    eobrun = 0
    pending = []

    def flush():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            out.ac_sym(r << 4)
            out.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in pending:
            out.bit(b)
        pending = []

    for blk in blocks:
        band = [(abs(int(blk[k])) >> al, int(blk[k]) < 0)
                for k in range(ss, se + 1)]
        eob = 0  # band-relative index AFTER the last newly-nonzero coef
        for idx, (t, _) in enumerate(band):
            if t == 1:
                eob = idx + 1
        r = 0
        br = []
        for idx, (t, neg) in enumerate(band):
            if t == 0:
                r += 1
                continue
            while r > 15 and idx < eob:
                flush()
                out.ac_sym(0xF0)
                r -= 16
                for b in br:
                    out.bit(b)
                br = []
            if t > 1:  # nonzero history: one buffered correction bit
                br.append(t & 1)
                continue
            flush()  # newly nonzero at this level
            out.ac_sym((r << 4) | 1)
            out.bit(0 if neg else 1)
            for b in br:
                out.bit(b)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def _encode_multiscan(prep, scans, sof_marker: int) -> bytes:
    """Emit a multi-scan JPEG (progressive, or sequential non-interleaved
    for sof_marker 0xC0 with full-band scans). Each Huffman-coded scan is
    two passes: gather symbol statistics, build optimized tables (emitted
    as a DHT right before the scan's SOS), then emit."""
    h, w, gray, samp, comp_zz, q_lum_r, q_chr_r, mcux, mcuy = prep
    out = _jpeg_headers(h, w, gray, samp, q_lum_r, q_chr_r, sof_marker)
    for comp_ids, ss, se, ah, al in scans:
        def run(sink):
            blocks = _enc_blocks_in_scan(comp_zz, samp, mcux, mcuy, w, h,
                                         comp_ids)
            if ss == 0:
                preds = [0] * len(comp_ids)
                for sci, blk in blocks:
                    if ah == 0:
                        v = int(blk[0]) >> al
                        s, code = _mag_bits(v - preds[sci])
                        preds[sci] = v
                        sink.dc_sym(s)
                        sink.bits(code, s)
                        if se > 0:  # sequential scan: AC tail follows DC
                            _enc_ac_first(sink, [blk], 1, se, al)
                    else:
                        sink.bit((int(blk[0]) >> al) & 1)
            elif ah == 0:
                _enc_ac_first(sink, (b for _, b in blocks), ss, se, al)
            else:
                _enc_ac_refine(sink, (b for _, b in blocks), ss, se, al)

        stats = _HuffStats()
        run(stats)
        dc_map = ac_map = None
        if stats.dc:
            bits, vals = _build_huffman(stats.dc)
            dc_map = _huff_encode_map(bits, vals)
            out += _seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
        if stats.ac:
            bits, vals = _build_huffman(stats.ac)
            ac_map = _huff_encode_map(bits, vals)
            out += _seg(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
        emit = _HuffEmit(dc_map, ac_map)
        run(emit)
        emit.w.flush()
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(sos))
        out += bytes(emit.w.out)
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------- #
# FLAC (free lossless audio codec)
# --------------------------------------------------------------------------- #
# Public-spec implementation (xiph.org format spec / RFC 9639): the dominant
# lossless interchange format for speech training corpora (LibriSpeech,
# MLS, ... ship as FLAC). Decoder covers the full subframe surface —
# CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), rice + rice2 partitioned
# residuals with escape codes, wasted bits, all four channel assignments
# (independent, left/side, right/side, mid/side), CRC-8 header and CRC-16
# frame checks and the STREAMINFO MD5 of the decoded stream. Encoder is a
# real (if unsophisticated) lossless encoder: per-block best-of
# CONSTANT/FIXED/LPC/VERBATIM with exact rice-parameter search, optional
# stereo decorrelation and partitioned residuals — it exists so every
# decoder path is exercised by EXACT round-trips. No FLAC tool exists in
# this container, so cross-implementation interop is untested here (the
# test suite proves self-consistency + structural conformance only).

_CRC8_TABLE = None
_CRC16_TABLE = None


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0, MSB-first (FLAC header CRC)."""
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        tab = []
        for b in range(256):
            r = b
            for _ in range(8):
                r = ((r << 1) ^ 0x07 if r & 0x80 else r << 1) & 0xFF
            tab.append(r)
        _CRC8_TABLE = tab
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0, MSB-first (frame CRC)."""
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tab = []
        for b in range(256):
            r = b << 8
            for _ in range(8):
                r = ((r << 1) ^ 0x8005 if r & 0x8000 else r << 1) & 0xFFFF
            tab.append(r)
        _CRC16_TABLE = tab
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


class _FlacBitWriter:
    """MSB-first bit writer with byte access for the in-header CRCs."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q '0' bits terminated by a '1'
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _FlacBitReader:
    """MSB-first bit reader over the whole stream; byte position is exposed
    for the CRC spans (header and frame CRCs cover byte-aligned ranges)."""

    def __init__(self, blob: bytes, pos: int = 0):
        self.blob = blob
        self.bitpos = pos * 8

    @property
    def bytepos(self) -> int:
        assert self.bitpos % 8 == 0
        return self.bitpos // 8

    def read(self, n: int) -> int:
        v = 0
        bp, blob = self.bitpos, self.blob
        end = bp + n
        if end > len(blob) * 8:
            raise CodecError("FLAC: truncated stream")
        while n > 0:
            byte = blob[bp >> 3]
            avail = 8 - (bp & 7)
            take = min(avail, n)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bp += take
            n -= take
        self.bitpos = bp
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _utf8_number(w: _FlacBitWriter, v: int) -> None:
    """FLAC extended-UTF-8 coded frame/sample number."""
    if v < 0x80:
        w.write(v, 8)
        return
    for nbytes in range(2, 8):
        if v < (1 << (nbytes * 5 + 1 if nbytes < 7 else 36)):
            break
    cont = [(v >> (6 * i)) & 0x3F for i in range(nbytes - 1)][::-1]
    lead_payload = v >> (6 * (nbytes - 1))
    # lead byte: nbytes '1' bits, one '0' bit, then the payload high bits
    lead = ((((1 << nbytes) - 1) << (8 - nbytes)) | lead_payload) & 0xFF
    w.write(lead, 8)
    for c in cont:
        w.write(0x80 | c, 8)


def _read_utf8_number(r: _FlacBitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise CodecError("FLAC: invalid UTF-8-coded number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise CodecError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int(np.sum(u >> k)) + len(u) * (k + 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, cost) minimizing the exact rice bit count, param 0..30."""
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 31):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break
    return best_k, best_c


def _write_residual(w: _FlacBitWriter, res: np.ndarray, block_size: int,
                    order: int, partition_order: int) -> None:
    n_part = 1 << partition_order
    if block_size % n_part or block_size // n_part <= order:
        partition_order, n_part = 0, 1
    u = ((res << 1) ^ (res >> 63)).astype(np.int64)  # zigzag
    bounds = [0]
    for p in range(n_part):
        cnt = block_size // n_part - (order if p == 0 else 0)
        bounds.append(bounds[-1] + cnt)
    params = [_best_rice_param(u[bounds[p]:bounds[p + 1]])[0]
              for p in range(n_part)]
    method = 0 if max(params) <= 14 else 1
    pbits = 4 if method == 0 else 5
    w.write(method, 2)
    w.write(partition_order, 4)
    for p in range(n_part):
        k = params[p]
        w.write(k, pbits)
        for v in u[bounds[p]:bounds[p + 1]]:
            w.write_unary(int(v) >> k)
            w.write(int(v), k)


def _residual_cost(res: np.ndarray, block_size: int, order: int,
                   partition_order: int) -> int:
    n_part = 1 << partition_order
    if block_size % n_part or block_size // n_part <= order:
        n_part = 1
    u = ((res << 1) ^ (res >> 63)).astype(np.int64)
    total = 6
    pos = 0
    for p in range(n_part):
        cnt = block_size // n_part - (order if p == 0 else 0)
        total += 5 + _best_rice_param(u[pos:pos + cnt])[1]
        pos += cnt
    return total


def _quantize_lpc(x: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin LPC + coefficient quantization. Returns
    (qcoefs, shift) or None when the block is degenerate."""
    xf = x.astype(np.float64)
    n = len(xf)
    if order < 1 or n <= order + 1:
        return None
    ac = np.array([np.dot(xf[: n - i], xf[i:]) for i in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[1:i + 1][::-1])
        if err == 0:
            return None
        k = acc / err
        a[:i] = a[:i] - k * a[:i][::-1]
        a[i] = k
        err *= 1.0 - k * k
    cmax = np.max(np.abs(a))
    if not np.isfinite(cmax) or cmax == 0:
        return None
    shift = 14
    while shift > 0 and cmax * (1 << shift) >= (1 << (precision - 1)) - 1:
        shift -= 1
    if shift == 0:
        return None
    q = np.round(a * (1 << shift)).astype(np.int64)
    q = np.clip(q, -(1 << (precision - 1)), (1 << (precision - 1)) - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_predict(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    """Integer LPC prediction for samples [order:] from the TRUE samples —
    exactly the decoder's recurrence, so residuals reconstruct losslessly."""
    order = len(q)
    acc = np.zeros(len(x) - order, dtype=np.int64)
    for j in range(order):
        acc += q[j] * x[order - 1 - j: len(x) - 1 - j]
    return x[order:] - (acc >> shift)


def _encode_subframe(w: _FlacBitWriter, x: np.ndarray, bps: int,
                     partition_order: int, use_lpc: bool,
                     lpc_order: int) -> None:
    n = len(x)
    if np.all(x == x[0]):
        w.write(0, 1)
        w.write(0b000000, 6)
        w.write(0, 1)
        w.write_signed(int(x[0]), bps)
        return
    # wasted bits: shared trailing zero bits across the block
    nz = x[x != 0]
    wasted = 0
    if len(nz):
        tz = np.min([int(v & -v).bit_length() - 1
                     for v in np.abs(nz.astype(np.int64))])
        wasted = int(tz)
    eff = bps - wasted
    xs = (x >> wasted).astype(np.int64)

    cands = []  # (bits, kind, payload)
    for order in range(0, min(4, n - 1) + 1):
        res = xs.copy()
        for _ in range(order):
            res = np.diff(res)
        bits = order * eff + _residual_cost(res, n, order, partition_order)
        cands.append((bits, "fixed", (order, res)))
    if use_lpc and lpc_order >= 1:
        ql = _quantize_lpc(xs, min(lpc_order, n - 2))
        if ql is not None:
            q, shift = ql
            res = _lpc_predict(xs, q, shift)
            bits = (len(q) * eff + 4 + 5 + len(q) * 12
                    + _residual_cost(res, n, len(q), partition_order))
            cands.append((bits, "lpc", (q, shift, res)))
    cands.append((n * eff, "verbatim", None))
    _, kind, payload = min(cands, key=lambda c: c[0])

    def wasted_field():
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if kind == "verbatim":
        w.write(0, 1)
        w.write(0b000001, 6)
        wasted_field()
        for v in xs:
            w.write_signed(int(v), eff)
        return
    if kind == "fixed":
        order, res = payload
        w.write(0, 1)
        w.write(0b001000 | order, 6)
        wasted_field()
        for v in xs[:order]:
            w.write_signed(int(v), eff)
        _write_residual(w, res, n, order, partition_order)
        return
    q, shift, res = payload
    order = len(q)
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)
    wasted_field()
    for v in xs[:order]:
        w.write_signed(int(v), eff)
    w.write(12 - 1, 4)
    w.write(shift, 5)
    for c in q:
        w.write_signed(int(c), 12)
    _write_residual(w, res, n, order, partition_order)


_FLAC_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def encode_flac(samples: np.ndarray, sample_rate: int, bits: int = 16,
                block_size: int = 4096, stereo_mode: str = "auto",
                partition_order: int = 0, use_lpc: bool = False,
                lpc_order: int = 8) -> bytes:
    """Encode integer samples ((n,) or (n, channels), signed, within
    ``bits``) as a lossless FLAC stream. ``stereo_mode``: 'independent',
    'left_side', 'right_side', 'mid_side' or 'auto' (cheapest estimate,
    2-channel input only)."""
    import hashlib

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, n_ch = a.shape
    if n == 0 or n_ch < 1 or n_ch > 8:
        raise CodecError("FLAC: need 1..8 channels and at least 1 sample")
    if bits not in _FLAC_BPS_CODE or bits % 8:
        raise CodecError(f"unsupported FLAC bit depth {bits}")
    lim = 1 << (bits - 1)
    if a.min() < -lim or a.max() >= lim:
        raise CodecError(f"samples exceed {bits}-bit signed range")
    if n_ch != 2:
        stereo_mode = "independent"

    # STREAMINFO MD5: the unencoded audio, channel-interleaved,
    # little-endian at the stream bit depth
    width = bits // 8
    if width in (1, 2, 4):
        raw = np.ascontiguousarray(a).astype(f"<i{width}").tobytes()
    else:  # 24-bit: pack 3-byte little-endian by dropping every 4th byte
        b4 = np.ascontiguousarray(a).astype("<i4").tobytes()
        raw = bytes(b4[i] for i in range(len(b4)) if i % 4 != 3)
    md5_digest = hashlib.md5(raw).digest()

    hdr = _FlacBitWriter()
    hdr.write(block_size, 16)
    hdr.write(block_size, 16)
    hdr.write(0, 24)
    hdr.write(0, 24)
    hdr.write(sample_rate, 20)
    hdr.write(n_ch - 1, 3)
    hdr.write(bits - 1, 5)
    hdr.write(n, 36)
    streaminfo = hdr.data() + md5_digest

    out = bytearray(b"fLaC")
    out.append(0x80)  # last-metadata-block | STREAMINFO
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    rate_in_header = sample_rate < 65536
    for fi, start in enumerate(range(0, n, block_size)):
        blk = a[start:start + block_size]
        bs = len(blk)
        chans: list[np.ndarray] = [blk[:, c] for c in range(n_ch)]
        bps_list = [bits] * n_ch
        assignment = n_ch - 1
        if n_ch == 2 and stereo_mode != "independent":
            left, right = chans
            side = left - right
            mid = (left + right) >> 1
            options = {
                "left_side": (8, [left, side], [bits, bits + 1]),
                "right_side": (9, [side, right], [bits + 1, bits]),
                "mid_side": (10, [mid, side], [bits, bits + 1]),
            }
            if stereo_mode == "auto":
                def est(cs):
                    return sum(float(np.abs(np.diff(c)).mean() + 1)
                               for c in cs)
                options["independent"] = (1, [left, right], [bits, bits])
                pick = min(options, key=lambda k: est(options[k][1]))
            else:
                pick = stereo_mode
            assignment, chans, bps_list = options[pick]

        w = _FlacBitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize stream
        w.write(0b0111, 4)  # 16-bit blocksize-1 follows
        w.write(0b1101 if rate_in_header else 0b0000, 4)
        w.write(assignment, 4)
        w.write(_FLAC_BPS_CODE[bits], 3)
        w.write(0, 1)
        _utf8_number(w, fi)
        w.write(bs - 1, 16)
        if rate_in_header:
            w.write(sample_rate, 16)
        w.write(_crc8(w.data()), 8)
        for ch, bps in zip(chans, bps_list):
            _encode_subframe(w, ch.astype(np.int64), bps,
                             partition_order, use_lpc, lpc_order)
        w.align()
        frame = w.data()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def _read_residual(r: _FlacBitReader, block_size: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise CodecError(f"FLAC: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    partition_order = r.read(4)
    n_part = 1 << partition_order
    if block_size % n_part or block_size // n_part <= order:
        raise CodecError("FLAC: invalid partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for p in range(n_part):
        cnt = block_size // n_part - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == esc:
            nb = r.read(5)
            for i in range(cnt):
                out[pos + i] = r.read_signed(nb) if nb else 0
        else:
            for i in range(cnt):
                q = r.read_unary()
                u = (q << k) | r.read(k)
                out[pos + i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        pos += cnt
    return out


def _restore_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    if order == 0:
        return res.copy()
    r = res
    for j in range(order, 0, -1):
        seed = np.diff(warmup, j - 1)[-1]
        r = np.cumsum(np.concatenate([[seed], r]))[1:]
    return np.concatenate([warmup, r])


def _decode_subframe(r: _FlacBitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise CodecError("FLAC: subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if t == 0b000000:
        x = np.full(block_size, r.read_signed(eff), dtype=np.int64)
    elif t == 0b000001:
        x = np.array([r.read_signed(eff) for _ in range(block_size)],
                     dtype=np.int64)
    elif 0b001000 <= t <= 0b001100:
        order = t & 0x07
        warmup = np.array([r.read_signed(eff) for _ in range(order)],
                          dtype=np.int64)
        res = _read_residual(r, block_size, order)
        x = _restore_fixed(warmup, res, order)
    elif t & 0b100000:
        order = (t & 0x1F) + 1
        warmup = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise CodecError("FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise CodecError("FLAC: negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warmup
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise CodecError(f"FLAC: reserved subframe type {t:06b}")
    return x << wasted


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(blob: bytes, verify: bool = True) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream. Returns (samples, sample_rate): float64 array,
    (n,) mono or (n, channels). ``verify`` checks header CRC-8, frame
    CRC-16 and (when present) the STREAMINFO MD5 of the decoded audio."""
    import hashlib

    if blob[:4] != b"fLaC":
        raise CodecError("not a FLAC stream (bad magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(blob):
            raise CodecError("FLAC: truncated metadata")
        last = blob[pos] & 0x80
        btype = blob[pos] & 0x7F
        length = int.from_bytes(blob[pos + 1:pos + 4], "big")
        body = blob[pos + 4:pos + 4 + length]
        pos += 4 + length
        if btype == 0:
            streaminfo = body
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise CodecError("FLAC: missing STREAMINFO")
    si = _FlacBitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    si_rate = si.read(20)
    si_nch = si.read(3) + 1
    si_bps = si.read(5) + 1
    total = si.read(36)
    si_md5 = streaminfo[18:34]

    channels: list[list[np.ndarray]] = [[] for _ in range(si_nch)]
    got = 0
    rate = si_rate  # zero-frame streams still return the STREAMINFO rate
    while pos < len(blob) and (total == 0 or got < total):
        frame_start = pos
        r = _FlacBitReader(blob, pos)
        if r.read(14) != 0b11111111111110:
            raise CodecError("FLAC: lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        assignment = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code in _FLAC_BLOCKSIZES:
            bs = _FLAC_BLOCKSIZES[bs_code]
        else:
            raise CodecError(f"FLAC: reserved blocksize code {bs_code}")
        if rate_code == 0:
            rate = si_rate
        elif rate_code == 0b1100:
            rate = r.read(8) * 1000
        elif rate_code == 0b1101:
            rate = r.read(16)
        elif rate_code == 0b1110:
            rate = r.read(16) * 10
        elif rate_code in _FLAC_RATES:
            rate = _FLAC_RATES[rate_code]
        else:
            raise CodecError("FLAC: invalid sample-rate code")
        bps = si_bps if bps_code == 0 else _FLAC_BPS.get(bps_code)
        if bps is None:
            raise CodecError("FLAC: reserved sample-size code")
        crc8 = r.read(8)
        if verify and _crc8(blob[frame_start:r.bytepos - 1]) != crc8:
            raise CodecError("FLAC: frame header CRC-8 mismatch")

        if assignment <= 7:
            n_ch = assignment + 1
            subs = [_decode_subframe(r, bs, bps) for _ in range(n_ch)]
            chans = subs
        elif assignment in (8, 9, 10):
            n_ch = 2
            bps_pair = {8: (bps, bps + 1), 9: (bps + 1, bps),
                        10: (bps, bps + 1)}[assignment]
            s0 = _decode_subframe(r, bs, bps_pair[0])
            s1 = _decode_subframe(r, bs, bps_pair[1])
            if assignment == 8:      # left/side
                chans = [s0, s0 - s1]
            elif assignment == 9:    # side/right
                chans = [s1 + s0, s1]
            else:                    # mid/side
                mid2 = (s0 << 1) | (s1 & 1)
                chans = [(mid2 + s1) >> 1, (mid2 - s1) >> 1]
        else:
            raise CodecError("FLAC: reserved channel assignment")
        if n_ch != si_nch:
            raise CodecError("FLAC: frame/STREAMINFO channel mismatch")
        r.align()
        crc16 = r.read(16)
        if verify and _crc16(blob[frame_start:r.bytepos - 2]) != crc16:
            raise CodecError("FLAC: frame CRC-16 mismatch")
        for c in range(si_nch):
            channels[c].append(chans[c])
        got += bs
        pos = r.bytepos

    full = [np.concatenate(ch) if ch else np.empty(0, dtype=np.int64)
            for ch in channels]
    if total:
        full = [ch[:total] for ch in full]
    if verify and si_md5 != b"\x00" * 16:
        a = np.stack(full, axis=1)
        width = si_bps // 8
        if width in (1, 2, 4):
            raw = np.ascontiguousarray(a).astype(f"<i{width}").tobytes()
        else:
            b4 = np.ascontiguousarray(a).astype("<i4").tobytes()
            raw = bytes(b4[i] for i in range(len(b4)) if i % 4 != 3)
        if hashlib.md5(raw).digest() != si_md5:
            raise CodecError("FLAC: decoded stream fails STREAMINFO MD5")
    out = np.stack(full, axis=1).astype(np.float64)
    return (out[:, 0] if si_nch == 1 else out), int(rate)


# ---------------------------------------------------------------------------
# MPEG audio (MP3 family) — frame-structure parser, ISO/IEC 11172-3 / 13818-3
# ---------------------------------------------------------------------------
# Everything here is derivable from the public header layout: the 32-bit
# frame header fields, the bitrate/samplerate tables, the frame-length and
# samples-per-frame formulas, the Layer III side-info sizes, and the
# Xing/Info and VBRI variable-bitrate headers. This covers the corpus-
# curation need (duration / bitrate / channel / VBR filters over crawled
# audio without decoding a single sample). Full PCM decode remains behind
# DecodeUnavailable: it requires the 512-entry synthesis-window table and
# the 34 Huffman code tables of Annex B, which cannot be re-derived from
# first principles — and in a sandbox with no real MP3 fixture, a
# self-round-trip test could not distinguish correct tables from wrong
# ones (an encoder and decoder sharing a mistranscribed table still
# round-trip), so shipping them unverifiable would be a silently-wrong
# codec rather than an honest seam.

#: bitrate kbps by [version_group][layer][index]; 0 = "free format"
_MPEG_BITRATES = {
    # MPEG-1
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    # MPEG-2 / 2.5 (lower sampling frequencies)
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPEG_RATES = {3: (44100, 48000, 32000),    # version bits 11 = MPEG-1
               2: (22050, 24000, 16000),    # 10 = MPEG-2
               0: (11025, 12000, 8000)}     # 00 = MPEG-2.5


def _id3v2_size(blob: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none): 'ID3' + ver(2) +
    flags(1) + 28-bit syncsafe size (+10 header, +10 if footer flag)."""
    if blob[:3] != b"ID3" or len(blob) < 10:
        return 0
    size = ((blob[6] & 0x7F) << 21) | ((blob[7] & 0x7F) << 14) \
        | ((blob[8] & 0x7F) << 7) | (blob[9] & 0x7F)
    return 10 + size + (10 if blob[5] & 0x10 else 0)


def _mpeg_frame_at(blob: bytes, i: int):
    """Parse the frame header at offset i. Returns None when the 4 bytes
    there are not a valid header, else a dict with frame geometry."""
    if i + 4 > len(blob):
        return None
    b0, b1, b2, b3 = blob[i], blob[i + 1], blob[i + 2], blob[i + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version_bits = (b1 >> 3) & 3          # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 3            # 3=Layer I, 2=II, 1=III
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits                # 1, 2, 3
    crc = not (b1 & 1)
    br_idx = (b2 >> 4) & 15
    sr_idx = (b2 >> 2) & 3
    padding = (b2 >> 1) & 1
    if br_idx in (0, 15) or sr_idx == 3:
        return None                       # free-format / reserved: skip
    vgrp = 1 if version_bits == 3 else 2
    bitrate = _MPEG_BITRATES[(vgrp, layer)][br_idx] * 1000
    rate = _MPEG_RATES[version_bits][sr_idx]
    mode = (b3 >> 6) & 3                  # 0 stereo, 1 joint, 2 dual, 3 mono
    if layer == 1:
        nsamp = 384
        length = (12 * bitrate // rate + padding) * 4
    elif layer == 2:
        nsamp = 1152
        length = 144 * bitrate // rate + padding
    else:
        nsamp = 1152 if vgrp == 1 else 576
        length = (144 if vgrp == 1 else 72) * bitrate // rate + padding
    return {"version": {3: "1", 2: "2", 0: "2.5"}[version_bits],
            "layer": layer, "bitrate": bitrate, "sample_rate": rate,
            "channels": 1 if mode == 3 else 2, "mode": mode, "crc": crc,
            "n_samples": nsamp, "length": length}


def _xing_info(blob: bytes, i: int, hdr: dict):
    """Xing/Info or VBRI VBR header inside the first frame, if present.
    Xing sits after the Layer III side info (32/17 bytes MPEG-1
    stereo/mono, 17/9 MPEG-2); VBRI sits at a fixed 32-byte offset."""
    if hdr["layer"] != 3:
        return None
    side = (32 if hdr["channels"] == 2 else 17) if hdr["version"] == "1" \
        else (17 if hdr["channels"] == 2 else 9)
    p = i + 4 + (2 if hdr["crc"] else 0) + side
    if blob[p:p + 4] in (b"Xing", b"Info"):
        flags = int.from_bytes(blob[p + 4:p + 8], "big")
        q = p + 8
        frames = bytes_ = None
        if flags & 1:
            frames = int.from_bytes(blob[q:q + 4], "big"); q += 4
        if flags & 2:
            bytes_ = int.from_bytes(blob[q:q + 4], "big"); q += 4
        return {"tag": blob[p:p + 4].decode(), "frames": frames,
                "bytes": bytes_}
    p = i + 4 + 32
    if blob[p:p + 4] == b"VBRI":
        return {"tag": "VBRI",
                "frames": int.from_bytes(blob[p + 14:p + 18], "big"),
                "bytes": int.from_bytes(blob[p + 10:p + 14], "big")}
    return None


def parse_mpeg_audio(blob: bytes, max_resync: int = 65536) -> dict:
    """Walk every MPEG audio frame and return stream metadata:
    (container='mp3', version, layer, sample_rate, channels, n_frames,
    n_samples, duration_sec, bitrate_kbps mean, is_vbr, vbr_tag) —
    without decoding any audio. Skips a leading ID3v2 tag and a trailing
    ID3v1 tag; tolerates up to ``max_resync`` junk bytes between frames
    (crawled files are routinely truncated or glued). Raises CodecError
    when no valid frame exists."""
    end = len(blob)
    # guard: for blobs under 128 bytes the negative slice would wrap and
    # could truncate `end` on spurious data (r8 ADVICE fix)
    if end >= 128 and blob[end - 128:end - 125] == b"TAG":
        end -= 128
    i = _id3v2_size(blob)
    frames = 0
    samples = 0
    bitrates: set = set()
    br_sum = 0
    first = None
    vbr = None
    resync = 0
    while i + 4 <= end:
        hdr = _mpeg_frame_at(blob, i)
        if hdr is None:
            resync += 1
            if resync > max_resync:
                break
            i += 1
            continue
        resync = 0
        if first is None:
            first = hdr
            vbr = _xing_info(blob, i, hdr)
        frames += 1
        samples += hdr["n_samples"]
        bitrates.add(hdr["bitrate"])
        br_sum += hdr["bitrate"]
        i += max(hdr["length"], 4)
    if first is None:
        raise CodecError("no MPEG audio frame found")
    # a Xing/Info first frame is a metadata frame, not audio — exclude it
    # from the frame/sample counts AND from the mean bitrate (r8 ADVICE
    # fix: it previously skewed mean bitrate for short VBR files)
    audio_frames = frames - (1 if vbr and vbr["tag"] in ("Xing", "Info") else 0)
    audio_samples = samples - (first["n_samples"] if audio_frames < frames else 0)
    br_frames = frames
    if audio_frames < frames:
        br_sum -= first["bitrate"]
        br_frames -= 1
    if vbr and vbr.get("frames"):
        audio_frames = vbr["frames"]
        audio_samples = vbr["frames"] * first["n_samples"]
    return {
        "container": "mp3", "version": first["version"],
        "layer": first["layer"], "sample_rate": first["sample_rate"],
        "channels": first["channels"], "n_frames": int(audio_frames),
        "n_samples": int(audio_samples),
        "duration_sec": audio_samples / first["sample_rate"],
        "bitrate_kbps": (br_sum / br_frames / 1000.0) if br_frames else 0.0,
        "is_vbr": len(bitrates) > 1 or (vbr is not None and vbr["tag"] in ("Xing", "VBRI")),
        "vbr_tag": vbr["tag"] if vbr else None,
    }


def parse_audio_metadata(blob: bytes) -> dict:
    """Container metadata WITHOUT PCM decode, for WAV / FLAC / MPEG audio:
    (container, sample_rate, channels, n_samples, duration_sec,
    bitrate_kbps, n_frames, is_vbr). The header-only path a 100 TB
    curation filter runs over crawled audio — duration/bitrate/channel
    gates never need samples. Raises CodecError on unknown containers."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        pos, fmt, data_len = 12, None, None
        while pos + 8 <= len(blob):
            tag = blob[pos:pos + 4]
            (length,) = struct.unpack("<I", blob[pos + 4:pos + 8])
            if tag == b"fmt ":
                fmt = struct.unpack("<HHIIHH", blob[pos + 8:pos + 24])
            elif tag == b"data":
                data_len = length
            pos += 8 + length + (length & 1)
        if fmt is None or data_len is None:
            raise CodecError("WAV missing fmt/data chunk")
        _afmt, n_ch, rate, byte_rate, block, _bits = fmt
        n = data_len // block if block else 0
        return {"container": "wav", "sample_rate": int(rate),
                "channels": int(n_ch), "n_samples": int(n),
                "duration_sec": n / rate if rate else 0.0,
                "bitrate_kbps": byte_rate * 8 / 1000.0,
                "n_frames": int(n), "is_vbr": False}
    if blob[:4] == b"fLaC":
        pos = 4
        while True:
            if pos + 4 > len(blob):
                raise CodecError("FLAC: truncated metadata")
            last = blob[pos] & 0x80
            btype = blob[pos] & 0x7F
            length = int.from_bytes(blob[pos + 1:pos + 4], "big")
            body = blob[pos + 4:pos + 4 + length]
            if btype == 0:
                si = _FlacBitReader(body)
                si.read(16); si.read(16); si.read(24); si.read(24)
                rate = si.read(20)
                n_ch = si.read(3) + 1
                bps = si.read(5) + 1
                total = si.read(36)
                return {"container": "flac", "sample_rate": int(rate),
                        "channels": int(n_ch), "n_samples": int(total),
                        "duration_sec": total / rate if rate else 0.0,
                        "bitrate_kbps": rate * n_ch * bps / 1000.0,
                        "n_frames": int(total), "is_vbr": True}
            pos += 4 + length
            if last:
                break
        raise CodecError("FLAC: missing STREAMINFO")
    meta = parse_mpeg_audio(blob)  # raises CodecError if not MPEG audio
    return {k: meta[k] for k in ("container", "sample_rate", "channels",
                                 "n_samples", "duration_sec",
                                 "bitrate_kbps", "n_frames", "is_vbr")}
