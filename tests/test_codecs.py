"""Stdlib PNG/WAV codecs + the multimodal seam decoding REAL encoded bytes."""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from diive_spark.functions import codecs
from diive_spark.operators import multimodal


# --------------------------------------------------------------------------- #
# PNG
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("shape", [(5, 7), (16, 16), (9, 3, 3), (4, 6, 4),
                                   (8, 8, 2)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = codecs.decode_png(codecs.encode_png(img))
    want = img if img.ndim > 2 else img
    assert back.shape == want.shape
    assert np.array_equal(back, want)


def _encode_png_with_filters(img: np.ndarray, ftypes) -> bytes:
    """Independent mini-encoder applying a CHOSEN filter per scanline —
    exercises the decoder's Sub/Up/Average/Paeth unfiltering against the
    spec's forward transforms, written separately from the library codec."""
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = img[y].astype(np.int32)
        enc = np.zeros(w, dtype=np.int32)
        for x in range(w):
            a = cur[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [(1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_png_decoder_unfilters_all_filter_types(ftypes):
    rng = np.random.default_rng(13 + sum(ftypes))
    img = rng.integers(0, 256, size=(12, 10), dtype=np.uint8)
    blob = _encode_png_with_filters(img, ftypes)
    assert np.array_equal(codecs.decode_png(blob), img)


def test_png_rejects_garbage():
    with pytest.raises(codecs.CodecError):
        codecs.decode_png(b"JFIF not a png")
    with pytest.raises(codecs.CodecError):
        codecs.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)


# --------------------------------------------------------------------------- #
# WAV
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("bits,chans", [(16, 1), (16, 2), (8, 1), (32, 1)])
def test_wav_roundtrip(bits, chans):
    rng = np.random.default_rng(bits * 10 + chans)
    lim = {8: 127, 16: 30000, 32: 2**30}[bits]
    shape = (500,) if chans == 1 else (500, chans)
    x = rng.integers(-lim, lim, size=shape).astype(np.float64)
    back, rate = codecs.decode_wav(codecs.encode_wav(x, 16000, bits=bits))
    assert rate == 16000
    assert back.shape == x.shape
    assert np.array_equal(back, x)


def test_wav_rejects_garbage():
    with pytest.raises(codecs.CodecError):
        codecs.decode_wav(b"OggS definitely not wav bytes")


# --------------------------------------------------------------------------- #
# Seam: real encoded bytes through the Spark feature kernels
# --------------------------------------------------------------------------- #
def test_image_features_from_real_png(spark):
    df = multimodal.synth_media_table(spark, n_rows=12, fmt="png")
    out = multimodal.extract_image_features(df).toPandas().set_index("doc_id")
    # the same seeded pixels, independently recomputed
    for i in range(12):
        rng = np.random.default_rng(zlib.crc32(f"img-{i}".encode()) ^ 42)
        w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        row = out.loc[f"img-{i:06d}"]
        assert row["mean_px"] == pytest.approx(float(px.mean()))
        bands = np.array_split(px.astype(np.float32), 8, axis=0)
        assert np.allclose(row["feat"], [b.mean() for b in bands], rtol=1e-6)


def test_audio_features_from_real_wav(spark):
    df = multimodal.synth_audio_table(spark, n_rows=10, fmt="wav")
    out = multimodal.extract_audio_features(df).toPandas().set_index("doc_id")
    for i in range(10):
        rng = np.random.default_rng(zlib.crc32(f"aud-{i}".encode()) ^ 7)
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(sr // 4, sr))
        t = np.arange(n, dtype=np.float64)
        f0 = float(rng.uniform(100, 1000))
        wave = (3000 * np.sin(2 * np.pi * f0 * t / sr)
                + rng.normal(0, 200, n)).astype(np.int16).astype(np.float64)
        row = out.loc[f"aud-{i:06d}"]
        assert row["duration_sec"] == pytest.approx(n / sr)
        assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(wave**2))))
        assert row["peak"] == pytest.approx(float(np.abs(wave).max()))


def test_unknown_formats_still_raise(spark):
    # webp has no stdlib codec -> the DecodeUnavailable seam
    with pytest.raises(multimodal.DecodeUnavailable):
        multimodal._decode_image_bytes(b"RIFF....WEBP", "image/webp", 2, 2)
    with pytest.raises(multimodal.DecodeUnavailable):
        multimodal._decode_audio_bytes(b"ID3 mp3 bytes", "audio/mpeg")
    # malformed JPEG bytes are a codec ERROR, not an unavailable codec
    with pytest.raises(codecs.CodecError):
        multimodal._decode_image_bytes(b"\xff\xd8\xff jpeg!", "image/jpeg", 2, 2)


# --------------------------------------------------------------------------- #
# JPEG (baseline sequential)
# --------------------------------------------------------------------------- #
def _smooth_rgb(h=33, w=41):
    return np.clip(np.stack([
        np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w)),
        np.tile(np.linspace(30, 220, w), (h, 1)),
        np.full((h, w), 90.0)], axis=2), 0, 255).astype(np.uint8)


def test_jpeg_flat_block_exact_at_q100():
    """A constant image has a DC-only spectrum: with unit quantization
    the decode is bit-exact — an independent hand-checkable anchor."""
    img = np.full((16, 24), 130, np.uint8)
    assert np.array_equal(codecs.decode_jpeg(codecs.encode_jpeg(img, 100)),
                          img)


@pytest.mark.parametrize("quality,rmse_max", [(70, 2.0), (90, 1.0),
                                              (100, 0.2)])
def test_jpeg_gray_roundtrip(quality, rmse_max):
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(img, quality))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = dec.astype(float) - img.astype(float)
    assert np.sqrt((err ** 2).mean()) < rmse_max


@pytest.mark.parametrize("subsample,rmse_max", [("444", 2.0), ("420", 4.0)])
def test_jpeg_rgb_roundtrip(subsample, rmse_max):
    img = _smooth_rgb()
    dec = codecs.decode_jpeg(
        codecs.encode_jpeg(img, 90, subsample=subsample))
    assert dec.shape == img.shape
    err = dec.astype(float) - img.astype(float)
    assert np.sqrt((err ** 2).mean()) < rmse_max


def test_jpeg_restart_intervals_roundtrip():
    """DRI + RSTn markers: predictors reset per restart segment."""
    rng = np.random.default_rng(5)
    img = np.clip(rng.normal(128, 40, (24, 40)), 0, 255).astype(np.uint8)
    blob = codecs.encode_jpeg(img, 88, restart_interval=2)
    assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
    dec = codecs.decode_jpeg(blob)
    err = dec.astype(float) - img.astype(float)
    # noise compresses poorly but must still track closely at q88
    assert np.sqrt((err ** 2).mean()) < 12.0
    # identical output to the no-restart encoding of the same image
    dec2 = codecs.decode_jpeg(codecs.encode_jpeg(img, 88))
    assert np.array_equal(dec, dec2)


def test_jpeg_odd_sizes_and_edge_padding():
    """Non-multiple-of-8 (and of-16 for 4:2:0) dims crop correctly."""
    for shape in ((7, 9), (17, 23), (8, 8)):
        img = np.clip(np.add.outer(np.linspace(0, 250, shape[0]),
                                   np.linspace(0, 5, shape[1])),
                      0, 255).astype(np.uint8)
        dec = codecs.decode_jpeg(codecs.encode_jpeg(img, 92))
        assert dec.shape == shape
    rgb = _smooth_rgb(19, 21)
    dec = codecs.decode_jpeg(codecs.encode_jpeg(rgb, 92, subsample="420"))
    assert dec.shape == rgb.shape


_SYSTEM_PROGRESSIVE_JPEGS = [
    # real libjpeg-produced SOF2 files shipped by system packages: genuine
    # cross-implementation fixtures for the progressive decoder
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", (58, 493, 3)),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", (312, 493, 3)),
    ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
     "multi-channel/grayscale.jpg", (215, 300)),
]


def test_jpeg_progressive_decodes_real_libjpeg_files():
    """Cross-implementation check: SOF2 files produced by libjpeg decode
    to plausible images. Between them the three fixtures cover
    non-interleaved DC scans, spectral-selection-only scripts, successive
    approximation (Ah/Al refinement), and EOB runs; any bitstream
    misstep desyncs the Huffman stream catastrophically, so shape +
    pixel-statistics checks are strong evidence."""
    import os
    found = 0
    for path, shape in _SYSTEM_PROGRESSIVE_JPEGS:
        if not os.path.exists(path):
            continue
        found += 1
        with open(path, "rb") as fh:
            blob = fh.read()
        img = codecs.decode_jpeg(blob)
        assert img.shape == shape
        assert img.dtype == np.uint8
        if "white-stripe" in path:  # the content the filename promises
            assert (img > 240).mean() > 0.8
        else:
            assert 50 < img.mean() < 230 and img.std() > 10
        # the seam no longer rejects progressive
        gray = multimodal._decode_image_bytes(
            blob, "image/jpeg", shape[1], shape[0])
        assert gray.shape == shape[:2]
    if not found:
        pytest.skip("no system progressive JPEG available")


def test_jpeg_progressive_roundtrip_bit_identical_to_baseline():
    """Progressive and baseline share the quantization stage, so
    decode(encode(progressive)) must equal decode(encode(baseline))
    BIT-FOR-BIT — this exercises all four progressive scan kinds
    (DC/AC x first/refine), EOB-run encode+decode, and the optimized
    Huffman table builder end-to-end."""
    rng = np.random.default_rng(7)
    base_img = np.add.outer(np.linspace(0, 200, 64), np.linspace(0, 55, 64))
    cases = [
        ("gray", np.clip(base_img, 0, 255).astype(np.uint8), {}),
        ("gray odd", np.clip(base_img[:37, :53], 0, 255).astype(np.uint8),
         {}),
        ("rgb444", _smooth_rgb(48, 40), {"subsample": "444"}),
        ("rgb420 odd", _smooth_rgb(45, 51), {"subsample": "420"}),
        ("flat (long EOB runs)", np.full((80, 80), 130, np.uint8), {}),
        ("noise", rng.integers(0, 256, (32, 32)).astype(np.uint8), {}),
    ]
    for name, img, kw in cases:
        base = codecs.decode_jpeg(codecs.encode_jpeg(img, 85, **kw))
        pb = codecs.encode_jpeg(img, 85, progressive=True, **kw)
        assert pb.find(bytes([0xFF, 0xC2])) > 0, name  # really SOF2
        assert np.array_equal(codecs.decode_jpeg(pb), base), name


def test_jpeg_progressive_stream_uses_eob_runs():
    """A flat image must produce EOBn symbols with r > 0 (runs of 2^r+
    blocks) — the progressive-specific entropy feature — and still decode
    bit-identically."""
    flat = np.full((80, 80), 130, np.uint8)
    pb = codecs.encode_jpeg(flat, 85, progressive=True)
    eobn = set()
    i = 2
    while i + 4 <= len(pb):
        if pb[i] != 0xFF:
            break
        m = pb[i + 1]
        if m == 0xD9:
            break
        (ln,) = struct.unpack(">H", pb[i + 2:i + 4])
        if m == 0xC4:
            data = pb[i + 4:i + 2 + ln]
            p = 0
            while p < len(data):
                tc = data[p] >> 4
                bits = list(data[p + 1:p + 17])
                n = sum(bits)
                vals = list(data[p + 17:p + 17 + n])
                p += 17 + n
                if tc == 1:
                    eobn |= {v for v in vals
                             if (v & 15) == 0 and 0 < (v >> 4) < 15}
        if m == 0xDA:
            j = i + 2 + ln
            while j < len(pb) - 1:
                if pb[j] == 0xFF and pb[j + 1] != 0x00 \
                        and not (0xD0 <= pb[j + 1] <= 0xD7):
                    break
                j += 1
            i = j
            continue
        i += 2 + ln
    assert eobn, "no EOBn (r>0) symbols in a flat progressive stream"
    assert np.array_equal(codecs.decode_jpeg(pb),
                          codecs.decode_jpeg(codecs.encode_jpeg(flat, 85)))


def test_jpeg_non_interleaved_sequential_decodes():
    """A legal SOF0 file with three single-component full-band scans
    (T.81 allows it; some encoders emit it) decodes identically to the
    interleaved baseline encoding of the same pixels."""
    img = _smooth_rgb(45, 51)
    prep = codecs._prep_components(img, 85, "420")
    blob = codecs._encode_multiscan(
        prep, [([0], 0, 63, 0, 0), ([1], 0, 63, 0, 0), ([2], 0, 63, 0, 0)],
        0xC0)
    base = codecs.decode_jpeg(codecs.encode_jpeg(img, 85, subsample="420"))
    assert np.array_equal(codecs.decode_jpeg(blob), base)


def test_jpeg_optimized_huffman_builder_structural():
    """Annex K.2 builder: every table is canonical, complete, length<=16,
    prefix-free (decode-map round-trip), reserved all-ones codeword
    unassigned."""
    rng = np.random.default_rng(0)
    for _ in range(100):
        nsym = int(rng.integers(1, 40))
        syms = rng.choice(256, size=nsym, replace=False)
        freqs = {int(s): int(rng.integers(1, 10000)) for s in syms}
        bits, vals = codecs._build_huffman(freqs)
        assert sum(bits) == len(vals) == len(freqs)
        enc = codecs._huff_encode_map(bits, vals)
        dec = codecs._huff_decode_map(bits, vals)
        maxlen = max(ln for _, ln in enc.values())
        for s, (c, ln) in enc.items():
            assert ln <= 16
            assert dec[(ln, c)] == s
            if ln == maxlen:
                assert c != (1 << ln) - 1 or len(enc) == 1


def test_image_features_from_real_jpeg(spark):
    """REAL JPEG bytes through the Arrow mapInPandas kernel: features must
    track the source pixels within JPEG quantization error."""
    df = multimodal.synth_media_table(spark, n_rows=12, fmt="jpeg")
    out = multimodal.extract_image_features(df, feat_dim=4).toPandas() \
        .set_index("doc_id")
    assert len(out) == 12
    for i in range(12):
        rng = np.random.default_rng(zlib.crc32(f"img-{i}".encode()) ^ 42)
        w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        row = out.loc[f"img-{i:06d}"]
        # uniform noise compresses worst-case; mean survives within ~3 LSB
        assert abs(row["mean_px"] - float(px.mean())) < 3.0
        bands = np.array_split(px.astype(np.float32), 4, axis=0)
        want = np.array([b.mean() for b in bands])
        assert np.abs(np.asarray(row["feat"], dtype=float) - want).max() < 12.0


# --------------------------------------------------------------------------- #
# FLAC (lossless)
# --------------------------------------------------------------------------- #
def _tone(n=9000, sr=16000, seed=5, amp=3000, noise=150):
    rng = np.random.default_rng(seed)
    x = amp * np.sin(2 * np.pi * 330 * np.arange(n) / sr) \
        + rng.normal(0, noise, n)
    return x.astype(np.int64)


@pytest.mark.parametrize("use_lpc,partition_order,block_size", [
    (False, 0, 4096),   # fixed predictors, single partition
    (False, 2, 4096),   # partitioned rice (decoder partition loop)
    (True, 0, 4096),    # LPC subframes
    (True, 3, 1024),    # LPC + partitions + many frames + partial last frame
])
def test_flac_roundtrip_mono_is_lossless(use_lpc, partition_order, block_size):
    x = _tone()
    blob = codecs.encode_flac(x, 16000, use_lpc=use_lpc,
                              partition_order=partition_order,
                              block_size=block_size)
    y, rate = codecs.decode_flac(blob)
    assert rate == 16000
    assert np.array_equal(y.astype(np.int64), x)      # EXACT: lossless
    assert len(blob) < 2 * len(x)                     # actually compresses


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side", "auto"])
def test_flac_stereo_decorrelation_roundtrip(mode):
    x = _tone()
    rng = np.random.default_rng(8)
    st = np.stack([x, (x * 0.7 + rng.normal(0, 40, len(x))).astype(np.int64)],
                  axis=1)
    y, rate = codecs.decode_flac(
        codecs.encode_flac(st, 44100, stereo_mode=mode))
    assert rate == 44100
    assert np.array_equal(y.astype(np.int64), st)


@pytest.mark.parametrize("bits,scale", [(8, 1 / 64), (16, 1), (24, 180)])
def test_flac_bit_depths(bits, scale):
    x = (_tone() * scale).astype(np.int64)
    y, _ = codecs.decode_flac(codecs.encode_flac(x, 48000, bits=bits))
    assert np.array_equal(y.astype(np.int64), x)


def test_flac_subframe_paths():
    # constant
    c = np.full(5000, -7, dtype=np.int64)
    assert np.array_equal(
        codecs.decode_flac(codecs.encode_flac(c, 8000))[0].astype(np.int64), c)
    # wasted bits: every sample a multiple of 8 -> 3 wasted bits
    w = (_tone() // 8) * 8
    assert np.array_equal(
        codecs.decode_flac(codecs.encode_flac(w, 8000))[0].astype(np.int64), w)
    # full-range white noise defeats prediction -> verbatim fallback,
    # still exact
    rng = np.random.default_rng(1)
    v = rng.integers(-32768, 32768, 4000, dtype=np.int64)
    blob = codecs.encode_flac(v, 8000)
    assert np.array_equal(
        codecs.decode_flac(blob)[0].astype(np.int64), v)


def test_flac_structural_conformance():
    x = _tone(5000)
    blob = codecs.encode_flac(x, 16000)
    assert blob[:4] == b"fLaC"
    assert blob[4] == 0x80                      # last-block | STREAMINFO
    assert int.from_bytes(blob[5:8], "big") == 34
    # STREAMINFO: fixed 4096 blocksize, 20-bit rate, mono, 16-bit
    assert int.from_bytes(blob[8:10], "big") == 4096
    rate20 = int.from_bytes(blob[18:21], "big") >> 4
    assert rate20 == 16000
    # first frame: 14-bit sync 0b11111111111110 + reserved 0 + fixed 0
    assert blob[42] == 0xFF and (blob[43] & 0xFC) == 0xF8


def test_flac_integrity_checks():
    x = _tone(5000)
    blob = bytearray(codecs.encode_flac(x, 16000))
    with pytest.raises(codecs.CodecError):
        codecs.decode_flac(b"fLaX" + bytes(blob[4:]))
    # flip one payload byte: some check trips (CRC-8/16, MD5 or desync)
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(codecs.CodecError):
        codecs.decode_flac(bytes(blob))


def test_audio_features_from_real_flac(spark):
    df = multimodal.synth_audio_table(spark, n_rows=8, fmt="flac")
    out = multimodal.extract_audio_features(df).toPandas().set_index("doc_id")
    for i in range(8):
        rng = np.random.default_rng(zlib.crc32(f"aud-{i}".encode()) ^ 7)
        sr = int(rng.choice([8000, 16000]))
        n = int(rng.integers(sr // 4, sr))
        t = np.arange(n, dtype=np.float64)
        f0 = float(rng.uniform(100, 1000))
        wave = (3000 * np.sin(2 * np.pi * f0 * t / sr)
                + rng.normal(0, 200, n)).astype(np.int16).astype(np.float64)
        row = out.loc[f"aud-{i:06d}"]
        assert row["duration_sec"] == pytest.approx(n / sr)
        assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(wave**2))))
        assert row["peak"] == pytest.approx(float(np.abs(wave).max()))


def test_flac_crc_primitives_match_public_check_values():
    """The FLAC header/frame CRCs against the public CRC catalog check
    values (input b"123456789"): poly 0x07 init 0 non-reflected =
    CRC-8/SMBUS -> 0xF4; poly 0x8005 init 0 non-reflected =
    CRC-16/UMTS -> 0xFEE8. External evidence (not a self-round-trip) that
    the integrity primitives are the spec's."""
    assert codecs._crc8(b"123456789") == 0xF4
    assert codecs._crc16(b"123456789") == 0xFEE8


def test_jpeg_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker.
    Inserting fills before every header segment must not change the
    decode (ADVICE r6: the marker loop previously raised 'sync lost')."""
    img = _smooth_rgb(17, 23)
    blob = codecs.encode_jpeg(img, 90)
    # re-assemble with two fill bytes before each post-SOI marker segment
    out = bytearray(blob[:2])
    i = 2
    while i + 4 <= len(blob):
        marker = blob[i + 1]
        if marker == 0xDA:  # SOS: keep the rest verbatim (entropy data)
            out += b"\xff\xff" + blob[i:]
            break
        (seg_len,) = struct.unpack(">H", blob[i + 2:i + 4])
        out += b"\xff\xff" + blob[i:i + 2 + seg_len]
        i += 2 + seg_len
    assert np.array_equal(codecs.decode_jpeg(bytes(out)),
                          codecs.decode_jpeg(blob))


def test_jpeg_scan_with_unknown_component_rejected():
    """Non-interleaved scans decode for real since r7
    (test_jpeg_non_interleaved_sequential_decodes); what must still raise
    is a scan naming a component id the frame never declared."""
    sof = struct.pack(">BHHB", 8, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    sos = bytes([1, 0x11, 0, 0, 63, 0])  # ns=1, cs=0x11: undeclared id
    blob = (b"\xff\xd8"
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    with pytest.raises(codecs.CodecError, match="unknown component"):
        codecs.decode_jpeg(blob)


def test_flac_zero_frames_returns_streaminfo_rate():
    """A valid stream with metadata but zero audio frames decodes to an
    empty sample array at the STREAMINFO rate instead of raising
    NameError (ADVICE r6)."""
    enc = codecs.encode_flac(_tone(n=2000), 16000)
    hdr = bytearray(enc[:42])          # fLaC + block header + STREAMINFO
    hdr[4] |= 0x80                     # mark STREAMINFO as the last block
    body = bytearray(hdr[8:42])
    body[13] &= 0xF0                   # total-samples := 0 (unknown)
    body[14:18] = b"\x00\x00\x00\x00"
    body[18:34] = b"\x00" * 16         # MD5 unset -> verify skipped
    samples, rate = codecs.decode_flac(bytes(hdr[:8]) + bytes(body))
    assert rate == 16000
    assert samples.shape[0] == 0


# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame parser — spec-derived fixtures
# ---------------------------------------------------------------------------

def _mp3_frame(version="1", layer=3, bitrate_kbps=128, rate=44100,
               padding=0, mono=False, payload=None):
    """Construct one spec-valid MPEG audio frame (header + filler payload).
    Header fields and the length formula are computed HERE, independently,
    so the parser is checked against a second derivation of the spec."""
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    lbits = 4 - layer
    rates = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
             0: (11025, 12000, 8000)}[vbits]
    sr_idx = rates.index(rate)
    table = {
        (3, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
        (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
        (3, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
        (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
        (0, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    }[(vbits, layer)]
    br_idx = table.index(bitrate_kbps)
    b1 = 0xE0 | (vbits << 3) | (lbits << 1) | 1      # no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = 0xC0 if mono else 0x00
    if layer == 1:
        length = (12 * bitrate_kbps * 1000 // rate + padding) * 4
    else:
        factor = 144 if (vbits == 3 or layer == 2) else 72
        length = factor * bitrate_kbps * 1000 // rate + padding
    body = payload if payload is not None else bytes(length - 4)
    return bytes([0xFF, b1, b2, b3]) + body[:length - 4].ljust(length - 4, b"\x00")


def test_mpeg_parser_cbr_geometry_and_duration():
    blob = b"".join(_mp3_frame(padding=i % 2) for i in range(20))
    m = codecs.parse_mpeg_audio(blob)
    assert (m["version"], m["layer"]) == ("1", 3)
    assert (m["sample_rate"], m["channels"]) == (44100, 2)
    assert m["n_frames"] == 20 and m["n_samples"] == 20 * 1152
    assert m["duration_sec"] == pytest.approx(20 * 1152 / 44100)
    assert m["bitrate_kbps"] == pytest.approx(128.0)
    assert not m["is_vbr"] and m["vbr_tag"] is None


@pytest.mark.parametrize("version,layer,kbps,rate,nsamp,length", [
    ("1", 1, 192, 48000, 384, (12 * 192000 // 48000) * 4),
    ("1", 2, 160, 44100, 1152, 144 * 160000 // 44100),
    ("2", 3, 64, 22050, 576, 72 * 64000 // 22050),
    ("2.5", 3, 32, 11025, 576, 72 * 32000 // 11025),
])
def test_mpeg_parser_layer_version_matrix(version, layer, kbps, rate,
                                          nsamp, length):
    frame = _mp3_frame(version=version, layer=layer, bitrate_kbps=kbps,
                       rate=rate)
    assert len(frame) == length  # fixture itself honors the spec formula
    m = codecs.parse_mpeg_audio(frame * 7)
    assert (m["version"], m["layer"], m["sample_rate"]) == (version, layer, rate)
    assert m["n_frames"] == 7 and m["n_samples"] == 7 * nsamp


def test_mpeg_parser_id3_xing_and_vbr():
    # ID3v2 (syncsafe size 300) + Xing first frame + 5 audio frames,
    # trailing ID3v1 'TAG' block
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 300 >> 7, 300 & 0x7F]) + bytes(300)
    xing_payload = bytes(32) + b"Xing" + (3).to_bytes(4, "big") \
        + (500).to_bytes(4, "big") + (209000).to_bytes(4, "big")
    first = _mp3_frame(payload=xing_payload)
    audio = b"".join(_mp3_frame(bitrate_kbps=k)
                     for k in (112, 128, 160, 128, 96))
    blob = id3 + first + audio + b"TAG" + bytes(125)
    m = codecs.parse_mpeg_audio(blob)
    assert m["vbr_tag"] == "Xing" and m["is_vbr"]
    # Xing frame count wins over the walked count
    assert m["n_frames"] == 500
    assert m["duration_sec"] == pytest.approx(500 * 1152 / 44100)
    # mean bitrate excludes the Xing METADATA frame (r8 ADVICE fix):
    # only the five audio frames contribute
    assert m["bitrate_kbps"] == pytest.approx((112 + 128 + 160 + 128 + 96) / 5)


def test_mpeg_parser_short_blob_tag_guard():
    # blobs under 128 bytes must not wrap the ID3v1 slice (r8 ADVICE fix):
    # a single valid frame shorter than 128 bytes still parses
    frame = _mp3_frame(version="2.5", bitrate_kbps=8, rate=8000, mono=True)
    assert len(frame) < 128
    m = codecs.parse_mpeg_audio(frame)
    assert m["n_frames"] == 1 and m["channels"] == 1


def test_mpeg_parser_real_third_party_mp3():
    """Cross-implementation check on a REAL encoder-produced MP3 shipped
    by a system package (MPEG-2 Layer III, 22.05 kHz mono CBR). The
    external consistency proof: file size must equal bitrate x duration
    derived purely from the walked frame geometry."""
    import os
    path = ("/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
            "test_data/test.mp3")
    if not os.path.exists(path):
        pytest.skip("no system MP3 available")
    with open(path, "rb") as fh:
        blob = fh.read()
    m = codecs.parse_mpeg_audio(blob)
    assert (m["version"], m["layer"]) == ("2", 3)
    assert (m["sample_rate"], m["channels"]) == (22050, 1)
    assert m["n_samples"] == m["n_frames"] * 576
    assert m["duration_sec"] == pytest.approx(m["n_samples"] / 22050)
    # every byte accounted for: 45 frames x 64 kbps at 22.05 kHz
    assert len(blob) == pytest.approx(
        m["bitrate_kbps"] * 1000 * m["duration_sec"] / 8, rel=0.01)
    meta = codecs.parse_audio_metadata(blob)
    assert meta["container"] == "mp3" and not meta["is_vbr"]


def test_mpeg_parser_resync_and_garbage():
    blob = bytes(100) + _mp3_frame(mono=True) + bytes(33) + _mp3_frame(mono=True)
    m = codecs.parse_mpeg_audio(blob)
    assert m["n_frames"] == 2 and m["channels"] == 1
    with pytest.raises(codecs.CodecError, match="no MPEG audio frame"):
        codecs.parse_mpeg_audio(bytes(4096))


def test_parse_audio_metadata_wav_flac_cross_checked():
    x = _tone(n=12000, sr=16000)
    wav = codecs.encode_wav(x, 16000)
    flac = codecs.encode_flac(x, 16000)
    mw = codecs.parse_audio_metadata(wav)
    assert (mw["container"], mw["sample_rate"], mw["channels"]) == ("wav", 16000, 1)
    assert mw["n_samples"] == 12000
    assert mw["duration_sec"] == pytest.approx(0.75)
    assert mw["bitrate_kbps"] == pytest.approx(16000 * 2 * 8 / 1000)
    mf = codecs.parse_audio_metadata(flac)
    assert (mf["container"], mf["n_samples"]) == ("flac", 12000)
    assert mf["duration_sec"] == pytest.approx(0.75)
    with pytest.raises(codecs.CodecError):
        codecs.parse_audio_metadata(b"\x00" * 64)


def test_extract_audio_metadata_operator_mixed_containers(spark):
    """The no-decode curation operator over a mixed WAV/FLAC/MP3 table —
    every MP3 flows through (only PCM decode remains behind the seam)."""
    x = _tone(n=8000, sr=8000)
    rows = [
        ("w0", bytearray(codecs.encode_wav(x, 8000)), "audio/wav", 8000, 8000),
        ("f0", bytearray(codecs.encode_flac(x, 8000)), "audio/flac", 8000, 8000),
        ("m0", bytearray(b"".join(_mp3_frame() for _ in range(10))),
         "audio/mpeg", 44100, 0),
        ("m1", bytearray(b"".join(_mp3_frame(version="2", bitrate_kbps=64,
                                             rate=22050, mono=True)
                                  for _ in range(4))),
         "audio/mpeg", 22050, 0),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.AUDIO_SCHEMA)
    out = multimodal.extract_audio_metadata(df).toPandas().set_index("doc_id")
    assert out.loc["w0", "container"] == "wav"
    assert out.loc["f0", "n_samples"] == 8000
    assert out.loc["m0", "n_frames"] == 10
    assert out.loc["m0", "duration_sec"] == pytest.approx(10 * 1152 / 44100)
    assert out.loc["m1", "channels"] == 1
    assert out.loc["m1", "sample_rate"] == 22050
    # PCM decode for MP3 is still the documented seam
    mp3_rows = df.filter("doc_id = 'm0'")
    with pytest.raises(Exception, match="no decoder for 'audio/mpeg'"):
        multimodal.extract_audio_features(mp3_rows).collect()


def test_extract_audio_metadata_bad_blob_flagged_not_fatal(spark):
    """A pure-garbage blob yields a NULL-container row instead of failing
    the stage (r8 ADVICE fix): crawled audio is routinely truncated."""
    x = _tone(n=4000, sr=8000)
    rows = [
        ("ok", bytearray(codecs.encode_wav(x, 8000)), "audio/wav", 8000, 4000),
        ("bad", bytearray(b"\x00\x01" * 600), "audio/mpeg", 0, 0),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.AUDIO_SCHEMA)
    out = multimodal.extract_audio_metadata(df).toPandas().set_index("doc_id")
    assert out.loc["ok", "container"] == "wav"
    assert pd.isna(out.loc["bad", "container"])
    assert pd.isna(out.loc["bad", "duration_sec"])
