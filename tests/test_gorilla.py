"""Gorilla pack/unpack: round-trip identity + compression accounting."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from diive_spark.compression import gorilla


# ---------------- pure-numpy kernel round trips ----------------

def test_timestamps_regular_grid():
    ts = np.arange(0, 86400, 60, dtype=np.int64) + 1704067200
    blob = gorilla.encode_timestamps(ts)
    np.testing.assert_array_equal(gorilla.decode_timestamps(blob), ts)
    # regular grid -> all delta-of-deltas are 0 -> ~1 bit/point
    assert len(blob) < len(ts) / 4 + 32


def test_timestamps_irregular():
    rng = np.random.default_rng(0)
    ts = np.cumsum(rng.integers(1, 10_000, 500)).astype(np.int64)
    np.testing.assert_array_equal(
        gorilla.decode_timestamps(gorilla.encode_timestamps(ts)), ts
    )


@given(st.lists(st.integers(min_value=-2**40, max_value=2**40), min_size=0, max_size=80))
@settings(max_examples=30, deadline=None)
def test_timestamps_property(xs):
    ts = np.sort(np.array(xs, dtype=np.int64)) if xs else np.empty(0, dtype=np.int64)
    np.testing.assert_array_equal(
        gorilla.decode_timestamps(gorilla.encode_timestamps(ts)), ts
    )


def test_values_round_trip_smooth():
    rng = np.random.default_rng(1)
    v = np.cumsum(rng.normal(0, 0.1, 1000)) + 100.0
    blob = gorilla.encode_values(v)
    np.testing.assert_array_equal(gorilla.decode_values(blob).view(np.uint64),
                                  v.view(np.uint64))


def test_values_constant_compresses_hard():
    v = np.full(1000, 3.14159)
    blob = gorilla.encode_values(v)
    got = gorilla.decode_values(blob)
    np.testing.assert_array_equal(got, v)
    assert len(blob) < 200  # ~1 bit per repeated value


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=0, max_size=60))
@settings(max_examples=40, deadline=None)
def test_values_property_bit_exact(xs):
    v = np.array(xs, dtype=np.float64)
    got = gorilla.decode_values(gorilla.encode_values(v))
    np.testing.assert_array_equal(got.view(np.uint64), v.view(np.uint64))


# ---------------- Spark pack/unpack surface ----------------

@pytest.fixture(scope="module")
def tier_df(spark):
    ts = pd.date_range("2024-01-01", periods=3 * 1440, freq="1min")
    rng = np.random.default_rng(5)
    rows = []
    for key in ["web", "books"]:
        vals = np.round(np.cumsum(rng.normal(0, 0.5, len(ts))) + 50, 2)
        rows.append(pd.DataFrame({"source": key, "window_end": ts, "mean_v": vals}))
    return spark.createDataFrame(pd.concat(rows))


def test_pack_unpack_round_trip(spark, tier_df):
    packed = gorilla.pack_blocks(tier_df, ["source"], "window_end", "mean_v",
                                 block_seconds=86400).cache()
    stats = packed.agg({"raw_bytes": "sum", "packed_bytes": "sum"}).collect()[0]
    ratio = stats["sum(raw_bytes)"] / stats["sum(packed_bytes)"]
    assert ratio > 1.5, f"compression ratio {ratio}"
    assert packed.count() == 2 * 3  # 2 keys x 3 day-blocks

    unpacked = gorilla.unpack_blocks(packed, ["source"]).toPandas()
    orig = tier_df.toPandas()
    orig["ts"] = orig["window_end"].astype("int64") // 10**9
    merged = orig.merge(unpacked, on=["source", "ts"], how="outer",
                        suffixes=("_orig", ""))
    assert len(merged) == len(orig)
    np.testing.assert_array_equal(
        merged["mean_v"].to_numpy().view(np.uint64),
        merged["value"].to_numpy().view(np.uint64),
    )


def test_float32_value_codec_roundtrip_and_width(spark):
    """float32 XOR mode: bit-exact round trip on float32-born values
    (incl. signed zeros / infinities), never larger than the 64-bit codec
    on the same values, and the Spark pack/unpack surface carries the mode.
    Honest note: the 64-bit codec already absorbs float32 trailing zeros
    via its significant-length field, so the 32-bit mode's win is the
    narrower control words + truthful 4-byte raw accounting, not 2x."""
    import numpy as np
    import pandas as pd
    from diive_spark.compression import gorilla as g

    rng = np.random.default_rng(11)
    v = (5 + np.round(rng.normal(0, 1, 4000), 2)).astype(np.float32)
    blob = g.encode_values32(v)
    back = g.decode_values32(blob)
    assert (back.view(np.uint32) == v.view(np.uint32)).all()
    assert len(blob) <= len(g.encode_values(v.astype(np.float64)))
    specials = np.array([0.0, -0.0, np.inf, -np.inf, 1e-38, -1e38, 3.25],
                        np.float32)
    got = g.decode_values32(g.encode_values32(specials))
    assert (got.view(np.uint32) == specials.view(np.uint32)).all()

    ts = pd.date_range("2024-01-01", periods=500, freq="1min")
    pdf = pd.DataFrame({"key": "k", "ts": ts,
                        "v": v[:500].astype(np.float64)})
    packed = g.pack_blocks(spark.createDataFrame(pdf), ["key"], "ts", "v",
                           value_dtype="float32")
    stats = packed.selectExpr("sum(raw_bytes) r", "sum(packed_bytes) p").collect()[0]
    assert stats["r"] == 500 * 12  # 8B ts + 4B float32 value
    back_df = g.unpack_blocks(packed, ["key"], value_dtype="float32") \
        .orderBy("ts").toPandas()
    np.testing.assert_array_equal(
        back_df["value"].to_numpy(np.float64),
        v[:500].astype(np.float64))  # float32 -> double upcast is exact
