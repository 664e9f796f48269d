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
