"""Token-stat paths: JVM array vs packed-binary numpy kernel equality +
bit-exact pack/unpack round trip (the per-row invariant)."""

import numpy as np
import pytest

from diive_spark import synth
from diive_spark.operators import tokens


@pytest.fixture(scope="module")
def tok(spark):
    return synth.with_event_time(synth.token_table(spark, 800, with_tokens=True)).cache()


def test_binary_roundtrip_bit_exact(tok):
    packed = tokens.pack_tokens_to_binary(tok)
    back = tokens.unpack_tokens_from_binary(packed)
    orig = {r["doc_id"]: r["tokens"] for r in tok.select("doc_id", "tokens").collect()}
    got = {r["doc_id"]: r["tokens"] for r in back.select("doc_id", "tokens").collect()}
    assert orig.keys() == got.keys()
    for k in orig:
        assert orig[k] == got[k]


def test_stats_paths_agree(tok):
    jvm = tokens.token_stats(tok).select("doc_id", "tok_min", "tok_max", "tok_sum").toPandas()
    binary = tokens.token_stats_binary(tokens.pack_tokens_to_binary(tok)).select(
        "doc_id", "tok_min", "tok_max", "tok_sum"
    ).toPandas()
    jvm = jvm.sort_values("doc_id").reset_index(drop=True)
    binary = binary.sort_values("doc_id").reset_index(drop=True)
    for c in ["tok_min", "tok_max", "tok_sum"]:
        np.testing.assert_array_equal(jvm[c].to_numpy(), binary[c].to_numpy(), err_msg=c)


def test_uint16_packing_roundtrip_stats_and_size(tok, spark):
    """16-bit packing (vocab < 65536): bit-exact round trip, identical
    stats, and exactly half the bytes of the int32 layout."""
    import pandas as pd

    p32 = tokens.pack_tokens_to_binary(tok)
    p16 = tokens.pack_tokens_to_binary(tok, dtype="uint16")
    back = tokens.unpack_tokens_from_binary(p16, dtype="uint16")
    orig = {r["doc_id"]: r["tokens"] for r in tok.select("doc_id", "tokens").collect()}
    got = {r["doc_id"]: r["tokens"] for r in back.select("doc_id", "tokens").collect()}
    assert orig == got
    s32 = tokens.token_stats_binary(p32).select(
        "doc_id", "tok_min", "tok_max", "tok_sum").toPandas().sort_values("doc_id")
    s16 = tokens.token_stats_binary(p16, dtype="uint16").select(
        "doc_id", "tok_min", "tok_max", "tok_sum").toPandas().sort_values("doc_id")
    for c in ["tok_min", "tok_max", "tok_sum"]:
        np.testing.assert_array_equal(s16[c].to_numpy(), s32[c].to_numpy(), err_msg=c)
    sizes = (
        p32.select(F_length("tokens_bin").alias("b32"), "doc_id")
        .join(p16.select(F_length("tokens_bin").alias("b16"), "doc_id"), "doc_id")
        .selectExpr("sum(b32) s32", "sum(b16) s16").collect()[0]
    )
    assert sizes["s32"] == 2 * sizes["s16"]
    # out-of-range vocab is rejected, not silently truncated
    bad = spark.createDataFrame(pd.DataFrame({"doc_id": ["d"], "tokens": [[70000]]}))
    with pytest.raises(Exception, match="uint16|PYTHON"):
        tokens.pack_tokens_to_binary(bad, dtype="uint16").collect()


def F_length(c):
    from pyspark.sql import functions as F
    return F.length(c)
