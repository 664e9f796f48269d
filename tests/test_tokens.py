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
