"""BPE tokenizer: trainer parity vs an independent oracle, exact
round-trips on the documents corpus, plan shape (encode must be a pure
projection), and the token-table integration into the rollup cascade."""

import collections

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import bpe


# --------------------------------------------------------------------------
# independent oracle: a from-first-principles BPE trainer/encoder written
# against the published algorithm (Counter-based, different structure from
# the operator's implementation) so the test is not the code testing itself
# --------------------------------------------------------------------------

def oracle_train(word_freqs, num_merges):
    segs = {w: [*w, bpe.EOW] for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts = collections.Counter()
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        counts = {p: c for p, c in counts.items() if c > 1}
        if not counts:
            break
        best_count = max(counts.values())
        best = min(p for p, c in counts.items() if c == best_count)
        merges.append(best)
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_trainer_matches_independent_oracle():
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 2}
    merges, segs = oracle_train(wf, 10)
    got = bpe._train_merges(wf, 10)
    assert got == merges
    # the operator's encoder must segment the training words exactly as the
    # oracle's training segmentation (greedy rank walk == training merges
    # applied in order, for words seen in training)
    ranks = {p: i for i, p in enumerate(got)}
    for w in wf:
        assert bpe._encode_word(w, ranks) == segs[w], w


def test_merge_word_nonoverlapping():
    assert bpe._merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert bpe._merge_word(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")


def test_train_encode_decode_roundtrip_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = bpe.train_bpe(docs, num_merges=150)
    assert len(tok.merges) > 0
    # ids are dense, stable, <unk> reserved at 0
    assert tok.vocab["<unk>"] == bpe.UNK_ID
    assert sorted(tok.vocab.values()) == list(range(len(tok.vocab)))

    enc = bpe.encode(docs, tok)
    out = bpe.decode(enc, tok).select("doc_id", "text", "decoded", "tokens") \
        .toPandas()
    # corpus alphabet == training alphabet -> every doc round-trips exactly
    assert (out["decoded"] == out["text"]).all()
    # merges actually compress: fewer tokens than characters
    n_tok = out["tokens"].map(len)
    n_chars = out["text"].map(len)
    assert (n_tok < n_chars).all()
    assert not out["tokens"].map(lambda ids: bpe.UNK_ID in ids).any()


def test_encode_unknown_chars_to_unk(spark):
    train = spark.createDataFrame(pd.DataFrame({"text": ["ab ab ab b"]}))
    tok = bpe.train_bpe(train, num_merges=5)
    df = spark.createDataFrame(pd.DataFrame({"text": ["ab zz"]}))
    ids = bpe.encode(df, tok).toPandas()["tokens"].iloc[0]
    assert bpe.UNK_ID in list(ids)  # 'z' never seen
    dec = bpe.decode(bpe.encode(df, tok), tok).toPandas()["decoded"].iloc[0]
    assert dec.startswith("ab")  # known prefix survives


def test_training_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t1 = bpe.train_bpe(docs, num_merges=40)
    t2 = bpe.train_bpe(docs, num_merges=40)
    assert t1.merges == t2.merges
    assert t1.vocab == t2.vocab


def test_encode_plan_is_pure_projection(spark):
    """The 100 TB encode path must be a single stateless projection: no
    Exchange (shuffle) anywhere in the encode plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = bpe.train_bpe(docs, num_merges=20)
    plan = bpe.encode(docs, tok)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time


def test_token_table_feeds_rollup(spark):
    """documents -> BPE token table (the north-star ingest shape) ->
    1m rollup; count/sum per window must equal a pandas recompute."""
    from diive_spark.operators import resample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = bpe.train_bpe(docs, num_merges=50)
    tt = bpe.encode_to_token_table(docs, tok)
    assert dict(tt.dtypes) == {"doc_id": "bigint", "tokens": "array<int>",
                               "n_tok": "int", "source": "string"}
    # deterministic synthetic event times: one doc per 10 s from a fixed epoch
    tt = tt.withColumn(
        "event_time",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 10))
    rolled = resample.rollup(tt, "event_time", ["n_tok"], "1m",
                             key_cols=["source"]).toPandas()
    pdf = tt.select("doc_id", "n_tok", "source", "event_time").toPandas()
    pdf["w"] = pdf["event_time"].dt.floor("1min")
    want = pdf.groupby(["source", "w"])["n_tok"].agg(["count", "sum"])
    got = rolled.set_index(["source", "window_start"])
    assert len(got) == len(want)
    for (src, w), row in want.iterrows():
        g = got.loc[(src, w)]
        assert g["n_tok_cnt"] == row["count"]
        assert g["n_tok_sum"] == row["sum"]
