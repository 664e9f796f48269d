"""Tier-0 rollup vs a pandas oracle implementing the reference resample
formula (diive/core/times/resampling.py:93-197 semantics: label-right,
count + agg, mincounts gate with floor rule)."""

import numpy as np
import pandas as pd
import pytest

from diive_spark import synth
from diive_spark.operators import resample

N = 10_000


@pytest.fixture(scope="module")
def token_df(spark):
    df = synth.with_event_time(synth.token_table(spark, N, with_tokens=False))
    df = synth.inject_gaps(df)
    return df.select("doc_id", "n_tok", "source", "event_time").cache()


@pytest.fixture(scope="module")
def token_pdf(token_df):
    return token_df.toPandas()


def pandas_rollup(pdf, tier_freq, mincounts_perc=0.0, keys=("source",)):
    """Oracle: per-key label-right resample with diive's relative gate."""
    out = []
    for key, g in pdf.groupby(list(keys)):
        s = g.set_index("event_time")["n_tok"].sort_index()
        r = s.resample(tier_freq, label="right")
        cnt, mean = r.count(), r.mean()
        agg = pd.DataFrame({"cnt": cnt, "mean": mean, "sum": r.sum(),
                            "min": r.min(), "max": r.max()})
        agg = agg[agg["cnt"] > 0]
        if mincounts_perc > 0:
            mc = max(1, int(np.floor(agg["cnt"].max() * mincounts_perc)))
            agg = agg[agg["cnt"] >= mc]
        agg = agg.reset_index().rename(columns={"event_time": "window_end"})
        agg["source"] = key if not isinstance(key, tuple) else key[0]
        out.append(agg)
    return pd.concat(out, ignore_index=True)


def _compare(spark_pdf, oracle_pdf):
    s = spark_pdf.sort_values(["source", "window_end"]).reset_index(drop=True)
    o = oracle_pdf.sort_values(["source", "window_end"]).reset_index(drop=True)
    assert len(s) == len(o), f"{len(s)} windows vs oracle {len(o)}"
    assert (s["source"].to_numpy() == o["source"].to_numpy()).all()
    assert (s["window_end"].to_numpy() == o["window_end"].to_numpy()).all()
    np.testing.assert_array_equal(s["n_tok_cnt"].to_numpy(), o["cnt"].to_numpy())
    np.testing.assert_array_equal(s["n_tok_min"].to_numpy(), o["min"].to_numpy())
    np.testing.assert_array_equal(s["n_tok_max"].to_numpy(), o["max"].to_numpy())
    np.testing.assert_allclose(s["n_tok_sum"].to_numpy(), o["sum"].to_numpy(), rtol=0)
    np.testing.assert_allclose(s["n_tok_mean"].to_numpy(), o["mean"].to_numpy(), rtol=1e-12)


@pytest.mark.parametrize("tier,freq", [("1m", "1min"), ("1h", "1h"), ("1d", "1D")])
def test_rollup_matches_pandas_oracle(token_df, token_pdf, tier, freq):
    got = resample.rollup(
        token_df, "event_time", ["n_tok"], tier, key_cols=["source"]
    ).toPandas()
    _compare(got, pandas_rollup(token_pdf, freq))


def test_rollup_completeness_gate(token_df, token_pdf):
    got = resample.rollup(
        token_df, "event_time", ["n_tok"], "1h", key_cols=["source"], mincounts_perc=0.9
    ).toPandas()
    _compare(got, pandas_rollup(token_pdf, "1h", mincounts_perc=0.9))


def test_gate_floor_rule():
    # resampling.py:167-171 — int(max*perc) but floor to 1 when below 3.
    assert resample.mincounts_rule(30, 0.9) == 27
    assert resample.mincounts_rule(3, 0.9) == 1   # int(2.7)=2 < 3 -> 1
    assert resample.mincounts_rule(1, 0.9) == 1
    assert resample.mincounts_rule(4, 0.9) == 3


def test_label_right_window_membership(spark):
    # A record exactly on a boundary belongs to the window it STARTS
    # (closed='left', resampling.py:174), labelled by window END.
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:30", "2024-01-01 00:01:00"]),
        "v": [1.0, 2.0, 3.0],
    })
    got = (
        resample.rollup(spark.createDataFrame(pdf), "ts", ["v"], "1m")
        .toPandas().sort_values("window_end").reset_index(drop=True)
    )
    assert list(got["v_cnt"]) == [2, 1]
    assert got.loc[0, "window_end"] == pd.Timestamp("2024-01-01 00:01:00")
    assert got.loc[0, "v_sum"] == 3.0 and got.loc[1, "v_sum"] == 3.0


def test_tokens_pass_through_untouched(spark):
    # Per-row invariant vs the reference (BASELINE.json): token arrays are
    # never transformed by the engine — partitioning + write round-trip
    # preserves them bit-for-bit.
    df = synth.with_event_time(synth.token_table(spark, 500, with_tokens=True))
    before = {r["doc_id"]: r["tokens"] for r in df.select("doc_id", "tokens").collect()}
    shuffled = df.repartition(7, "source", "doc_id")
    after = {r["doc_id"]: r["tokens"] for r in shuffled.select("doc_id", "tokens").collect()}
    assert before.keys() == after.keys()
    for k in before:
        assert before[k] == after[k]
    # and n_tok == size(tokens) invariant holds by construction
    from pyspark.sql import functions as F
    bad = df.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0
