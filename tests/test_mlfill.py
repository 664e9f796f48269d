"""Tree-ensemble gap-fill (operators/mlfill.py) — Spark MLlib RF/GBT."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import mlfill


def _make_data(n_days=20, seed=3, gap_frac=0.15, n_keys=2):
    rng = np.random.default_rng(seed)
    frames = []
    for ki in range(n_keys):
        n = n_days * 24
        ts = pd.date_range("2024-02-01", periods=n, freq="1h")
        hod = ts.hour.to_numpy().astype(float)
        driver = 10 + 8 * np.sin(2 * np.pi * np.arange(n) / (24 * 5)) \
            + rng.normal(0, 0.5, n)
        # nonlinear target: tree models should beat a line on this
        level = 5.0 * (ki + 1)
        truth = level + np.where(driver > 10, 4.0, -2.0) \
            + 3 * np.sin(2 * np.pi * hod / 24.0)
        value = truth + rng.normal(0, 0.3, n)
        gaps = rng.random(n) < gap_frac
        obs = value.copy()
        obs[gaps] = np.nan
        frames.append(pd.DataFrame({
            "key": f"k{ki}", "ts": ts, "value": obs, "driver": driver,
            "truth": truth}))
    return pd.concat(frames, ignore_index=True)


@pytest.mark.parametrize("model", ["random_forest", "gbt"])
def test_tree_fill_recovers_nonlinear_truth(spark, model):
    pdf = _make_data()
    df = spark.createDataFrame(pdf.drop(columns=["truth"]))
    out = mlfill.tree_model_fill(
        df, ["key"], "ts", "value", feature_cols=["driver"], model=model,
        seed=7).toPandas().merge(pdf[["key", "ts", "truth"]], on=["key", "ts"])
    gaps = out["value"].isna()
    filled_gaps = out.loc[gaps]
    # every gap with features present is filled, flagged 4
    assert filled_gaps["filled"].notna().all()
    assert (filled_gaps["fill_flag"] == 4).all()
    assert (filled_gaps["fill_granular"] // 1000 == 4).all()
    # observed rows untouched, flag 0
    obs = out.loc[~gaps]
    assert np.allclose(obs["filled"], obs["value"])
    assert (obs["fill_flag"] == 0).all()
    # fills track the nonlinear truth well (a line cannot: step + level)
    err = np.abs(filled_gaps["filled"] - filled_gaps["truth"])
    assert np.median(err) < 1.0


def test_tree_fill_beats_linear_on_step_response(spark):
    from diive_spark.operators import gapfill
    pdf = _make_data(seed=11)
    df = spark.createDataFrame(pdf.drop(columns=["truth"]))
    tree = mlfill.tree_model_fill(
        df, ["key"], "ts", "value", feature_cols=["driver"],
        seed=7).toPandas().merge(pdf[["key", "ts", "truth"]], on=["key", "ts"])
    lin = gapfill.linear_model_fill(
        df, ["key"], "ts", "value", feature_cols=["driver"],
    ).toPandas().merge(pdf[["key", "ts", "truth"]], on=["key", "ts"])
    gaps = tree["value"].isna()
    te = np.abs(tree.loc[gaps, "filled"] - tree.loc[gaps, "truth"]).median()
    le = np.abs(lin.loc[gaps, "filled"] - lin.loc[gaps, "truth"]).median()
    assert te < le * 0.8, (te, le)


def test_tree_fill_holdout_scores_and_min_train(spark):
    pdf = _make_data(n_days=15, seed=5)
    df = spark.createDataFrame(pdf.drop(columns=["truth"]))
    out, scores = mlfill.tree_model_fill(
        df, ["key"], "ts", "value", feature_cols=["driver"],
        test_size=0.25, with_scores=True, seed=1)
    s = scores.toPandas().iloc[0]
    assert s["n"] > 50
    assert s["r2"] > 0.8          # nonlinear truth, tree model: high skill
    assert s["rmse"] < 1.5
    # min_train: starving the training set passes the frame through
    tiny = spark.createDataFrame(pdf.drop(columns=["truth"]).head(10))
    out2 = mlfill.tree_model_fill(
        tiny, ["key"], "ts", "value", feature_cols=["driver"],
        min_train=1000).toPandas()
    assert "filled" not in out2.columns or out2["filled"].isna().all()


def test_tree_fill_never_overwrites_prior_fills(spark):
    from diive_spark.operators import gapfill
    pdf = _make_data(n_days=10, seed=9)
    df = spark.createDataFrame(pdf.drop(columns=["truth"]))
    first = gapfill.linear_interpolation(
        df, ["key"], "ts", "value", tier_seconds=3600, limit=2)
    both = mlfill.tree_model_fill(
        first, ["key"], "ts", "value", feature_cols=["driver"],
        seed=3).toPandas()
    interp_rows = both["fill_flag"] == 1
    assert interp_rows.any()                  # some interp fills existed
    tree_rows = both["fill_flag"] == 4
    assert tree_rows.any()                    # tree serves the leftovers
    # interp fills kept their values and flags (never overwritten)
    assert both.loc[interp_rows, "filled"].notna().all()


def test_reduce_features_and_quick_fill(spark):
    pdf = _make_data(n_days=12, seed=21)
    # add a pure-noise feature: reduce_features should drop it
    rng = np.random.default_rng(0)
    pdf["noise"] = rng.normal(0, 1, len(pdf))
    df = spark.createDataFrame(pdf.drop(columns=["truth"]))
    out = mlfill.tree_model_fill(
        df, ["key"], "ts", "value", feature_cols=["driver", "noise"],
        reduce_features_below=0.02, seed=5).toPandas()
    gaps = out["value"].isna()
    assert out.loc[gaps, "filled"].notna().all()
    assert (out.loc[gaps, "fill_flag"] == 4).all()

    quick = mlfill.quick_fill(df, ["key"], "ts", "value", seed=5).toPandas()
    qgaps = quick["value"].isna()
    # lag-1 exists for most gap rows; those get filled
    assert quick.loc[qgaps, "filled"].notna().mean() > 0.5
    assert "_lag1" not in quick.columns


def test_longterm_tree_fill_per_year_models(spark):
    # two years with DIFFERENT response regimes: per-year models must adapt
    rng = np.random.default_rng(31)
    frames = []
    for year, gain in ((2022, 1.0), (2023, -1.0)):
        n = 40 * 24
        ts = pd.date_range(f"{year}-03-01", periods=n, freq="1h")
        driver = 10 + 5 * np.sin(2 * np.pi * np.arange(n) / 120) \
            + rng.normal(0, 0.4, n)
        truth = 3.0 + gain * np.where(driver > 10, 4.0, -1.0)
        value = truth + rng.normal(0, 0.3, n)
        gaps = rng.random(n) < 0.15
        obs = value.copy()
        obs[gaps] = np.nan
        frames.append(pd.DataFrame({
            "key": "k", "ts": ts, "value": obs, "driver": driver,
            "truth": truth}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf.drop(columns=["truth"]))
    out = mlfill.longterm_tree_fill(
        df, ["key"], "ts", "value", feature_cols=["driver"], n_neighbors=0,
        seed=13).toPandas().merge(pdf[["ts", "truth"]], on="ts")
    gaps = out["value"].isna()
    assert out.loc[gaps, "filled"].notna().all()
    err = np.abs(out.loc[gaps, "filled"] - out.loc[gaps, "truth"])
    # a single shared model cannot satisfy both regimes; per-year ones can
    assert np.median(err) < 1.0
    assert len(out) == len(pdf)
