"""Physical-plan assertions for the round-5 operators: the joins that
must stay broadcast at scale are broadcast, and the kernels sit behind
exactly one keyed exchange. A regression that silently turns one of
these into a sort-merge join or adds a cartesian product fails here."""

import numpy as np
import pandas as pd

from diive_spark.operators import selfheating, windlag


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_double_rotation_broadcasts_angles(spark):
    pdf = pd.DataFrame({"seg": ["A"] * 50, "rec": range(50),
                        "u": np.random.default_rng(0).normal(3, 1, 50),
                        "v": np.zeros(50), "w": np.zeros(50)})
    plan = _plan(windlag.double_rotation(
        spark.createDataFrame(pdf), ["seg"], "u", "v", "w"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_apply_time_lag_broadcasts_lag_table(spark):
    pdf = pd.DataFrame({"seg": ["A"] * 50, "rec": range(50),
                        "c": np.arange(50.0)})
    lags = pd.DataFrame({"seg": ["A"], "lag_records": [3]})
    plan = _plan(windlag.apply_time_lag(
        spark.createDataFrame(pdf), ["seg"], "rec", ["c"],
        spark.createDataFrame(lags)))
    # the tiny lag table reaches both the row side and the donor side as
    # broadcasts; the rn-offset self-join must not be a cartesian product
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_scop_applicator_broadcasts_sf_and_mdv(spark):
    idx = pd.date_range("2023-06-01", periods=200, freq="30min")
    pdf = pd.DataFrame({
        "site": "A", "ts": idx, "OP": np.zeros(200),
        "FCT_UNSC": np.ones(200), "USTAR": np.linspace(0.01, 1, 200),
        "DAYTIME": (np.arange(200) % 2)})
    sf = pd.DataFrame({
        "site": ["A", "A"], "DAYTIME": [0, 1], "GROUP_CLASSVAR": [0, 0],
        "GROUP_CLASSVAR_MIN": [0.01, 0.01], "SF_MEDIAN": [2.0, 2.0]})
    out = selfheating.scop_applicator(
        spark.createDataFrame(pdf), ["site"], "ts", flux_col="OP",
        fct_col="FCT_UNSC", class_col="USTAR", daytime_col="DAYTIME",
        sf_df=spark.createDataFrame(sf))
    plan = _plan(out)
    # range-join on the SF table and the MDV fallback join both broadcast
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
