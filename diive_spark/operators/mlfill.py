"""Tree-ensemble model gap-fill via Spark MLlib — the RandomForestTS /
XGBoostTS class of fills, in-engine.

The reference's headline gap-fillers train a tree-ensemble regressor on
observed rows (driver + timestamp features) and predict the gaps
(/root/reference/diive/gapfilling/randomforest_ts.py:32 ``RandomForestTS``,
xgboost_ts.py, over /root/reference/diive/core/ml/common.py:36
``MlRegressorGapFillingBase``: train → holdout scores → predict gaps →
flag, never overwrite). Earlier rounds shipped the closed-form
``linear_model_fill`` analogue and documented sklearn/XGBoost as excluded
runtimes; this module closes the remaining quality gap with Spark's OWN
distributed tree ensembles (``pyspark.ml`` RandomForestRegressor /
GBTRegressor — JVM-side, no Python in the training loop, no external
dependency).

Design for 100 TB (deliberate divergence, documented): the reference fits
one sklearn forest PER SERIES in driver memory; this engine fits ONE
distributed ensemble over all keys, with the per-key level supplied as a
feature (the observed per-key target mean — scalable to millions of keys,
no categorical-cardinality limits). Training is a Spark ML job (sampled
aggregates over the cluster); prediction is a pure JVM transform.

Fill semantics shared with the rest of the cascade (gapfill.py): only
still-missing slots with all features present are filled, flag
``FLAG_MODEL`` (4), granular ``4000 + min(n_train, 999)``; observed and
previously-filled values are never overwritten.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.operators.gapfill import FLAG_MODEL, FLAG_OBSERVED


def tree_model_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    feature_cols: list[str] | None = None,
    add_timestamp_features: bool = True,
    model: str = "random_forest",
    num_trees: int = 20,
    max_depth: int = 8,
    max_iter: int = 20,
    subsampling_rate: float = 1.0,
    min_train: int = 24,
    test_size: float = 0.0,
    seed: int = 42,
    reduce_features_below: float | None = None,
    filled_col: str = "filled",
    flag_col: str = "fill_flag",
    granular_col: str = "fill_granular",
    with_scores: bool = False,
):
    """Gap-fill ``value_col`` with a distributed tree ensemble.

    ``model``: ``'random_forest'`` (RandomForestTS analogue) or ``'gbt'``
    (gradient-boosted trees, the XGBoostTS analogue). Features =
    ``feature_cols`` + cyclic timestamp features (sin/cos hour-of-day and
    day-of-year — the reference's .timestamp-features set, common.py:1175)
    + the per-key observed mean (key level encoding).

    ``test_size > 0`` holds out that seeded fraction of observed rows from
    training; with ``with_scores=True`` the return value is
    ``(filled_df, scores_df)`` where scores_df carries the reference's
    seven holdout metrics (gapfill.prediction_scores) on the holdout rows.
    Training requires ``min_train`` observed feature-complete rows
    (globally — one model); below that the frame passes through unfilled.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor, RandomForestRegressor

    feature_cols = list(feature_cols or [])
    feats: list = [F.col(c).cast("double").alias(f"_f_{c}")
                   for c in feature_cols]
    fnames = [f"_f_{c}" for c in feature_cols]
    if add_timestamp_features:
        hour = F.hour(ts_col) + F.minute(ts_col) / 60.0
        doy = F.dayofyear(ts_col).cast("double")
        feats += [
            F.sin(2 * math.pi * hour / 24.0).alias("_f_hsin"),
            F.cos(2 * math.pi * hour / 24.0).alias("_f_hcos"),
            F.sin(2 * math.pi * doy / 365.25).alias("_f_dsin"),
            F.cos(2 * math.pi * doy / 365.25).alias("_f_dcos"),
        ]
        fnames += ["_f_hsin", "_f_hcos", "_f_dsin", "_f_dcos"]
    if not fnames:
        raise ValueError(
            "no features: pass feature_cols or enable timestamp features")

    work = df.select("*", *feats)
    v = F.col(value_col).cast("double")

    # per-key level encoding: observed target mean (broadcast join back) —
    # scales to arbitrary key cardinality, unlike indexed categoricals
    key_means = (
        work.filter(v.isNotNull())
        .groupBy(*key_cols).agg(F.avg(v).alias("_f_keymean"))
    )
    work = work.join(F.broadcast(key_means), on=key_cols, how="left")
    fnames = [*fnames, "_f_keymean"]

    all_feats_nn = None
    for n in fnames:
        c = F.col(n).isNotNull() & ~F.isnan(F.col(n))
        all_feats_nn = c if all_feats_nn is None else (all_feats_nn & c)

    featdf = work.filter(all_feats_nn)
    assembler = VectorAssembler(inputCols=fnames, outputCol="_fvec")
    assembled = assembler.transform(featdf)

    observed = assembled.filter(v.isNotNull()).withColumn("_label", v)
    if test_size > 0.0:
        observed = observed.withColumn(
            "_holdout", F.rand(seed) < F.lit(test_size))
        train = observed.filter(~F.col("_holdout"))
        holdout = observed.filter(F.col("_holdout"))
    else:
        train, holdout = observed, None

    # MLlib tree training runs one job per tree-depth level over the
    # training partitions; after the upstream aggregates AQE often leaves
    # this frame on ONE partition, serialising every level job on a
    # single core. Spread it (bounded: ≥5k rows per partition so tiny
    # frames don't drown in task overhead) and cache — the dozens of
    # level jobs each rescan it.
    sc = df.sparkSession.sparkContext
    n_train = train.count()
    n_parts = int(max(1, min(sc.defaultParallelism, n_train // 5000)))
    if train.rdd.getNumPartitions() < n_parts:
        train = train.repartition(n_parts)
    train = train.cache()
    if n_train < min_train:
        out = work.drop(*fnames)
        if flag_col not in df.columns:
            out = out.withColumn(
                flag_col,
                F.when(v.isNotNull(), F.lit(FLAG_OBSERVED)).cast("int"))
        if with_scores:
            return out, None
        return out

    def _make_reg():
        if model == "random_forest":
            return RandomForestRegressor(
                featuresCol="_fvec", labelCol="_label", predictionCol="_pred",
                numTrees=num_trees, maxDepth=max_depth, seed=seed,
                subsamplingRate=subsampling_rate)
        if model == "gbt":
            return GBTRegressor(
                featuresCol="_fvec", labelCol="_label", predictionCol="_pred",
                maxIter=max_iter, maxDepth=max_depth, seed=seed,
                subsamplingRate=subsampling_rate)
        raise ValueError(f"unknown model {model!r}")

    fitted = _make_reg().fit(train)
    train.unpersist()

    if reduce_features_below is not None and len(fnames) > 1:
        # the reference's reduce_features() step (randomforest_ts.py:70,
        # SHAP-importance based): drop features whose ensemble importance
        # (Spark ML impurity importances, normalized) falls below the
        # threshold, refit on the survivors. Keeps >= 1 feature.
        imp = dict(zip(fnames, fitted.featureImportances.toArray()))
        keep = [n for n in fnames if imp[n] >= reduce_features_below]
        if not keep:
            keep = [max(fnames, key=lambda n: imp[n])]
        if len(keep) < len(fnames):
            fnames = keep
            assembler = VectorAssembler(inputCols=fnames, outputCol="_fvec2")
            nn = None
            for n in fnames:
                c = F.col(n).isNotNull() & ~F.isnan(F.col(n))
                nn = c if nn is None else (nn & c)
            featdf = work.filter(nn)
            assembled = assembler.transform(featdf) \
                                 .withColumnRenamed("_fvec2", "_fvec")
            observed = assembled.filter(v.isNotNull()).withColumn("_label", v)
            if test_size > 0.0:
                observed = observed.withColumn(
                    "_holdout", F.rand(seed) < F.lit(test_size))
                train = observed.filter(~F.col("_holdout"))
                holdout = observed.filter(F.col("_holdout"))
            else:
                train, holdout = observed, None
            fitted = _make_reg().fit(train)

    still_missing_src = (F.col(filled_col).isNull()
                         if filled_col in df.columns else v.isNull())
    gaps = assembled.filter(still_missing_src)
    preds = fitted.transform(gaps).select(
        *key_cols, ts_col, F.col("_pred").alias("_tree_pred"))
    # (key, ts) is unique under the sanitizer contract; dedup defensively
    preds = preds.dropDuplicates([*key_cols, ts_col])

    out = work.join(preds, on=[*key_cols, ts_col], how="left")
    eligible = F.col("_tree_pred").isNotNull()
    base_filled = F.col(filled_col) if filled_col in df.columns else v
    base_flag = (F.col(flag_col) if flag_col in df.columns
                 else F.when(v.isNotNull(), F.lit(FLAG_OBSERVED)))
    granular = F.lit(FLAG_MODEL * 1000 + min(int(n_train), 999))
    base_granular = (F.col(granular_col) if granular_col in df.columns
                     else F.lit(None))
    out = (
        out.withColumn(flag_col,
                       F.when(eligible, F.lit(FLAG_MODEL))
                       .otherwise(base_flag).cast("int"))
        .withColumn(granular_col,
                    F.when(eligible, granular)
                    .otherwise(base_granular).cast("int"))
        .withColumn(filled_col,
                    F.when(eligible, F.col("_tree_pred"))
                    .otherwise(base_filled))
        .drop(*[c for c in out.columns
                if c.startswith("_f_") or c == "_tree_pred"])
    )

    if with_scores:
        from diive_spark.operators.gapfill import prediction_scores
        scores = None
        if holdout is not None:
            scored = fitted.transform(holdout)
            scores = prediction_scores(scored, "_pred", "_label")
        return out, scores
    return out


def quick_fill(df, key_cols, ts_col, value_col, **kwargs):
    """QuickFillRFTS analogue (reference randomforest_ts.py:100): minimal
    feature engineering — the lag-1 value plus timestamp features — and a
    small forest, for fast exploratory fills."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    lagged = df.withColumn("_lag1", F.lag(F.col(value_col), 1).over(w))
    kwargs.setdefault("num_trees", 10)
    kwargs.setdefault("max_depth", 6)
    out = tree_model_fill(
        lagged, key_cols, ts_col, value_col, feature_cols=["_lag1"],
        **kwargs)
    if isinstance(out, tuple):
        return out[0].drop("_lag1"), out[1]
    return out.drop("_lag1")


def longterm_tree_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    feature_cols: list[str] | None = None,
    n_neighbors: int = 1,
    **kwargs,
) -> DataFrame:
    """LongTermGapFillingRandomForestTS analogue (reference
    gapfilling/longterm.py:24-371): each calendar year is filled by a tree
    ensemble trained on that year ± ``n_neighbors`` years, so local models
    track instrument drift across decade-scale records.

    Execution: one ``tree_model_fill`` per DISTINCT target year — a
    driver-side loop, but bounded by the CALENDAR (tens of iterations for
    any record length), each iteration a fully distributed Spark ML fit
    over the pool years. Results are unioned; each row keeps its own
    year's fill. For a single shared model use ``tree_model_fill``
    directly."""
    years = [r[0] for r in
             df.select(F.year(ts_col).alias("_y")).distinct().collect()]
    parts = []
    for y in sorted(years):
        pool = df.filter(
            F.year(ts_col).between(y - n_neighbors, y + n_neighbors))
        filled = tree_model_fill(
            pool, key_cols, ts_col, value_col, feature_cols=feature_cols,
            **kwargs)
        parts.append(filled.filter(F.year(ts_col) == y))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
