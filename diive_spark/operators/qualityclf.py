"""Model-based document quality classifier — the fastText-style linear
filter every web-scale corpus pipeline runs after the rule tier.

Public recipe: GPT-3/CCNet/RefinedWeb score web documents with a cheap
linear classifier over hashed bag-of-words features, trained on
"reference corpus vs crawl" labels, and keep/downsample by the predicted
probability (Joulin et al. 2016 fastText; Brown et al. 2020 §A;
Wenzek et al. 2020). This module is that tier on Spark ML:

- featurization is ``HashingTF`` over the whitespace word array with an
  optional word-bigram augment (fastText's wordNgrams=2) — JVM-side,
  fixed-width ``2^18`` sparse vectors, no vocabulary state to ship;
- the model is ``LogisticRegression`` (distributed L-BFGS, JVM) — at
  100 TB you train on a labeled sample (the label table is the small
  side) and SCORE the corpus with a pure transform riding the scan;
- scoring emits calibrated ``quality_prob`` plus an optional Pareto-style
  keep draw (sample harder near the boundary, the GPT-3 trick) — the
  draw reuses the engine's deterministic md5 uniform so keep decisions
  are rerun-stable.

No external model artifacts, no sklearn: train() returns the fitted
PipelineModel; helpers label a corpus from reference/non-reference
frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from diive_spark.operators.mixing import _uniform

N_FEATURES = 1 << 18


def _featurize_stages(text_col: str, word_ngrams: int):
    from pyspark.ml.feature import HashingTF, SQLTransformer

    grams = f"split({text_col}, ' ')"
    if word_ngrams >= 2:
        # fastText wordNgrams=2: unigrams + joined adjacent pairs, built
        # with the one-pass zip_with form (see textstats._grams_expr on why
        # element_at-in-lambda is quadratic)
        g2 = (f"zip_with(slice(w, 1, greatest(size(w) - 1, 0)), "
              f"slice(w, 2, greatest(size(w) - 1, 0)), "
              f"(a, b) -> concat(a, ' ', b))")
        expr = (f"SELECT *, concat(w, {g2}) AS __terms FROM "
                f"(SELECT *, {grams} AS w FROM __THIS__)")
    else:
        expr = f"SELECT *, {grams} AS __terms FROM __THIS__"
    return [
        SQLTransformer(statement=expr),
        HashingTF(inputCol="__terms", outputCol="__features",
                  numFeatures=N_FEATURES),
    ]


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    word_ngrams: int = 2,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality model on (text, label 0/1) rows. Returns a
    ``pyspark.ml.PipelineModel`` whose transform adds ``quality_prob``."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="__features", labelCol=label_col,
        probabilityCol="__prob", rawPredictionCol="__raw",
        predictionCol="__pred", regParam=reg_param, maxIter=max_iter,
    )
    stages = _featurize_stages(text_col, word_ngrams) + [lr]
    return Pipeline(stages=stages).fit(labeled)


def score_quality(model, df: DataFrame) -> DataFrame:
    """Pure-transform scoring pass: adds ``quality_prob`` in [0, 1]
    (P(label=1)) and drops the pipeline's internal columns."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(df)
    internal = [c for c in ("w", "__terms", "__features", "__prob",
                            "__raw", "__pred") if c in out.columns]
    return (
        out.withColumn(
            "quality_prob",
            F.element_at(vector_to_array("__prob"), 2).cast("double"))
        .drop(*internal)
    )


def quality_filter(
    model,
    df: DataFrame,
    id_col: str = "doc_id",
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """GPT-3-style stochastic keep (public recipe, Brown et al. 2020
    appendix A): keep a document iff
    ``u < exp(-alpha * (1 - quality_prob))`` with ``u`` the engine's
    deterministic md5 uniform of (id, seed) — high-quality docs almost
    always survive, low-quality ones survive with exponentially small,
    rerun-stable probability (keeps tail diversity instead of a hard
    threshold)."""
    scored = score_quality(model, df)
    keep = _uniform(F.col(id_col), seed) < F.exp(
        -F.lit(alpha) * (F.lit(1.0) - F.col("quality_prob")))
    return scored.filter(keep)


def label_from_reference(
    reference: DataFrame, other: DataFrame, text_col: str = "text",
) -> DataFrame:
    """Standard label construction: reference corpus = 1, crawl = 0."""
    a = reference.select(F.col(text_col)).withColumn("label", F.lit(1.0))
    b = other.select(F.col(text_col)).withColumn("label", F.lit(0.0))
    return a.unionByName(b)
