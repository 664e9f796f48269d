"""Quality classifier: planted-signal separation, determinism of the
keep draw, and schema hygiene of the scoring pass."""

import pytest
from pyspark.sql import functions as F

from diive_spark.operators import qualityclf


def _corpus(spark, n=300, seed_words=("data", "query", "table", "join",
                                      "merge", "scan", "sort", "group")):
    """High-quality docs draw from a natural vocabulary; low-quality docs
    are deterministic junk (reversed tokens + digit salt) — disjoint
    vocabularies, so a working classifier must separate them."""
    rows = []
    for i in range(n):
        words = [seed_words[(i * 7 + j) % len(seed_words)] for j in range(12)]
        rows.append((i, " ".join(words), 1.0))
        junk = [w[::-1] + str((i + j) % 10) for j, w in enumerate(words)]
        rows.append((i + n, " ".join(junk), 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


@pytest.fixture(scope="module")
def fitted(spark):
    corpus = _corpus(spark)
    train = corpus.filter(F.col("doc_id") % 5 != 0)
    model = qualityclf.train_quality_classifier(train)
    return model, corpus


def test_holdout_separation(fitted):
    model, corpus = fitted
    holdout = corpus.filter(F.col("doc_id") % 5 == 0)
    scored = qualityclf.score_quality(model, holdout)
    agg = scored.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    by_label = {r["label"]: r["p"] for r in agg}
    assert by_label[1.0] > 0.9
    assert by_label[0.0] < 0.1
    acc = scored.filter(
        ((F.col("quality_prob") > 0.5).cast("double") == F.col("label"))
    ).count() / holdout.count()
    assert acc >= 0.95


def test_score_schema_clean(fitted):
    model, corpus = fitted
    scored = qualityclf.score_quality(model, corpus.drop("label"))
    assert set(scored.columns) == {"doc_id", "text", "quality_prob"}


def test_quality_filter_deterministic_and_biased(fitted):
    model, corpus = fitted
    docs = corpus.drop("label")
    kept1 = {r["doc_id"] for r in
             qualityclf.quality_filter(model, docs, seed=4).select("doc_id").collect()}
    kept2 = {r["doc_id"] for r in
             qualityclf.quality_filter(model, docs, seed=4).select("doc_id").collect()}
    assert kept1 == kept2  # rerun-stable draw
    n = corpus.count() // 2
    good_kept = sum(1 for d in kept1 if d < n) / n
    bad_kept = sum(1 for d in kept1 if d >= n) / n
    assert good_kept > 0.9
    assert bad_kept < 0.2


def test_unigram_mode(spark):
    corpus = _corpus(spark, n=100)
    model = qualityclf.train_quality_classifier(corpus, word_ngrams=1)
    scored = qualityclf.score_quality(model, corpus)
    by_label = {r["label"]: r["p"] for r in scored.groupBy("label")
                .agg(F.avg("quality_prob").alias("p")).collect()}
    assert by_label[1.0] > 0.9 and by_label[0.0] < 0.1
