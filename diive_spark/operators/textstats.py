"""Text analysis for training-data pipelines: quality scoring, language ID,
token counting, document fingerprinting.

These are engine-new operators (no diive counterpart — diive's only string
op is column-name sanitization, SURVEY.md §2.8) required for the 100 TB
training-data use case. All pure column expressions (JVM codegen); the
heuristics are deliberately expressible in ANSI SQL so the DuckDB oracle
can recompute them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# tiny marker-word lists; counting occurrences of " <w> " in the padded text
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "que", "los"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "les", "des", "est"],
    "zh": ["de", "shi", "zai", "le"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _count_occurrences(padded: Column, word: str) -> Column:
    """Occurrences of ' word ' via length-difference (no regex, so the SQL
    oracle is dialect-proof). ``padded`` must come from :func:`pad_text`,
    which DOUBLES interior spaces — otherwise adjacent repeats ('the the')
    would share their delimiter space and non-overlapping replace would
    undercount."""
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("bigint")


def pad_text(text: Column) -> Column:
    """' ' + text with doubled interior spaces + ' ' — every word gets its
    own delimiter spaces, making ' w ' needles non-overlapping."""
    return F.concat(F.lit(" "), F.replace(text, F.lit(" "), F.lit("  ")), F.lit(" "))


def n_words_expr(text: Column) -> Column:
    """Whitespace token count = spaces + 1 (single-space normalized texts)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    ).cast("bigint")


def add_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats: char/word counts, avg word length,
    stopword ratio, and a composite quality score in [0, 1]."""
    t = F.col(text_col)
    padded = pad_text(t)
    n_chars = F.length(t).cast("bigint")
    n_words = n_words_expr(t)
    stop_hits = None
    for w in STOPWORDS:
        c = _count_occurrences(padded, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    # quality: length in a healthy band + stopword presence (web-pipeline
    # style heuristic, cf. C4/Gopher rules — public recipes); computed from
    # UNROUNDED ratios, rounded only for display
    len_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stop_hits / n_words * 5.0, F.lit(1.0))
    return (
        df.withColumn("n_chars_c", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("avg_word_len", F.round((n_chars - (n_words - 1)) / n_words + F.lit(1e-9), 6))
        .withColumn("stopword_ratio", F.round(stop_hits / n_words + F.lit(1e-9), 6))
        .withColumn("quality_score", F.round((len_score + stop_score) / 2.0 + F.lit(1e-9), 6))
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/marker-word language heuristic: argmax of per-language marker
    counts, deterministic tie-break by language code."""
    padded = pad_text(F.lower(F.col(text_col)))
    scores = {}
    for lang, words in LANG_MARKERS.items():
        s = None
        for w in words:
            c = _count_occurrences(padded, w)
            s = c if s is None else s + c
        scores[lang] = s
    # argmax with lexicographic tie-break: pack (score, reversed-lang) struct
    structs = [
        F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))
        for lang in sorted(LANG_MARKERS, reverse=True)
    ]
    best = F.greatest(*structs)
    return df.withColumn("pred_lang", best["l"]).withColumn("lang_score", best["s"])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit content fingerprint: md5 of the lowercase text, first 15 hex
    chars as bigint (both engines parse hex identically; 15 chars stays
    under 2^63)."""
    fp = F.conv(F.substring(F.md5(F.lower(F.col(text_col))), 1, 15), 16, 10).cast("bigint")
    return df.withColumn("fp", fp)


def _max_run_expr(arr: Column) -> Column:
    """Longest run of consecutive equal elements in ``arr`` — one fold, no
    shuffle. acc = (prev, current_run, best_run)."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(arr, zero, step, lambda acc: acc["best"])


def _grams_expr(words: Column, n: int) -> Column:
    """Word n-grams of a split array (WITH multiplicity, unlike the dedup
    shingle path) — empty array when the doc has fewer than ``n`` words.

    Built as ``zip_with`` over ``n`` aligned ``slice`` views — ONE pass
    over the array. The naive form (transform + element_at(words, i+j))
    re-evaluates the ``words`` expression per ELEMENT when it is an inline
    split (Catalyst does no common-subexpression elimination inside
    higher-order-function lambdas), turning the whole stage O(words^2) per
    row — measured 75x slower on the sf1 corpus."""
    length = F.greatest(F.size(words) - (n - 1), F.lit(0))
    g = F.slice(words, 1, length)
    for j in range(1, n):
        g = F.zip_with(g, F.slice(words, j + 1, length),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    return g


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style per-document repetition signals (cf. Rae et al. 2021,
    appendix repetition filters; public recipe), each a pure column
    expression — no explode, no shuffle, O(words log words) per row:

    - ``dup_2gram_frac`` / ``dup_3gram_frac``: fraction of word n-gram
      occurrences that are repeats of an earlier occurrence
      (1 - distinct/total).
    - ``top_2gram_frac``: share of all 2-gram occurrences taken by the
      single most frequent 2-gram (run-length max over the sorted grams).
    - ``uniq_word_frac``: type-token ratio (distinct words / words).
    - ``max_word_run``: longest run of the SAME word repeated consecutively
      ('batch batch batch' -> 3).

    At 100 TB this is the cheap map-side tier of corpus filtering: every
    signal rides the same scan, nothing leaves the row.

    The split/gram arrays are materialized as intermediate columns on
    purpose: each is non-cheap and referenced several times, so Catalyst's
    CollapseProject keeps the projections separate and every array is
    built ONCE per row. Folding them inline re-evaluates the gram chain
    per reference — measured 3x slower on the sf1 corpus (and the
    element_at-in-lambda form it replaced was 40x slower still)."""
    words = F.col("_ts_w")
    n_words = F.size(words).cast("bigint")
    g2, g3 = F.col("_ts_g2"), F.col("_ts_g3")
    n2, n3 = F.size(g2).cast("bigint"), F.size(g3).cast("bigint")

    def dup_frac(grams, total):
        return F.when(
            total > 0,
            F.round((total - F.size(F.array_distinct(grams))) / total + F.lit(1e-9), 6),
        )

    top2 = F.when(n2 > 0, F.round(_max_run_expr(F.array_sort(g2)) / n2 + F.lit(1e-9), 6))
    return (
        df.withColumn("_ts_w", F.split(F.col(text_col), " "))
        .withColumn("_ts_g2", _grams_expr(words, 2))
        .withColumn("_ts_g3", _grams_expr(words, 3))
        .withColumn("dup_2gram_frac", dup_frac(g2, n2))
        .withColumn("dup_3gram_frac", dup_frac(g3, n3))
        .withColumn("top_2gram_frac", top2)
        .withColumn("uniq_word_frac",
                    F.round(F.size(F.array_distinct(words)) / n_words + F.lit(1e-9), 6))
        .withColumn("max_word_run", _max_run_expr(words))
        .drop("_ts_w", "_ts_g2", "_ts_g3")
    )


def unigram_logprob_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """CCNet-style corpus-LM quality score (public recipe: Wenzek et al.
    2020 score web pages by LM perplexity; the distributable core is the
    unigram version): train p(w) = count(w)/total over the WHOLE corpus
    (one explode + one groupBy — the only corpus-sized step), then score
    each document by its mean token log-probability. Low scores = texts
    unlike the corpus (boilerplate, noise); high = head-heavy repetition.

    The word-probability table is corpus-vocabulary-sized and joined back
    with a broadcast hint — at 100 TB the vocab table is MBs while the
    corpus is TBs, so the scoring pass is a map-side join riding the same
    scan as the other quality signals. Returns (id_col, n_words,
    unigram_lp) with unigram_lp = round(avg ln p(w), 6)."""
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("t"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "word", F.log(F.col("cnt") / F.col("t")).alias("lp"))
    return (
        words.join(F.broadcast(lp), "word")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"),
             F.round(F.avg("lp") + F.lit(1e-9), 6).alias("unigram_lp"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """C4-style corpus-level boilerplate removal (public recipe: Raffel et
    al. 2020 drop any line occurring more than once across the corpus;
    threshold generalized): a line appearing in >= ``min_count`` documents
    anywhere in the corpus is boilerplate (nav bars, cookie banners,
    licence footers) and is deleted from EVERY document.

    Plan shape: posexplode lines -> count distinct docs per md5(line) (one
    groupBy on the 16-byte hash) -> anti-join survivors -> reassemble in
    original order (sort_array over (pos, line) structs — one more
    groupBy). Both shuffles key on hashes/ids, never on line text, so
    skew is bounded by the hash. Documents whose every line was
    boilerplate come back with empty text, not dropped — the caller
    decides. Returns (id_col, text_col) with boilerplate lines removed."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    counts = (
        lines.groupBy(F.md5("line").alias("lh"))
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_count)
        .select("lh")
    )
    kept = lines.join(counts, F.md5(lines["line"]) == counts["lh"], "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ), sep).alias(text_col))
        # docs that lost every line still need a row
        .join(df.select(id_col), id_col, "right")
        .fillna({text_col: ""})
    )


def char_entropy(df: DataFrame, text_col: str = "text",
                 impl: str = "arrow") -> DataFrame:
    """Per-document Shannon entropy over characters (nats) — the classic
    cheap gibberish/encoded-blob detector (public recipe: compression-ratio
    and entropy filters in web-corpus pipelines; entropy is the
    distributable, dependency-free proxy).

    Both impls compute IDENTICAL values (test-pinned, including astral
    plane + empty docs): sort the chars, accumulate S = sum(run * ln run)
    over equal-char runs IN SORTED ORDER, H = round(ln n - S/n + 1e-9, 6).

    - ``impl='arrow'`` (default): vectorized Arrow kernel — per doc one
      numpy codepoint sort + unique + a sequential cumsum reproducing the
      fold's left-to-right accumulation. Spark compares strings in UTF-8
      binary order == codepoint order, so numpy's codepoint sort IS the
      array_sort order; split('') keeps astral chars whole (one element
      per codepoint) and maps '' -> [''] (n=1, H=0.0), both replicated.
      ~24x faster than the fold at sf1 (24 s -> ~1 s for 50k docs at
      local[8]): HOF aggregate lambdas are interpreted per ELEMENT, and
      this one runs per character.
    - ``impl='fold'``: the pure-column sorted-run fold (shuffle-free, no
      Python) — kept as the cross-implementation check the equivalence
      test pins the kernel against, and as the SQL-oracle-shaped form
      (the oracle replays the mathematically identical char-groupBy)."""
    t = F.col(text_col)
    if impl == "arrow":
        @F.pandas_udf("double")
        def _h(texts):
            import numpy as np
            import pandas as pd
            out = np.empty(len(texts))
            for i, s in enumerate(texts):
                if s is None:
                    out[i] = np.nan
                    continue
                n = len(s)
                if n == 0:
                    out[i] = round(1e-9, 6)  # split('') -> [''] run, n=1
                    continue
                cps = np.frombuffer(s.encode("utf-32-le"), "<u4")
                counts = np.unique(cps, return_counts=True)[1] \
                    .astype(np.float64)
                terms = counts * np.log(counts)
                # cumsum = sequential left-to-right accumulation, exactly
                # the fold's float addition order over sorted runs
                srun = float(np.cumsum(terms)[-1]) if len(terms) else 0.0
                out[i] = round(float(np.log(float(n))) - srun / n + 1e-9, 6)
            res = pd.Series(out)
            return res.where(~np.isnan(out), None)
        return df.withColumn("char_entropy", _h(t))
    if impl != "fold":
        raise ValueError(f"unknown char_entropy impl {impl!r}")
    chars = F.array_sort(F.split(t, ""))
    n = F.size(chars).cast("double")

    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0.0).alias("run"),
        F.lit(0.0).alias("s"),
    )

    def step(acc, x):
        same = x.eqNullSafe(acc["prev"])
        flushed = F.when(
            same | (acc["run"] == 0), acc["s"]
        ).otherwise(acc["s"] + acc["run"] * F.log(acc["run"]))
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1.0))
        return F.struct(x.alias("prev"), run.alias("run"), flushed.alias("s"))

    def finish(acc):
        return F.when(acc["run"] > 0,
                      acc["s"] + acc["run"] * F.log(acc["run"])).otherwise(0.0)

    s = F.aggregate(chars, zero, step, finish)
    h = F.when(n > 0, F.round(F.log(n) - s / n + F.lit(1e-9), 6)).otherwise(
        F.lit(None).cast("double"))
    return df.withColumn("char_entropy", h)


def vocab_stats(
    df: DataFrame, source_col: str = "source", text_col: str = "text",
) -> DataFrame:
    """Per-source vocabulary stats: token count, type count (distinct
    words) and type-token ratio — the corpus-health dashboard numbers
    (Heaps-law tracking across sources). One explode + one groupBy on
    ``source`` (20-ish groups; count_distinct shuffles (source, word)
    pairs, bounded by vocabulary size)."""
    words = df.select(
        F.col(source_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.groupBy(source_col)
        .agg(F.count("*").alias("n_tokens"),
             F.count_distinct("word").alias("n_types"))
        .withColumn(
            "ttr",
            F.round(F.col("n_types") / F.col("n_tokens") + F.lit(1e-9), 6))
    )


def zipf_topk(
    df: DataFrame, k: int = 20, text_col: str = "text",
) -> DataFrame:
    """Corpus head-of-Zipf: the ``k`` most frequent words with their counts
    and rank (ties broken lexicographically). The distributed part is one
    explode + one groupBy; the top-k is ``orderBy().limit(k)`` (Spark's
    distributed take-ordered — per-partition heads, merged on the driver),
    and only the k-row result sees a single-partition ranking window."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate: ceil(chars/3.4)
    bounded below by word count (the usual chars-per-token heuristic for
    byte-level BPE; deterministic, no tokenizer dependency)."""
    t = F.col(text_col)
    n_words = n_words_expr(t)
    bpe_est = F.greatest(F.ceil(F.length(t) / F.lit(3.4)).cast("bigint"), n_words)
    return df.withColumn("n_ws_tokens", n_words).withColumn("n_bpe_est", bpe_est)
