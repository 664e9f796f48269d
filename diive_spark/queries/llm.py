"""LLM-corpus gates: exact/near dedup, MinHash/SimHash/LSH, embedding similarity + ANN, text quality/language/fingerprint/token stats, stepwise screening and the lineitem profile.

Split from the monolithic queries.py catalog; registration order is
preserved by the package __init__ importing sections in the original
sequence. Conventions (aliasing, _r6 rounding) in queries._shared.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from diive_spark.operators import gapfill, grid, outliers, resample  # noqa: F401

from ._shared import QUERIES, ORACLES, _hourly_gridded, _r6, _t  # noqa: F401

# ---------------------------------------------------------------------------
# training-data pipeline: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Union gate, two variants: 'doc' = whole-document exact dedup;
    'para' = corpus-wide keep-first paragraph dedup (dedup.paragraph_dedup,
    Dolma/RefinedWeb-style — later occurrences of a repeated paragraph are
    removed, the global-first survives). The single-line synthetic docs are
    paragraphized deterministically (each doc split at its word midpoint
    into two paragraphs) IDENTICALLY on both sides, so duplicated docs in
    the corpus yield real cross-document paragraph collisions. The rebuilt
    text is certified by length + a 60-bit md5 fingerprint."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    _pb = [F.lit(None).cast("bigint").alias(c)
           for c in ("n_paras_kept", "kept_len", "kept_fp")]
    a = dedup.exact_dedup(docs, "doc_id").select(
        F.lit("doc").alias("variant"),
        "doc_id", "canonical_id", "group_size", "is_dup", *_pb,
    )
    words = F.split(F.col("text"), " ")
    half = F.floor(F.size(words) / 2).cast("int")
    d2 = docs.select(
        "doc_id",
        F.concat(
            F.array_join(F.slice(words, 1, half), " "),
            F.lit("\n"),
            F.array_join(F.slice(words, half + 1, F.size(words) - half), " "),
        ).alias("text"),
    )
    b = dedup.paragraph_dedup(d2).select(
        F.lit("para").alias("variant"), "doc_id",
        F.lit(None).cast("bigint").alias("canonical_id"),
        F.lit(None).cast("bigint").alias("group_size"),
        F.lit(None).cast("int").alias("is_dup"),
        "n_paras_kept",
        F.length("text").cast("bigint").alias("kept_len"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint").alias("kept_fp"),
    )
    return a.unionByName(b)


SQL_DEDUP_EXACT = """
SELECT 'doc' AS variant, doc_id,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       count(*) OVER (PARTITION BY md5(text)) AS group_size,
       CAST(doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS INTEGER) AS is_dup,
       CAST(NULL AS BIGINT) AS n_paras_kept,
       CAST(NULL AS BIGINT) AS kept_len, CAST(NULL AS BIGINT) AS kept_fp
FROM documents
UNION ALL
SELECT 'para' AS variant, doc_id,
       CAST(NULL AS BIGINT) AS canonical_id, CAST(NULL AS BIGINT) AS group_size,
       CAST(NULL AS INTEGER) AS is_dup,
       n_paras_kept, kept_len, kept_fp
FROM (
  WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
  d2 AS (
    SELECT doc_id,
           array_to_string(words[1:(len(words) // 2)], ' ') || chr(10) ||
           array_to_string(words[(len(words) // 2) + 1:len(words)], ' ') AS text
    FROM w
  ),
  p0 AS (SELECT doc_id, string_split(text, chr(10)) AS paras FROM d2),
  p AS (
    SELECT doc_id, i AS pos, paras[i] AS para
    FROM p0, (SELECT unnest(generate_series(1, 4)) AS i) g
    WHERE i <= len(paras) AND paras[i] != ''
  ),
  k AS (
    SELECT doc_id, pos, para,
           row_number() OVER (PARTITION BY md5(para)
                              ORDER BY doc_id, pos) AS rn
    FROM p
  ),
  r AS (
    SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text,
           CAST(count(*) AS BIGINT) AS n_paras_kept
    FROM k WHERE rn = 1 GROUP BY 1
  )
  SELECT d.doc_id,
         coalesce(r.n_paras_kept, 0) AS n_paras_kept,
         CAST(length(coalesce(r.text, '')) AS BIGINT) AS kept_len,
         ('0x' || substr(md5(coalesce(r.text, '')), 1, 15))::BIGINT AS kept_fp
  FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
)
"""


def q_ngram_jaccard(spark, sf_dir):
    """CERTIFIES THE CAPPED CANDIDATE PLAN (the one that survives web scale):
    shingles in more than ``max_doc_freq`` documents are excluded from
    candidate generation, bounding every shared-shingle bucket to
    max_doc_freq^2/2 pairs; Jaccard for surviving candidates is still exact
    over the FULL shingle sets (see dedup.ngram_jaccard_pairs). The cap is
    active on the gate corpus (drops the head stop-shingles) and the oracle
    reproduces it with the matching HAVING filter."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.02,
                                     max_doc_freq=5)


SQL_NGRAM_JACCARD = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
keep AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 5),
capped AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.id1, c.id2, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id1
  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id1, id2, round(1e-9 + inter * 1.0 / (s1.n_sh + s2.n_sh - inter), 6) AS jaccard
FROM inter JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
WHERE inter * 1.0 / (s1.n_sh + s2.n_sh - inter) >= 0.02
"""


def q_text_quality(spark, sf_dir):
    """Union gate, two variants: 'base' = length/stopword quality stats;
    'repetition' = the Gopher-style repetition filters (duplicate n-gram
    fractions, top-2-gram share, type-token ratio, longest same-word run —
    textstats.repetition_stats); 'unigram_lp' = the CCNet-style corpus-LM
    quality score (textstats.unigram_logprob_score: corpus unigram
    probabilities broadcast-joined back, mean ln p(w) per doc). Every
    variant is fully value-oracled."""
    from diive_spark.operators import textstats
    docs = _t(spark, sf_dir, "documents")
    _rep_cols = ("dup_2gram_frac", "dup_3gram_frac", "top_2gram_frac",
                 "uniq_word_frac")
    _rep_null = [F.lit(None).cast("double").alias(c) for c in _rep_cols]
    _lp_null = F.lit(None).cast("double").alias("unigram_lp")
    a = textstats.add_text_stats(docs).select(
        F.lit("base").alias("variant"),
        "doc_id", "n_words", "avg_word_len", "stopword_ratio", "quality_score",
        *_rep_null, F.lit(None).cast("bigint").alias("max_word_run"), _lp_null,
    )
    b = textstats.repetition_stats(docs).select(
        F.lit("repetition").alias("variant"),
        "doc_id", F.lit(None).cast("bigint").alias("n_words"),
        F.lit(None).cast("double").alias("avg_word_len"),
        F.lit(None).cast("double").alias("stopword_ratio"),
        F.lit(None).cast("double").alias("quality_score"),
        *_rep_cols, "max_word_run", _lp_null,
    )
    c = textstats.unigram_logprob_score(docs).select(
        F.lit("unigram_lp").alias("variant"),
        "doc_id", "n_words",
        *[F.lit(None).cast("double").alias(x) for x in (
            "avg_word_len", "stopword_ratio", "quality_score", *_rep_cols)],
        F.lit(None).cast("bigint").alias("max_word_run"), "unigram_lp",
    )
    return a.unionByName(b).unionByName(c)


_STOP_SQL = " + ".join(
    f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
    for w in ["the", "a", "of", "and", "to", "in", "is", "it"]
)
_REP_NULLS_BASE = """CAST(NULL AS DOUBLE) AS dup_2gram_frac,
       CAST(NULL AS DOUBLE) AS dup_3gram_frac, CAST(NULL AS DOUBLE) AS top_2gram_frac,
       CAST(NULL AS DOUBLE) AS uniq_word_frac, CAST(NULL AS BIGINT) AS max_word_run"""
_LP_NULL = "CAST(NULL AS DOUBLE) AS unigram_lp"

SQL_TEXT_QUALITY = f"""
WITH b AS (
  SELECT doc_id, ' ' || replace(text, ' ', '  ') || ' ' AS p,
         CAST(length(text) AS BIGINT) AS n_chars_c,
         CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words
  FROM documents
),
s AS (SELECT doc_id, n_chars_c, n_words, {_STOP_SQL} AS stop_hits FROM b),
toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
w AS (
  SELECT doc_id, i, words[i] AS word
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i <= len(words)
),
g2 AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] AS gram
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 1 <= len(words)
),
g3 AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS gram
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
a2 AS (SELECT doc_id, count(*) AS n, count(DISTINCT gram) AS d FROM g2 GROUP BY 1),
a3 AS (SELECT doc_id, count(*) AS n, count(DISTINCT gram) AS d FROM g3 GROUP BY 1),
t2 AS (SELECT doc_id, max(c) AS topc, sum(c) AS tot FROM
        (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
uw AS (SELECT doc_id, count(DISTINCT word) AS d, count(*) AS n FROM w GROUP BY 1),
runs AS (
  SELECT doc_id, word, i - row_number() OVER (PARTITION BY doc_id, word ORDER BY i) AS grp
  FROM w
),
mr AS (SELECT doc_id, max(c) AS max_run FROM
        (SELECT doc_id, word, grp, count(*) AS c FROM runs GROUP BY 1, 2, 3) GROUP BY 1)
SELECT 'base' AS variant, doc_id, n_words,
       round(1e-9 + (n_chars_c - (n_words - 1)) * 1.0 / n_words, 6) AS avg_word_len,
       round(1e-9 + stop_hits * 1.0 / n_words, 6) AS stopword_ratio,
       round(1e-9 + (least(n_words / 50.0, 1.0) + least(stop_hits * 1.0 / n_words * 5.0, 1.0)) / 2.0, 6)
         AS quality_score,
       {_REP_NULLS_BASE}, {_LP_NULL}
FROM s
UNION ALL
SELECT 'repetition' AS variant, uw.doc_id,
       CAST(NULL AS BIGINT) AS n_words, CAST(NULL AS DOUBLE) AS avg_word_len,
       CAST(NULL AS DOUBLE) AS stopword_ratio, CAST(NULL AS DOUBLE) AS quality_score,
       round(1e-9 + (a2.n - a2.d) * 1.0 / a2.n, 6) AS dup_2gram_frac,
       round(1e-9 + (a3.n - a3.d) * 1.0 / a3.n, 6) AS dup_3gram_frac,
       round(1e-9 + t2.topc * 1.0 / t2.tot, 6) AS top_2gram_frac,
       round(1e-9 + uw.d * 1.0 / uw.n, 6) AS uniq_word_frac,
       CAST(mr.max_run AS BIGINT) AS max_word_run, {_LP_NULL}
FROM uw LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
LEFT JOIN t2 USING (doc_id) LEFT JOIN mr USING (doc_id)
UNION ALL
SELECT 'unigram_lp' AS variant, doc_id, n_words,
       CAST(NULL AS DOUBLE) AS avg_word_len, CAST(NULL AS DOUBLE) AS stopword_ratio,
       CAST(NULL AS DOUBLE) AS quality_score, {_REP_NULLS_BASE},
       unigram_lp
FROM (
  WITH wd AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  ),
  vocab AS (SELECT word, count(*) AS cnt FROM wd WHERE word != '' GROUP BY 1),
  tot AS (SELECT sum(cnt) AS t FROM vocab),
  lp AS (SELECT word, ln(cnt * 1.0 / t) AS lp FROM vocab, tot)
  SELECT wd.doc_id, count(*) AS n_words,
         round(1e-9 + avg(lp.lp), 6) AS unigram_lp
  FROM wd JOIN lp USING (word)
  WHERE wd.word != ''
  GROUP BY 1
)
"""


def q_lang_id(spark, sf_dir):
    """Union gate, three variants (corpus-composition family): 'doc' =
    per-doc marker-word language ID; 'vocab' = per-source token/type
    counts + type-token ratio (textstats.vocab_stats — the Heaps-law
    corpus dashboard); 'zipf' = the corpus's 20 most frequent words with
    rank (textstats.zipf_topk — distributed take-ordered, only the k-row
    head sees a ranking window)."""
    from diive_spark.operators import textstats
    docs = _t(spark, sf_dir, "documents")
    _vz = ("source", "word")
    _vn = ("n_tokens", "n_types", "cnt", "rank")

    def _nullv(names):
        return [F.lit(None).cast("string").alias(c) for c in names]

    def _nullb(names):
        return [F.lit(None).cast("bigint").alias(c) for c in names]

    _ttr_null = F.lit(None).cast("double").alias("ttr")
    a = textstats.language_id(docs).select(
        F.lit("doc").alias("variant"), "doc_id", "pred_lang", "lang_score",
        *_nullv(_vz), *_nullb(_vn), _ttr_null)
    b = textstats.vocab_stats(docs).select(
        F.lit("vocab").alias("variant"),
        F.lit(None).cast("bigint").alias("doc_id"),
        F.lit(None).cast("string").alias("pred_lang"),
        F.lit(None).cast("bigint").alias("lang_score"),
        "source", F.lit(None).cast("string").alias("word"),
        "n_tokens", "n_types", *_nullb(("cnt", "rank")), "ttr")
    c = textstats.zipf_topk(docs, k=20).select(
        F.lit("zipf").alias("variant"),
        F.lit(None).cast("bigint").alias("doc_id"),
        F.lit(None).cast("string").alias("pred_lang"),
        F.lit(None).cast("bigint").alias("lang_score"),
        F.lit(None).cast("string").alias("source"), "word",
        *_nullb(("n_tokens", "n_types")), "cnt", "rank", _ttr_null)
    return a.unionByName(b).unionByName(c)


def _lang_score_sql(lang):
    from diive_spark.operators.textstats import LANG_MARKERS
    return " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in LANG_MARKERS[lang]
    )


_LANG_NULLS = """CAST(NULL AS VARCHAR) AS source, CAST(NULL AS VARCHAR) AS word,
       CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS n_types,
       CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS BIGINT) AS rank,
       CAST(NULL AS DOUBLE) AS ttr"""

SQL_LANG_ID = f"""
WITH b AS (SELECT doc_id, ' ' || replace(lower(text), ' ', '  ') || ' ' AS p FROM documents),
s AS (
  SELECT doc_id,
         {_lang_score_sql('en')} AS s_en, {_lang_score_sql('es')} AS s_es,
         {_lang_score_sql('de')} AS s_de, {_lang_score_sql('fr')} AS s_fr,
         {_lang_score_sql('zh')} AS s_zh
  FROM b
),
long AS (
  SELECT doc_id, lang, score FROM s
  UNPIVOT (score FOR lang IN (s_en AS 'en', s_es AS 'es', s_de AS 'de',
                              s_fr AS 'fr', s_zh AS 'zh'))
)
SELECT 'doc' AS variant, doc_id, lang AS pred_lang, score AS lang_score,
       {_LANG_NULLS}
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang DESC) AS rk FROM long)
WHERE rk = 1
UNION ALL
SELECT 'vocab' AS variant, CAST(NULL AS BIGINT) AS doc_id,
       CAST(NULL AS VARCHAR) AS pred_lang, CAST(NULL AS BIGINT) AS lang_score,
       source, CAST(NULL AS VARCHAR) AS word,
       n_tokens, n_types, CAST(NULL AS BIGINT) AS cnt,
       CAST(NULL AS BIGINT) AS rank, ttr
FROM (
  WITH wd AS (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT word) AS BIGINT) AS n_types,
         round(count(DISTINCT word) * 1.0 / count(*) + 1e-9, 6) AS ttr
  FROM wd WHERE word != '' GROUP BY 1
)
UNION ALL
SELECT 'zipf' AS variant, CAST(NULL AS BIGINT) AS doc_id,
       CAST(NULL AS VARCHAR) AS pred_lang, CAST(NULL AS BIGINT) AS lang_score,
       CAST(NULL AS VARCHAR) AS source, word,
       CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS n_types,
       cnt, rank, CAST(NULL AS DOUBLE) AS ttr
FROM (
  WITH wd AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
  c AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM wd WHERE word != '' GROUP BY 1)
  SELECT word, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank
  FROM c QUALIFY rank <= 20
)
"""


#: mixture fractions for the gated source_mix draw (non-trivial spread)
_MIX_FRACS = {f"src{k}": 0.25 * (k % 4) + 0.25 for k in range(20)}
_MIX_SEED = 7


#: (seed, epoch) for the gated deterministic_shuffle draw
_SHUF_SEED, _SHUF_EPOCH = 11, 1


#: (n_buckets, seed) for the gated DSIR weights
_DSIR_BUCKETS, _DSIR_SEED = 1024, 5


def q_fingerprint(spark, sf_dir):
    """Union gate, four variants (the sampling/selection family): 'fp' =
    the md5 content fingerprint; 'mix' = the deterministic source-mixture
    sample (mixing.source_mix: md5-derived per-row uniform vs per-source
    fraction — the draw itself is replayed by the SQL oracle, certifying
    rerun-stable sampling); 'shuffle' = the deterministic per-epoch
    training order (mixing.deterministic_shuffle — the sharded offset
    plan's global positions must equal the oracle's one-window global rank
    exactly); 'dsir' = DSIR importance log-weights (mixing.dsir_logweights,
    Xie et al. 2023: hashed-unigram+bigram bucket LM ratio of the lang='en'
    target slice vs the whole corpus — the oracle recomputes the full
    smoothed-model weight per document)."""
    from diive_spark.operators import mixing, textstats
    docs = _t(spark, sf_dir, "documents")
    _sp_null = F.lit(None).cast("bigint").alias("shuffle_pos")
    _lw_null = F.lit(None).cast("double").alias("logw")
    a = textstats.fingerprint(docs).select(
        F.lit("fp").alias("variant"), "doc_id", "fp",
        F.lit(None).cast("bigint").alias("u32"), _sp_null, _lw_null)
    from diive_spark.operators.dedup import h32
    b = mixing.source_mix(docs, _MIX_FRACS, seed=_MIX_SEED).select(
        F.lit("mix").alias("variant"), "doc_id",
        F.lit(None).cast("bigint").alias("fp"),
        h32(F.concat(F.col("doc_id").cast("string"),
                     F.lit(f":{_MIX_SEED}"))).alias("u32"), _sp_null, _lw_null)
    c = mixing.deterministic_shuffle(
        docs, seed=_SHUF_SEED, epoch=_SHUF_EPOCH).select(
        F.lit("shuffle").alias("variant"), "doc_id",
        F.lit(None).cast("bigint").alias("fp"),
        F.lit(None).cast("bigint").alias("u32"), "shuffle_pos", _lw_null)
    d = mixing.dsir_logweights(
        docs, docs.filter(F.col("lang") == "en"),
        n_buckets=_DSIR_BUCKETS, seed=_DSIR_SEED).select(
        F.lit("dsir").alias("variant"), "doc_id",
        F.lit(None).cast("bigint").alias("fp"),
        F.lit(None).cast("bigint").alias("u32"), _sp_null, "logw")
    return a.unionByName(b).unionByName(c).unionByName(d)


_MIX_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {f}" for s, f in sorted(_MIX_FRACS.items())
) + " ELSE 0.0 END"

SQL_FINGERPRINT = f"""
SELECT 'fp' AS variant, doc_id,
       ('0x' || substr(md5(lower(text)), 1, 15))::BIGINT AS fp,
       CAST(NULL AS BIGINT) AS u32, CAST(NULL AS BIGINT) AS shuffle_pos,
       CAST(NULL AS DOUBLE) AS logw
FROM documents
UNION ALL
SELECT 'mix' AS variant, doc_id, CAST(NULL AS BIGINT) AS fp, u32,
       CAST(NULL AS BIGINT) AS shuffle_pos, CAST(NULL AS DOUBLE) AS logw
FROM (
  SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR || ':{_MIX_SEED}'), 1, 8))::BIGINT AS u32
  FROM documents
)
WHERE u32 / 4294967296.0 < {_MIX_CASE}
UNION ALL
SELECT 'shuffle' AS variant, doc_id, CAST(NULL AS BIGINT) AS fp,
       CAST(NULL AS BIGINT) AS u32,
       CAST(row_number() OVER (
         ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':{_SHUF_SEED}:{_SHUF_EPOCH}'), 1, 8))::BIGINT,
                  doc_id) - 1 AS BIGINT) AS shuffle_pos,
       CAST(NULL AS DOUBLE) AS logw
FROM documents
UNION ALL
SELECT 'dsir' AS variant, doc_id, CAST(NULL AS BIGINT) AS fp,
       CAST(NULL AS BIGINT) AS u32, CAST(NULL AS BIGINT) AS shuffle_pos,
       logw
FROM (
  WITH wd AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), w -> w != '') AS ws
    FROM documents
  ),
  g AS (
    SELECT doc_id, lang, unnest(ws) AS gram FROM wd
    UNION ALL
    SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS gram
    FROM wd, (SELECT unnest(generate_series(1, 2000)) AS i) s
    WHERE i + 1 <= len(ws)
  ),
  b AS (
    SELECT doc_id, lang,
           ('0x' || substr(md5(gram || ':{_DSIR_SEED}'), 1, 8))::BIGINT
             % {_DSIR_BUCKETS} AS bucket
    FROM g
  ),
  nt AS (SELECT count(*) AS n FROM b WHERE lang = 'en'),
  nr AS (SELECT count(*) AS n FROM b),
  tc AS (SELECT bucket, count(*) AS c_t FROM b WHERE lang = 'en' GROUP BY 1),
  rc AS (SELECT bucket, count(*) AS c_r FROM b GROUP BY 1),
  ratio AS (
    SELECT rc.bucket,
           ln((coalesce(c_t, 0) + 1.0) / (nt.n + {_DSIR_BUCKETS}.0))
           - ln((c_r + 1.0) / (nr.n + {_DSIR_BUCKETS}.0)) AS logratio
    FROM rc LEFT JOIN tc USING (bucket), nt, nr
  ),
  lw AS (
    SELECT b.doc_id, round(sum(logratio) + 1e-9, 6) AS logw
    FROM b JOIN ratio USING (bucket) GROUP BY 1
  )
  SELECT d.doc_id, coalesce(lw.logw, 0.0) AS logw
  FROM documents d LEFT JOIN lw USING (doc_id)
)
"""


def _pii_augmented(docs):
    """Deterministic synthetic-PII injection (the test corpus has none):
    every doc gets an email; phones/IPs/long-ids appear on doc_id residue
    classes so counts VARY per row. The SQL oracle builds the identical
    string, so detection + redaction are certified end to end."""
    i = F.col("doc_id")

    def s(c):
        return c.cast("string")

    email = F.concat(F.lit(" contact u"), s(i), F.lit("@ex"), s(i % 7),
                     F.lit(".com"))
    phone = F.when(i % 3 == 0, F.concat(
        F.lit(" call +"), s(1 + i % 89), F.lit(" "), s(200 + i % 700),
        F.lit(" "), s(100 + i % 900), F.lit(" "), s(1000 + i % 9000),
    )).otherwise(F.lit(""))
    ip = F.when(i % 4 == 1, F.concat(
        F.lit(" from "), s(1 + i % 223), F.lit("."), s(i % 256),
        F.lit("."), s((i * 7) % 256), F.lit("."), s(1 + i % 250),
    )).otherwise(F.lit(""))
    longid = F.when(i % 5 == 2, F.concat(
        F.lit(" acct "), s(F.lit(1000000000000) + i))).otherwise(F.lit(""))
    return docs.withColumn(
        "text", F.concat(F.col("text"), email, phone, ip, longid))


def q_token_count(spark, sf_dir):
    """Union gate, three variants: 'count' = whitespace + BPE-estimate
    token counts; 'entropy' = per-doc character Shannon entropy (the
    gibberish detector — the vectorized Arrow kernel since r7,
    value-identical to the sorted-run fold it replaced [test-pinned] and
    replayed by the oracle as the mathematically identical char-groupBy);
    'pii' =
    regex PII detection + redaction (privacy.redact_pii) over
    deterministically injected emails/phones/IPs/long-ids, certified by
    per-category counts plus the redacted text's length and md5
    fingerprint."""
    from diive_spark.operators import privacy, textstats
    docs = _t(spark, sf_dir, "documents")
    _cnt_cols = ("n_ws_tokens", "n_bpe_est")
    _pii_cols = ("n_pii_email", "n_pii_ip", "n_pii_phone", "n_pii_longid",
                 "red_len", "red_fp")
    _ent_null = F.lit(None).cast("double").alias("char_entropy")

    def _nulls(cols):
        return [F.lit(None).cast("bigint").alias(c) for c in cols]

    a = textstats.token_count(docs).select(
        F.lit("count").alias("variant"), "doc_id", *_cnt_cols,
        _ent_null, *_nulls(_pii_cols))
    b = textstats.char_entropy(docs).select(
        F.lit("entropy").alias("variant"), "doc_id", *_nulls(_cnt_cols),
        "char_entropy", *_nulls(_pii_cols))
    red = privacy.redact_pii(_pii_augmented(docs))
    c = red.select(
        F.lit("pii").alias("variant"), "doc_id", *_nulls(_cnt_cols),
        _ent_null,
        "n_pii_email", "n_pii_ip", "n_pii_phone", "n_pii_longid",
        F.length("text_redacted").cast("bigint").alias("red_len"),
        F.conv(F.substring(F.md5("text_redacted"), 1, 15), 16, 10)
        .cast("bigint").alias("red_fp"),
    )
    return a.unionByName(b).unionByName(c)


def _token_count_sql():
    from diive_spark.operators.privacy import pii_sql_exprs
    counts, red = pii_sql_exprs("text")
    cnt_nulls = "CAST(NULL AS BIGINT) AS n_ws_tokens, CAST(NULL AS BIGINT) AS n_bpe_est"
    pii_nulls = ", ".join(
        f"CAST(NULL AS BIGINT) AS {c}"
        for c in ("n_pii_email", "n_pii_ip", "n_pii_phone", "n_pii_longid",
                  "red_len", "red_fp"))
    return f"""
SELECT 'count' AS variant, doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_ws_tokens,
       greatest(CAST(ceil(length(text) / 3.4) AS BIGINT),
                CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)) AS n_bpe_est,
       CAST(NULL AS DOUBLE) AS char_entropy, {pii_nulls}
FROM documents
UNION ALL
SELECT 'entropy' AS variant, doc_id, {cnt_nulls},
       char_entropy, {pii_nulls}
FROM (
  WITH g AS (
    SELECT doc_id, c, count(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
    GROUP BY 1, 2
  )
  SELECT doc_id,
         round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt) + 1e-9, 6)
           AS char_entropy
  FROM g GROUP BY 1
)
UNION ALL
SELECT 'pii' AS variant, doc_id, {cnt_nulls},
       CAST(NULL AS DOUBLE) AS char_entropy,
       {", ".join(counts)},
       CAST(length(redacted) AS BIGINT) AS red_len,
       ('0x' || substr(md5(redacted), 1, 15))::BIGINT AS red_fp
FROM (
  WITH aug AS (
    SELECT doc_id,
           text || ' contact u' || doc_id || '@ex' || (doc_id % 7) || '.com' ||
           CASE WHEN doc_id % 3 = 0 THEN
             ' call +' || (1 + doc_id % 89) || ' ' || (200 + doc_id % 700) ||
             ' ' || (100 + doc_id % 900) || ' ' || (1000 + doc_id % 9000)
           ELSE '' END ||
           CASE WHEN doc_id % 4 = 1 THEN
             ' from ' || (1 + doc_id % 223) || '.' || (doc_id % 256) ||
             '.' || ((doc_id * 7) % 256) || '.' || (1 + doc_id % 250)
           ELSE '' END ||
           CASE WHEN doc_id % 5 = 2 THEN
             ' acct ' || (1000000000000 + doc_id)
           ELSE '' END AS text
    FROM documents
  )
  SELECT doc_id, text, {red} AS redacted FROM aug
)
"""


SQL_TOKEN_COUNT = _token_count_sql()


def q_simhash(spark, sf_dir):
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, "doc_id")


SQL_SIMHASH = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM sh),
bits AS (
  SELECT doc_id, b.i AS bit,
         sum(CASE WHEN (hv >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 31)) AS i) b
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY 1
"""


def q_ann_cosine_topk(spark, sf_dir):
    """Union gate, two variants: 'topk' = exact brute-force cosine top-5
    per query; 'knn' = k-nearest-neighbour label vote
    (similarity.knn_classify, k=15 over the labeled embedding corpus —
    prediction, vote count, and summed-similarity weight all
    value-oracled; the tie-break chain count/weight/label is replayed by
    the SQL)."""
    from diive_spark.operators import similarity
    embs = _t(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id") < 10)
    _knn_nulls = [F.lit(None).cast("bigint").alias(c)
                  for c in ("pred_label", "n_votes")]
    a = similarity.cosine_topk_bruteforce(embs, q, k=5).select(
        F.lit("topk").alias("variant"), "query_id", "nbr_id", "sim", "rnk",
        *_knn_nulls, F.lit(None).cast("double").alias("w_sim"))
    b = similarity.knn_classify(embs, q, k=15).select(
        F.lit("knn").alias("variant"), "query_id",
        F.lit(None).cast("bigint").alias("nbr_id"),
        F.lit(None).cast("double").alias("sim"),
        F.lit(None).cast("bigint").alias("rnk"),
        "pred_label", F.col("n_votes").cast("bigint").alias("n_votes"),
        "w_sim")
    return a.unionByName(b)


SQL_ANN_COSINE_TOPK = """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS nbr_id, c.label AS nbr_label,
         round(1e-9 + list_dot_product(q.e, c.e) /
               (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS sim
  FROM v q JOIN v c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10
),
ranked AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id ASC) AS BIGINT) AS rnk
  FROM scored
),
votes AS (
  SELECT query_id, CAST(nbr_label AS BIGINT) AS lbl,
         CAST(count(*) AS BIGINT) AS n_votes,
         round(sum(sim) + 1e-9, 6) AS w_sim
  FROM ranked WHERE rnk <= 15
  GROUP BY 1, 2
),
winner AS (
  SELECT query_id, lbl AS pred_label, n_votes, w_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, w_sim DESC, lbl ASC) AS vr
  FROM votes
)
SELECT 'topk' AS variant, query_id, nbr_id, sim, rnk,
       CAST(NULL AS BIGINT) AS pred_label, CAST(NULL AS BIGINT) AS n_votes,
       CAST(NULL AS DOUBLE) AS w_sim
FROM ranked WHERE rnk <= 5
UNION ALL
SELECT 'knn' AS variant, query_id, CAST(NULL AS BIGINT) AS nbr_id,
       CAST(NULL AS DOUBLE) AS sim, CAST(NULL AS BIGINT) AS rnk,
       pred_label, n_votes, w_sim
FROM winner WHERE vr = 1
"""


def _augmented_embeddings(embs):
    """Deterministic near-dup copies (x -> x + 0.05 x^2 of every 20th
    vector, id + 10^7) — the synthetic embeddings have no natural pairs
    above cos ~0.5, so true near-dup gates plant their own. Shared by the
    ann_ivf 'semdedup' variant and embedding_near_dups; the SQL oracles
    replay it with list_transform."""
    e = F.col("embedding").cast("array<double>")
    dupes = embs.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(e, lambda x: x + F.lit(0.05) * x * x).alias("embedding"),
    )
    return embs.select("vec_id", e.alias("embedding")).unionByName(dupes)


def q_embedding_near_dups(spark, sf_dir):
    """Bucketed hyperplane-LSH plan with inline verify at a TRUE near-dup
    threshold (cos >= 0.8) and corpus-sized planes (n_planes='auto') —
    the plan you'd run at 100x, certified at the regime where LSH is
    subquadratic (rho = ln(0.795)/ln(0.5) = 0.33; r6 showed the loose
    cos-0.35 regime degenerating at 20k vectors, so that setting is now
    test-only). The corpus is augmented with deterministic nonlinear
    copies (cos ~0.995 to their originals) built identically by both
    engines; qualifying pairs are exactly those copies, whose per-pair
    miss prob is (1 - p^planes)^32 with p = 1 - acos(0.995)/pi ~= 0.968
    — < 1e-19 at any auto plane count the gated scales produce — so the
    all-pairs SQL below is an exact oracle (verified: 0 missed pairs at
    sf0.001, sf0.01 and the sf1 rehearsal). The naive all-pairs
    dedup.embedding_near_dups remains as the test-only baseline."""
    from diive_spark.operators import similarity
    embs = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_lsh_pairs(
        _augmented_embeddings(embs), threshold=0.8,
        n_planes="auto", n_tables=32)


SQL_EMBEDDING_NEAR_DUPS = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000, list_transform(embedding::DOUBLE[],
                                           x -> x + 0.05 * x * x)
  FROM embeddings WHERE vec_id % 20 = 0
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(1e-9 + list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.8 - 5e-7
  AND round(1e-9 + list_dot_product(a.e, b.e) /
            (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.8
"""


def q_minhash_lsh(spark, sf_dir):
    """MinHash LSH near-dup pairs. The banding is probabilistic but
    DETERMINISTIC (md5-derived band hashes), so the SQL oracle reproduces the
    entire pipeline — signatures, bucketing, exact-Jaccard verify — and the
    gate is a full value check, not rows-only. Recall properties are covered
    by tests/test_dedup_similarity.py.

    CERTIFIES THE CAPPED PLAN: shingles in more than ``max_doc_freq``
    documents are dropped BEFORE signatures and verification (the standard
    stop-shingle preprocessing; Jaccard is then defined over the capped
    universe), so the certified bucketing is the one whose buckets stay
    bounded at web scale."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.02,
                                   max_doc_freq=5)


def q_ann_ivf(spark, sf_dir):
    """Union gate, two variants sharing the deterministic quantizer
    (md5-ordered centroid pick, tie-broken cell assignment): 'ivf' = IVF
    approximate top-k (recall vs brute force covered by
    tests/test_dedup_similarity.py); 'semdedup' = SemDeDup semantic dedup
    (similarity.semdedup — cluster, compare within-cluster, keep the
    lowest-centroid-similarity member of each duplicate pair). The
    synthetic embeddings have no natural near-dups (max cos ~0.5), so the
    corpus is augmented with deterministic nonlinear copies
    (x -> x + 0.05 x^2 of every 20th vector, id + 10^7) built IDENTICALLY
    by both engines, making the oracle replay detection AND the keep rule
    end to end."""
    from diive_spark.operators import similarity
    embs = _t(spark, sf_dir, "embeddings")
    _sd = ("vec_id", "centroid_id", "centroid_sim", "is_removed")
    a = similarity.cosine_topk_ivf(
        embs, embs.filter(F.col("vec_id") < 10), k=5, n_centroids=8, nprobe=4
    ).select(
        F.lit("ivf").alias("variant"), "query_id", "nbr_id", "sim", "rnk",
        F.lit(None).cast("bigint").alias("vec_id"),
        F.lit(None).cast("bigint").alias("centroid_id"),
        F.lit(None).cast("double").alias("centroid_sim"),
        F.lit(None).cast("int").alias("is_removed"),
    )
    aug = _augmented_embeddings(embs)
    b = similarity.semdedup(
        aug, n_clusters=8, threshold=0.9, refine_iters=0
    ).select(
        F.lit("semdedup").alias("variant"),
        F.lit(None).cast("bigint").alias("query_id"),
        F.lit(None).cast("bigint").alias("nbr_id"),
        F.lit(None).cast("double").alias("sim"),
        F.lit(None).cast("bigint").alias("rnk"),
        "vec_id", F.col("centroid_id").cast("bigint").alias("centroid_id"),
        "centroid_sim", "is_removed",
    )
    return a.unionByName(b)


QUERIES.update({
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "token_count": q_token_count,
    "simhash": q_simhash,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "minhash_lsh": q_minhash_lsh,
    "ann_ivf": q_ann_ivf,
})

ORACLES.update({
    "dedup_exact": SQL_DEDUP_EXACT,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "token_count": SQL_TOKEN_COUNT,
    "simhash": SQL_SIMHASH,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
})


# ---------------------------------------------------------------------------
# analytics extras: 2-D grid agg, cumulatives, hires broadcast-back, filters
# ---------------------------------------------------------------------------

def q_grid_agg_2d(spark, sf_dir):
    from diive_spark.operators import gridagg
    ev = _t(spark, sf_dir, "events").withColumn("hour", F.hour("ts").cast("double"))
    out = gridagg.grid_aggregate(
        ev, "value", "hour", "value", "equal_width",
        n_bins_x=10, n_bins_y=6, x_range=(-100.0, 100.0), y_range=(0.0, 24.0),
        aggfunc="mean", min_n_vals_per_bin=3,
    )
    return out.select("xbin", "ybin", "n_vals", _r6("agg_value").alias("mean_z"))


SQL_GRID_AGG_2D = """
WITH b AS (
  SELECT CASE WHEN floor((value - (-100.0)) / 20.0) >= 10 THEN 9
              ELSE CAST(floor((value - (-100.0)) / 20.0) AS INTEGER) END AS xbin,
         CASE WHEN floor(hour(ts) / 4.0) >= 6 THEN 5
              ELSE CAST(floor(hour(ts) / 4.0) AS INTEGER) END AS ybin,
         value
  FROM events
  WHERE value BETWEEN -100.0 AND 100.0 AND hour(ts) BETWEEN 0 AND 24
)
SELECT xbin, ybin, count(value) AS n_vals,
       CASE WHEN count(value) >= 3 THEN round(1e-9 + avg(value), 6) END AS mean_z
FROM b GROUP BY 1, 2
"""


def q_grid_agg_2d_quantile(spark, sf_dir):
    """GridAggregator quantile path (pd.qcut ≙): bin edges are exact
    interpolating percentiles (one distributed aggregate — verified
    bit-identical to DuckDB quantile_cont), bucketing is a pure CASE
    expression. No global window, no rowid join (the round-2 scale-killer);
    plan contains no Window at all (asserted in tests/test_analytics.py)."""
    from diive_spark.operators import gridagg
    ev = _t(spark, sf_dir, "events").select(
        F.col("value").alias("x"),
        # decorrelated continuous second axis: sub-second microseconds
        (F.unix_micros(F.col("ts").cast("timestamp")) % 1000000 / F.lit(10000.0)).alias("y"),
    )
    out = gridagg.grid_aggregate(
        ev, "x", "y", "x", "quantile",
        n_bins_x=4, n_bins_y=4, aggfunc="mean", min_n_vals_per_bin=3,
    )
    return out.select("xbin", "ybin", "n_vals", _r6("agg_value").alias("mean_z"))


SQL_GRID_AGG_2D_QUANTILE = """
WITH src AS (
  SELECT value AS x, (epoch_us(ts) % 1000000) / 10000.0 AS y FROM events
),
e AS (
  SELECT quantile_cont(x, [0.25, 0.5, 0.75]) AS xe,
         quantile_cont(y, [0.25, 0.5, 0.75]) AS ye
  FROM src
),
b AS (
  SELECT CASE WHEN x <= xe[1] THEN 0 WHEN x <= xe[2] THEN 1
              WHEN x <= xe[3] THEN 2 ELSE 3 END AS xbin,
         CASE WHEN y <= ye[1] THEN 0 WHEN y <= ye[2] THEN 1
              WHEN y <= ye[3] THEN 2 ELSE 3 END AS ybin,
         x
  FROM src, e
)
SELECT xbin, ybin, count(x) AS n_vals,
       CASE WHEN count(x) >= 3 THEN round(1e-9 + avg(x), 6) END AS mean_z
FROM b GROUP BY 1, 2
"""


def q_doy_cumulative(spark, sf_dir):
    """Integer-exact gate feed (sf1 rehearsal lesson, same pattern as the
    quadrature gate): daily sums of centi-unit integers are exact doubles,
    so the per-year running sum is association-independent and the BIGINT
    output is bit-identical across engines at any scale."""
    from diive_spark.operators import features
    ev = _t(spark, sf_dir, "events").withColumn(
        "value", F.round(F.col("value") * 100, 0))
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(F.sum("value").alias("v"))
    out = features.doy_cumulatives_per_year(daily, "d", "v")
    return out.select("year", "doy",
                      F.col("cumsum").cast("long").alias("cum_v"))


SQL_DOY_CUMULATIVE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, sum(round(value * 100)) AS v
  FROM events GROUP BY 1
)
SELECT year(d) AS year, dayofyear(d) AS doy,
       CAST(sum(v) OVER (PARTITION BY year(d) ORDER BY dayofyear(d)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_v
FROM daily
"""


def q_agg_as_hires(spark, sf_dir):
    from diive_spark.operators import frames
    ev = _t(spark, sf_dir, "events")
    out = frames.aggregated_as_hires(ev, "ts", "value", "day", "mean")
    return out.select("event_id", _r6("value_mean_day").alias("daily_mean"))


SQL_AGG_AS_HIRES = """
SELECT event_id,
       round(1e-9 + avg(value) OVER (PARTITION BY date_trunc('day', ts)), 6) AS daily_mean
FROM events
"""


def q_keep_records_where(spark, sf_dir):
    from diive_spark.operators import frames
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    out = frames.keep_records_where(ev, "value", -10.0, 10.0,
                                    protect_cols=["event_id"])
    return out.select("event_id", _r6("value").alias("value_kept"))


SQL_KEEP_RECORDS_WHERE = """
SELECT event_id,
       CASE WHEN value >= -10.0 AND value <= 10.0 THEN round(1e-9 + value, 6) END AS value_kept
FROM events
"""


QUERIES.update({
    "grid_agg_2d": q_grid_agg_2d,
    "grid_agg_2d_quantile": q_grid_agg_2d_quantile,
    "doy_cumulative": q_doy_cumulative,
    "agg_as_hires": q_agg_as_hires,
    "keep_records_where": q_keep_records_where,
})
ORACLES.update({
    "grid_agg_2d": SQL_GRID_AGG_2D,
    "grid_agg_2d_quantile": SQL_GRID_AGG_2D_QUANTILE,
    "doy_cumulative": SQL_DOY_CUMULATIVE,
    "agg_as_hires": SQL_AGG_AS_HIRES,
    "keep_records_where": SQL_KEEP_RECORDS_WHERE,
})


#: date window for the restricted variant (events span 2024-01, all sf)
_RESTRICT_LO, _RESTRICT_HI = "2024-01-05 00:00:00", "2024-01-20 00:00:00"


def q_stepwise_screening(spark, sf_dir):
    """Chained outlier tests + QCF + cleaned hourly resample (the reference's
    StepwiseMeteoScreeningDb flow, meteoscreening.py:37). Union gate, two
    variants: 'plain' = the r2 screening chain unchanged; 'restricted' = the
    SAME chain with the absolute-limits flag date-restricted via
    restrict_application (reference preprocessing/qaqc/flags.py:18) to
    [2024-01-05, 2024-01-20] — outside the window the test is untested
    (NULL flag, QCF 'otherwise 0' arm), so violations there stay in the
    cleaned series. Value-oracled end to end."""
    from diive_spark.operators.stepwise import StepwiseScreening
    ev = _t(spark, sf_dir, "events")

    def screen(restrict):
        s = StepwiseScreening(ev, ["event_type"], "ts", "value") \
            .flag_absolute_limits(-60.0, 60.0)
        if restrict:
            s = s.restrict_application([[_RESTRICT_LO, _RESTRICT_HI]])
        out = s.flag_zscore(thres=3.0).finalize(resample_tier="1h")
        return out.select(
            F.lit("restricted" if restrict else "plain").alias("variant"),
            "event_type", "window_end",
            F.col("value_CLEANED_cnt").alias("cnt"),
            _r6("value_CLEANED_mean").alias("mean_clean"),
        )

    return screen(False).unionByName(screen(True))


SQL_STEPWISE_SCREENING = f"""
WITH flagged AS (
  SELECT event_type, ts, value,
         CASE WHEN value < -60.0 OR value > 60.0 THEN 2 ELSE 0 END AS f1,
         CASE WHEN abs((value - avg(value) OVER (PARTITION BY event_type))
                       / nullif(stddev_pop(value) OVER (PARTITION BY event_type), 0)) > 3.0
              THEN 2 ELSE 0 END AS f2
  FROM events WHERE value IS NOT NULL
),
restricted AS (
  -- restrict_application semantics: the abs-limits flag applies only inside
  -- the window; elsewhere the test is untested (NULL -> contributes 0)
  SELECT event_type, ts, value,
         CASE WHEN ts >= TIMESTAMP '{_RESTRICT_LO}'
                   AND ts <= TIMESTAMP '{_RESTRICT_HI}'
              THEN f1 END AS f1r, f2
  FROM flagged
),
cleaned AS (
  SELECT 'plain' AS variant, event_type, ts, value
  FROM flagged WHERE f1 = 0 AND f2 = 0
  UNION ALL
  SELECT 'restricted' AS variant, event_type, ts, value
  FROM restricted WHERE coalesce(f1r, 0) = 0 AND f2 = 0
)
SELECT variant, event_type,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       count(value) AS cnt,
       round(1e-9 + avg(value), 6) AS mean_clean
FROM cleaned GROUP BY 1, 2, 3
"""


def q_profile_lineitem(spark, sf_dir):
    from diive_spark.operators import sstats as ss
    li = _t(spark, sf_dir, "lineitem")
    prof = ss.profile_dataframe(li, cols=["l_quantity", "l_extendedprice", "l_discount"])
    return prof.select(
        "column", "n", "n_missing",
        _r6("mean").alias("mean_v"), _r6("sd").alias("sd_v"),
        _r6("min").alias("min_v"), _r6("q25").alias("q25_v"),
        _r6("median").alias("median_v"), _r6("q75").alias("q75_v"),
        _r6("max").alias("max_v"),
    )


def _profile_col_sql(c):
    return f"""
SELECT '{c}' AS "column", count({c}) AS n, count(*) - count({c}) AS n_missing,
       round(1e-9 + avg({c}), 6) AS mean_v, round(1e-9 + stddev_samp({c}), 6) AS sd_v,
       round(1e-9 + min({c}), 6) AS min_v, round(1e-9 + quantile_cont({c}, 0.25), 6) AS q25_v,
       round(1e-9 + quantile_cont({c}, 0.5), 6) AS median_v,
       round(1e-9 + quantile_cont({c}, 0.75), 6) AS q75_v, round(1e-9 + max({c}), 6) AS max_v
FROM lineitem"""


SQL_PROFILE_LINEITEM = " UNION ALL ".join(
    _profile_col_sql(c) for c in ["l_quantity", "l_extendedprice", "l_discount"]
)


QUERIES.update({
    "stepwise_screening": q_stepwise_screening,
    "profile_lineitem": q_profile_lineitem,
})
ORACLES.update({
    "stepwise_screening": SQL_STEPWISE_SCREENING,
    "profile_lineitem": SQL_PROFILE_LINEITEM,
})


def q_minhash_signatures(spark, sf_dir):
    """Long-form MinHash signatures — verifies the universal-hash MinHash
    math itself against SQL (the LSH banding on top stays rows-only)."""
    from diive_spark.operators import dedup
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(docs, "doc_id", k=16, seed=42)
    long = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("perm"), F.col(f"mh_{i}").alias("minhash"))
                for i in range(16)
            ])
        ).alias("s"),
    ).select("doc_id", F.col("s.perm").cast("bigint").alias("perm"), "s.minhash")
    return long


def _minhash_sql():
    import random
    rng = random.Random(42)
    p = (1 << 31) - 1
    perms = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(16)]
    perm_rows = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(perms))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM sh),
perms(perm, a, b) AS (VALUES {perm_rows})
SELECT doc_id, CAST(perm AS BIGINT) AS perm,
       min((a * hv + b) % {p}) AS minhash
FROM h CROSS JOIN perms
GROUP BY doc_id, perm
"""


QUERIES["minhash_signatures"] = q_minhash_signatures
ORACLES["minhash_signatures"] = _minhash_sql()



def _minhash_lsh_sql(threshold=0.02, k=16, bands=4, seed=42, max_doc_freq=5):
    """Full MinHash-LSH pipeline in SQL: signatures -> md5 band hashes ->
    bucket-join candidates -> exact-Jaccard verify. Reproduces the Spark
    plan's bucketing exactly (band hash = md5 of the comma-joined row
    values), so the gated query is fully oracled, not rows-only. The
    ``max_doc_freq`` HAVING filter mirrors dedup.cap_shingle_doc_freq:
    signatures, candidate buckets AND the Jaccard verify all run on the
    capped shingle universe."""
    import random
    rng = random.Random(seed)
    p = (1 << 31) - 1
    perms = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(k)]
    perm_rows = ", ".join(f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(perms))
    rows = k // bands
    mh_cols = ",\n       ".join(
        f"max(CASE WHEN perm = {i} THEN mh END) AS mh_{i}" for i in range(k)
    )
    band_cases = " ".join(
        "WHEN {b} THEN {expr}".format(
            b=b,
            expr=" || ',' || ".join(f"mh_{b * rows + r}::VARCHAR" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh_raw AS (
  SELECT DISTINCT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM toks, (SELECT unnest(generate_series(1, 2000)) AS i) g
  WHERE i + 2 <= len(words)
),
keep AS (SELECT shingle FROM sh_raw GROUP BY 1 HAVING count(*) <= {max_doc_freq}),
sh AS (SELECT sh_raw.* FROM sh_raw JOIN keep USING (shingle)),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS hv FROM sh),
perms(perm, a, b) AS (VALUES {perm_rows}),
sig AS (
  SELECT doc_id, perm, min((a * hv + b) % {p}) AS mh
  FROM h CROSS JOIN perms GROUP BY 1, 2
),
wide AS (SELECT doc_id, {mh_cols} FROM sig GROUP BY doc_id),
bandlong AS (
  SELECT doc_id, b.band,
         ('0x' || substr(md5(CASE b.band {band_cases} END), 1, 8))::BIGINT AS bh
  FROM wide, (SELECT unnest(generate_series(0, {bands - 1})) AS band) b
),
cands AS (
  SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
  FROM bandlong a JOIN bandlong c ON a.band = c.band AND a.bh = c.bh
  WHERE a.doc_id < c.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT cand.id1, cand.id2, count(*) AS n_int
  FROM cands cand
  JOIN sh s1 ON s1.doc_id = cand.id1
  JOIN sh s2 ON s2.doc_id = cand.id2 AND s2.shingle = s1.shingle
  GROUP BY 1, 2
)
SELECT i.id1, i.id2,
       round(1e-9 + n_int / (z1.n_sh + z2.n_sh - n_int), 6) AS jaccard
FROM inter i
JOIN sizes z1 ON z1.doc_id = i.id1
JOIN sizes z2 ON z2.doc_id = i.id2
WHERE round(1e-9 + n_int / (z1.n_sh + z2.n_sh - n_int), 6) >= {threshold}
"""


ORACLES["minhash_lsh"] = _minhash_lsh_sql()


_IVF_NULLS = """CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS centroid_id,
       CAST(NULL AS DOUBLE) AS centroid_sim, CAST(NULL AS INTEGER) AS is_removed"""

SQL_ANN_IVF = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
hashed AS (
  SELECT vec_id, e, ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM v
),
cents AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS centroid_id, e AS cent
  FROM (SELECT * FROM hashed ORDER BY h, vec_id LIMIT 8)
),
assign AS (
  SELECT vec_id, e, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rk
  FROM (
    SELECT v.vec_id, v.e, c.centroid_id,
           list_dot_product(v.e, c.cent)
           / nullif(sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.cent, c.cent)), 0) AS csim
    FROM v CROSS JOIN cents c
  )
),
assigned AS (SELECT vec_id AS nbr_id, e AS cv, centroid_id FROM assign WHERE rk = 1),
probes AS (
  SELECT vec_id AS query_id, e AS qv, centroid_id
  FROM assign WHERE vec_id < 10 AND rk <= 4
),
scored AS (
  SELECT p.query_id, a.nbr_id,
         round(1e-9 + list_dot_product(a.cv, p.qv)
               / nullif(sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(p.qv, p.qv)), 0), 6) AS sim
  FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
  WHERE p.query_id != a.nbr_id
),
aug AS (
  SELECT vec_id, e FROM v
  UNION ALL
  SELECT vec_id + 10000000, list_transform(e, x -> x + 0.05 * x * x)
  FROM v WHERE vec_id % 20 = 0
),
sd_hashed AS (
  SELECT vec_id, e, ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h
  FROM aug
),
sd_cents AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS centroid_id, e AS cent
  FROM (SELECT * FROM sd_hashed ORDER BY h, vec_id LIMIT 8)
),
sd_assign AS (
  SELECT vec_id, e, centroid_id, csim,
         row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id ASC) AS rk
  FROM (
    SELECT a.vec_id, a.e, c.centroid_id,
           list_dot_product(a.e, c.cent)
           / nullif(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.cent, c.cent)), 0) AS csim
    FROM aug a CROSS JOIN sd_cents c
  )
),
sd_assigned AS (
  SELECT vec_id, e, centroid_id, round(csim + 1e-9, 6) AS centroid_sim
  FROM sd_assign WHERE rk = 1
),
sd_pairs AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         a.centroid_sim AS cs1, b.centroid_sim AS cs2
  FROM sd_assigned a JOIN sd_assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE round(1e-9 + list_dot_product(a.e, b.e)
        / nullif(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)), 0), 6) >= 0.9
),
sd_removed AS (
  SELECT DISTINCT CASE WHEN cs1 > cs2 THEN id1
                       WHEN cs2 > cs1 THEN id2
                       ELSE greatest(id1, id2) END AS vec_id
  FROM sd_pairs
)
SELECT 'ivf' AS variant, query_id, nbr_id, sim,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, nbr_id ASC) AS BIGINT) AS rnk,
       {_IVF_NULLS}
FROM scored QUALIFY rnk <= 5
UNION ALL
SELECT 'semdedup' AS variant, CAST(NULL AS BIGINT) AS query_id,
       CAST(NULL AS BIGINT) AS nbr_id, CAST(NULL AS DOUBLE) AS sim,
       CAST(NULL AS BIGINT) AS rnk,
       a.vec_id, CAST(a.centroid_id AS BIGINT) AS centroid_id, a.centroid_sim,
       CAST(CASE WHEN r.vec_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS is_removed
FROM sd_assigned a LEFT JOIN sd_removed r USING (vec_id)
"""

ORACLES["ann_ivf"] = SQL_ANN_IVF


