"""End-to-end training-corpus curation: the full tokens-axis pipeline.

quality/repetition/corpus-LM filtering -> exact + near dedup -> train/eval
decontamination -> BPE tokenization -> fixed-length sequence packing ->
tier-0 ingest rollup of the resulting token table.

Every stage is the distributed-shaped operator (column-expression filters
riding one scan; bounded bucket joins for dedup; broadcast vocab joins;
one exchange for packing) — the same plan shapes the 100 TB deployment
uses. Run: python examples/corpus_curation.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from diive_spark.operators import bpe, dedup, resample, textstats, tokens
from diive_spark.session import get_spark

spark = get_spark("example-curation", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
n0 = docs.count()

# 1. map-side quality tier: length/stopword score + Gopher repetition
#    filters + CCNet corpus-LM score, all riding one scan
scored = textstats.repetition_stats(textstats.add_text_stats(docs))
lm = textstats.unigram_logprob_score(docs).select("doc_id", "unigram_lp")
scored = scored.join(F.broadcast(lm), "doc_id")
kept = scored.filter(
    (F.col("quality_score") >= 0.3)
    & (F.col("dup_2gram_frac") < 0.5)
    & (F.col("top_2gram_frac") < 0.5)
    & (F.col("max_word_run") <= 4)
)
n1 = kept.count()

# 2. exact dedup (hash groupBy), then MinHash-LSH near-dedup with
#    connected-components clustering; keep cluster canonicals
kept_docs = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
exact = kept_docs.join(
    dedup.exact_dedup(kept_docs, "doc_id").filter("is_dup = 0").select("doc_id"),
    "doc_id", "left_semi")
pairs = dedup.minhash_lsh_pairs(exact, "doc_id", threshold=0.6, max_doc_freq=20)
clustered = dedup.dedup_clusters(exact, pairs, "doc_id")
canon = clustered.filter("is_canonical").drop("cluster_id", "is_canonical")
n2 = canon.count()

# 3. decontamination: drop training docs sharing >= 13 8-gram word windows
#    with a held-out eval slice (here: every 50th doc plays eval)
tok0 = bpe.train_bpe(canon, num_merges=200)
train_tok = bpe.encode_to_token_table(canon, tok0)
eval_tok = train_tok.filter(F.col("doc_id") % 50 == 0)
train_tok = train_tok.filter(F.col("doc_id") % 50 != 0)
hits = tokens.token_ngram_overlap(train_tok, eval_tok, n=8) \
    .filter("n_shared >= 13").select(F.col("train_id").alias("doc_id")).distinct()
clean = train_tok.join(hits, "doc_id", "left_anti")
n3 = clean.count()

# 4. pack into fixed-length training examples (concat-and-chunk)
packed = tokens.pack_sequences(clean, seq_len=256, eos_id=0, parts=8)
stats = packed.agg(
    F.count("*").alias("examples"), F.sum("n_real").alias("real_tokens"),
    F.sum(F.when(F.col("n_real") < 256, 256 - F.col("n_real"))
          .otherwise(0)).alias("pad_tokens")).collect()[0]

# 5. tier-0 ingest rollup over the curated token table (synthetic arrival
#    times: one doc per 10 s)
timed = clean.withColumn(
    "event_time", F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 10))
t1m = resample.rollup(timed, "event_time", ["n_tok"], "1m", key_cols=["source"])

print(f"documents:            {n0}")
print(f"after quality tier:   {n1}")
print(f"after dedup:          {n2}")
print(f"after decontam:       {n3}")
print(f"training examples:    {stats['examples']} x 256 "
      f"({stats['real_tokens']} real / {stats['pad_tokens']} pad tokens)")
print(f"BPE vocab:            {len(tok0.vocab)}")
print("tier-0 rollup of the curated table:")
t1m.orderBy("source", "window_start").show(5)
