"""Training-data dedup: exact + MinHash LSH + SimHash on the documents table.

Run: python examples/dedup_documents.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diive_spark.session import get_spark
from diive_spark.operators import dedup

spark = get_spark("example-dedup", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
print("exact dup groups > 1:",
      dedup.exact_dedup(docs, "doc_id").filter("is_dup = 1").count())
print("MinHash-LSH near-dups (jaccard >= 0.02):")
dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.02).orderBy(
    "jaccard", ascending=False).show(5)
print("SimHash pairs within hamming 6:")
dedup.simhash_pairs(docs, "doc_id", max_hamming=6).show(5)
