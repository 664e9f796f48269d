#!/usr/bin/env python
"""Generate an sf1 rehearsal dataset (10x sf0.1) at /tmp/sf1.

Mirrors the driver's scaling law (TESTDATA.md: time ranges FIXED, row
density x10, key spaces x10): each fact/dim table is 10 key-offset
replicas of the read-only sf0.1 parquet; region/nation stay as-is.
Text and embeddings are deterministically perturbed per replica so
near-dup structure is per-replica (10 independent corpora — how a real
10x corpus behaves) and no exact cross-replica ties exist in top-k
paths. Pure DuckDB, seedless-deterministic (all perturbations are
arithmetic in existing keys). Used for the sf1 oracle rehearsal:

    python scripts/gen_sf1.py
    SPARK_GRAFT_TEST_SF=/tmp/sf1 python -m pytest tests/test_oracle_parity.py
"""

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/tmp/sf1")
REPS = 10

# key offsets = sf0.1 key-space sizes
K = {"cust": 15_000, "supp": 1_000, "part": 20_000, "order": 150_000,
     "event": 100_000, "doc": 5_000, "vec": 2_000, "user": 20_000}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t, sql):
        con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    reps = f"(SELECT unnest(range({REPS})) AS rep)"

    write("region", f"SELECT * FROM {src('region')}")
    write("nation", f"SELECT * FROM {src('nation')}")
    write("customer", f"""
        SELECT c_custkey + rep * {K['cust']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, {reps}""")
    write("supplier", f"""
        SELECT s_suppkey + rep * {K['supp']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')}, {reps}""")
    write("part", f"""
        SELECT p_partkey + rep * {K['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src('part')}, {reps}""")
    write("orders", f"""
        SELECT o_orderkey + rep * {K['order']} AS o_orderkey,
               o_custkey + rep * {K['cust']} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, {reps}""")
    write("lineitem", f"""
        SELECT l_orderkey + rep * {K['order']} AS l_orderkey,
               l_partkey + rep * {K['part']} AS l_partkey,
               l_suppkey + rep * {K['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, {reps}""")
    write("events", f"""
        SELECT event_id + rep * {K['event']} AS event_id, ts,
               user_id + rep * {K['user']} AS user_id, event_type, value,
               props
        FROM {src('events')}, {reps}""")
    # per-replica token appended (rep>0) so cross-replica texts are neither
    # exact nor near duplicates; n_chars recomputed to stay consistent
    write("documents", f"""
        SELECT doc_id + rep * {K['doc']} AS doc_id,
               CASE WHEN rep = 0 THEN text
                    ELSE text || ' r' || rep END AS text,
               lang, source,
               length(CASE WHEN rep = 0 THEN text
                           ELSE text || ' r' || rep END) AS n_chars
        FROM {src('documents')}, {reps}""")
    # tiny deterministic per-replica, per-element perturbation: keeps
    # cluster geometry, removes exact cosine ties across replicas
    write("embeddings", f"""
        SELECT vec_id + rep * {K['vec']} AS vec_id,
               CAST(list_transform(
                   list_zip(embedding,
                            range(1, len(embedding) + 1)) ,
                   p -> CAST(p[1] + ((vec_id * 31 + p[2] + rep * 7) % 13 - 6)
                             * 1e-4 AS FLOAT)) AS FLOAT[]) AS embedding,
               label
        FROM {src('embeddings')}, {reps}""")


if __name__ == "__main__":
    main()
