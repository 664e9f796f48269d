"""Round-6 corpus-pipeline additions: PII redaction, paragraph-level
keep-first dedup, deterministic epoch shuffle, char entropy, vocab/Zipf
stats — each against an independent Python/numpy oracle (the gate parity
in test_oracle_parity covers the DuckDB replay; these pin the semantics
on adversarial micro-fixtures the synthetic corpus can't produce)."""

import math
import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from diive_spark.operators import dedup, mixing, privacy, textstats


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

PII_DOCS = [
    (1, "reach me at jane.doe+spam@mail.example.org or bob@x.io thanks"),
    (2, "server 10.0.0.1 talked to 192.168.255.254 and 8.8.8.8"),
    (3, "call +1 555 012 3456 or +44 20 7946 0958 now"),
    (4, "card 4111111111111111 ref 12345678901234 short 123456789012"),
    (5, "clean text with no identifiers at all"),
    (6, "mixed a@b.co 1.2.3.4 +49 30 1234 5678 9999888877776666"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_pii_counts(pii_df):
    got = {r["doc_id"]: r for r in privacy.redact_pii(pii_df).collect()}
    want = {
        1: (2, 0, 0, 0), 2: (0, 3, 0, 0), 3: (0, 0, 2, 0),
        4: (0, 0, 0, 2), 5: (0, 0, 0, 0), 6: (1, 1, 1, 1),
    }
    for doc_id, (em, ip, ph, lid) in want.items():
        r = got[doc_id]
        assert (r["n_pii_email"], r["n_pii_ip"], r["n_pii_phone"],
                r["n_pii_longid"]) == (em, ip, ph, lid), doc_id


def test_pii_redaction_masks_everything(pii_df):
    red = {r["doc_id"]: r["text_redacted"]
           for r in privacy.redact_pii(pii_df).collect()}
    assert red[1] == "reach me at <EMAIL> or <EMAIL> thanks"
    assert red[2] == "server <IP> talked to <IP> and <IP>"
    assert red[3] == "call <PHONE> or <PHONE> now"
    # 12-digit run is below the longid floor and survives
    assert red[4] == "card <ID> ref <ID> short 123456789012"
    assert red[5] == PII_DOCS[4][1]
    assert red[6] == "mixed <EMAIL> <IP> <PHONE> <ID>"
    # nothing matchable remains anywhere
    for cat, pat, _ in privacy.PII_PATTERNS:
        for t in red.values():
            t_py = t.replace("<EMAIL>", "").replace("<IP>", "")
            assert not re.search(pat, t_py), (cat, t)


# ---------------------------------------------------------------------------
# paragraph dedup
# ---------------------------------------------------------------------------

def test_paragraph_dedup_keep_first(spark):
    rows = [
        (1, "alpha beta\ncommon para\ngamma"),
        (2, "common para\ndelta"),          # loses the repeat (doc 1 is first)
        (3, "common para"),                 # loses its only para -> empty
        (4, "delta\nalpha beta"),           # both already seen -> empty
        (5, "unique tail\ncommon para"),    # keeps only its unique para
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_paras_kept"])
           for r in dedup.paragraph_dedup(df).collect()}
    assert got[1] == ("alpha beta\ncommon para\ngamma", 3)
    assert got[2] == ("delta", 1)
    assert got[3] == ("", 0)
    assert got[4] == ("", 0)
    assert got[5] == ("unique tail", 1)


def test_paragraph_dedup_first_within_doc(spark):
    # the repeat INSIDE one doc: position order decides, text order kept
    df = spark.createDataFrame(
        [(7, "x\ny\nx\nz")], "doc_id long, text string")
    got = dedup.paragraph_dedup(df).collect()[0]
    assert got["text"] == "x\ny\nz"
    assert got["n_paras_kept"] == 3


# ---------------------------------------------------------------------------
# deterministic shuffle
# ---------------------------------------------------------------------------

def test_deterministic_shuffle_is_a_permutation_and_shard_invariant(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["shuffle_pos"] for r in
         mixing.deterministic_shuffle(df, seed=3, epoch=0).collect()}
    assert sorted(a.values()) == list(range(500))
    # shard count is an execution knob, not a semantic one
    b = {r["doc_id"]: r["shuffle_pos"] for r in
         mixing.deterministic_shuffle(df, seed=3, epoch=0, num_shards=5).collect()}
    assert a == b
    # a different epoch is a genuinely different permutation
    c = {r["doc_id"]: r["shuffle_pos"] for r in
         mixing.deterministic_shuffle(df, seed=3, epoch=1).collect()}
    assert sorted(c.values()) == list(range(500))
    assert a != c


def test_deterministic_shuffle_matches_hash_rank_oracle(spark):
    import hashlib

    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["shuffle_pos"] for r in
           mixing.deterministic_shuffle(df, seed=9, epoch=2).collect()}
    keys = {i: int(hashlib.md5(f"{i}:9:2".encode()).hexdigest()[:8], 16)
            for i in range(200)}
    order = sorted(range(200), key=lambda i: (keys[i], i))
    want = {doc: pos for pos, doc in enumerate(order)}
    assert got == want


# ---------------------------------------------------------------------------
# entropy / vocab / zipf
# ---------------------------------------------------------------------------

def test_char_entropy_matches_numpy(spark):
    texts = ["aabbbc", "zzzz", "a", "the quick brown fox", "abab abab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["char_entropy"]
           for r in textstats.char_entropy(df).collect()}
    for i, t in enumerate(texts):
        _, counts = np.unique(list(t), return_counts=True)
        p = counts / counts.sum()
        want = round(float(-(p * np.log(p)).sum()) + 1e-9, 6)
        assert got[i] == pytest.approx(want, abs=2e-6), t
    assert got[1] == 0.0  # single-symbol text has zero entropy


def test_char_entropy_arrow_identical_to_fold(spark):
    """The r7 Arrow kernel must equal the pure-column sorted-run fold
    VALUE FOR VALUE on the tricky shapes: empty doc (split('') -> ['']),
    astral-plane codepoints (one element per codepoint, UTF-8 binary ==
    codepoint sort order), long runs, nulls."""
    texts = ["abc", "", "a\U0001D11Eb�z\U0001D11E", "aab", None,
             "x" * 500 + "y" * 3, "hello world " * 40, "éèe"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    arrow = {r["doc_id"]: r["char_entropy"]
             for r in textstats.char_entropy(df, impl="arrow").collect()}
    fold = {r["doc_id"]: r["char_entropy"]
            for r in textstats.char_entropy(df, impl="fold").collect()}
    assert arrow == fold
    assert arrow[1] == 0.0 and arrow[4] is None


def test_vocab_and_zipf(spark):
    df = spark.createDataFrame(
        [(1, "a", "b b a c"), (2, "a", "b a"), (3, "x", "d d d")],
        "doc_id long, source string, text string")
    v = {r["source"]: r for r in textstats.vocab_stats(df).collect()}
    assert (v["a"]["n_tokens"], v["a"]["n_types"]) == (6, 3)
    assert v["a"]["ttr"] == pytest.approx(0.5, abs=1e-6)
    assert (v["x"]["n_tokens"], v["x"]["n_types"]) == (3, 1)
    z = textstats.zipf_topk(df, k=2).collect()
    assert [(r["word"], r["cnt"], r["rank"]) for r in
            sorted(z, key=lambda r: r["rank"])] == [("b", 3, 1), ("d", 3, 2)]


def _h32_py(s):
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _dsir_oracle(raw, target, n_buckets, seed, alpha):
    """Independent pandas replay of dsir_logweights."""
    import math
    from collections import Counter

    def grams(text):
        ws = [w for w in text.split(" ") if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def buckets(corpus):
        out = []
        for _, t in corpus:
            out += [_h32_py(f"{g}:{seed}") % n_buckets for g in grams(t)]
        return out

    tb, rb = buckets(target), buckets(raw)
    ct, cr = Counter(tb), Counter(rb)
    dt, dr = len(tb) + alpha * n_buckets, len(rb) + alpha * n_buckets
    lr = {b: math.log((ct.get(b, 0) + alpha) / dt)
          - math.log((cr.get(b, 0) + alpha) / dr)
          for b in set(tb) | set(rb)}
    out = {}
    for i, t in raw:
        bs = [_h32_py(f"{g}:{seed}") % n_buckets for g in grams(t)]
        out[i] = round(sum(lr[b] for b in bs) + 1e-9, 6)
    return out


def test_dsir_weights_match_pandas_oracle_and_separate_styles(spark):
    """DSIR importance weights on a two-style corpus: (1) every per-doc
    logw equals the independent pandas/Counter replay; (2) docs written in
    the target's style score strictly higher on average; (3) Gumbel top-k
    selection is deterministic and enriches the target style."""
    va = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    vb = ["one", "two", "three", "four", "five", "six"]

    def doc(vocab, i, n=12):
        return " ".join(vocab[(i * 7 + j * 3) % len(vocab)] for j in range(n))

    raw_rows = [(i, doc(va if i % 2 == 0 else vb, i)) for i in range(80)]
    tgt_rows = [(1000 + i, doc(va, i + 1)) for i in range(30)]
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id bigint, text string")

    from diive_spark.operators import mixing
    got = mixing.dsir_logweights(raw, tgt, n_buckets=512, seed=3) \
        .toPandas().set_index("doc_id")["logw"]
    want = _dsir_oracle(raw_rows, tgt_rows, 512, 3, 1.0)
    assert len(got) == 80
    for i, w in want.items():
        assert abs(got.loc[i] - w) <= 2e-6, (i, got.loc[i], w)

    a_mean = np.mean([want[i] for i in range(0, 80, 2)])
    b_mean = np.mean([want[i] for i in range(1, 80, 2)])
    assert a_mean > b_mean + 1.0

    sel = mixing.dsir_sample(raw, tgt, k=20, n_buckets=512, seed=3).toPandas()
    assert len(sel) == 20
    # deterministic rerun
    sel2 = mixing.dsir_sample(raw, tgt, k=20, n_buckets=512, seed=3).toPandas()
    assert list(sel["doc_id"]) == list(sel2["doc_id"])
    # style-A enrichment: >= 80% of the selected docs are target-style
    assert (sel["doc_id"] % 2 == 0).mean() >= 0.8


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_round6_curation_plans_are_scale_shaped(spark):
    """Plan-shape pins for the round-6 curation operators (the properties
    a 100 TB run depends on):
    - deterministic_shuffle: per-shard offsets come back via a BROADCAST
      hash join, and the only single-partition exchange is the bounded
      (#shards-row) offset window — never the corpus;
    - dsir_logweights: the bucket-LM ratio table is broadcast (one
      BroadcastHashJoin); the only nested-loop joins are the two
      single-row total crossJoins;
    - semdedup (r7 plan): candidate pairs NEVER materialize as join rows
      — assignment is the slab-cogrouped Arrow kernel
      (FlatMapCoGroupsInPandas) and pair scoring is the block-pair
      grouped kernel (FlatMapGroupsInPandas keyed on centroid_id +
      block pair); the only join left is the bounded removed-ids
      left join."""
    from diive_spark.operators import mixing, similarity

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    p1 = _plan(mixing.deterministic_shuffle(docs))
    assert "BroadcastHashJoin" in p1
    assert p1.count("Exchange SinglePartition") == 1

    p2 = _plan(mixing.dsir_logweights(docs, docs.filter("lang = 'en'")))
    assert p2.count("BroadcastHashJoin") >= 1
    assert p2.count("BroadcastNestedLoopJoin") == 2

    embs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    p3 = _plan(similarity.semdedup(embs, n_clusters=6, refine_iters=0))
    assert "FlatMapCoGroupsInPandas" in p3   # slab-cogrouped assignment
    assert "FlatMapGroupsInPandas" in p3     # block-pair pair kernel
    pair_join = [l for l in p3.splitlines()
                 if "Join" in l and "_blk" in l]
    assert not pair_join, "pair join resurfaced — pairs must stay kernel-local"
    assert "BroadcastNestedLoop" not in p3


def _paragraph_dedup_oracle(rows, sep="\n"):
    """Pandas-free replay of the keep-first policy: global (doc_id, pos)
    order decides which occurrence of each paragraph survives."""
    seen = {}
    occ = []
    for doc_id, text in rows:
        for pos, para in enumerate(text.split(sep)):
            if para == "":
                continue
            occ.append((doc_id, pos, para))
    for doc_id, pos, para in sorted(occ):
        seen.setdefault(para, (doc_id, pos))
    out = {}
    for doc_id, text in rows:
        kept = [p for i, p in enumerate(text.split(sep))
                if p != "" and seen[p] == (doc_id, i)]
        out[doc_id] = (sep.join(kept), len(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", ""]),
             min_size=0, max_size=6),
    min_size=1, max_size=12))
def test_paragraph_dedup_property(spark, paras_per_doc):
    """Property: for ANY corpus (repeats within docs, across docs, empty
    paragraphs, all-boilerplate docs), paragraph_dedup equals the
    sequential keep-first oracle and conserves the doc set."""
    from diive_spark.operators import dedup
    rows = [(i, "\n".join(ps)) for i, ps in enumerate(paras_per_doc)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = dedup.paragraph_dedup(df).toPandas().set_index("doc_id")
    want = _paragraph_dedup_oracle(rows)
    assert len(got) == len(rows)
    for doc_id, (text, n) in want.items():
        assert got.loc[doc_id, "text"] == text, (doc_id, rows)
        assert int(got.loc[doc_id, "n_paras_kept"]) == n, (doc_id, rows)


def test_pii_fused_scan_nested_matches_cross_engine(spark):
    """r7 fused single-scan semantics: a category pattern nested INSIDE an
    earlier category's match is consumed by the alternation (leftmost,
    priority order) and not double-counted — and DuckDB's RE2 replay
    agrees with Spark's Java regex on exactly these adversarial spans."""
    import duckdb

    docs = [
        # 16-digit run inside an email local part: email wins, no longid
        (1, "pay 1234567890123456@bank.example now"),
        # IP-shaped domain is NOT an email (TLD must be letters): both
        # dotted quads count as IPs
        (2, "root@1.2.3.4 logged in from 5.6.7.8"),
        # back-to-back: email then adjacent longid still counted
        (3, "a@b.co 1234567890123456"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in privacy.redact_pii(df).collect()}
    assert (got[1]["n_pii_email"], got[1]["n_pii_longid"]) == (1, 0)
    assert (got[2]["n_pii_email"], got[2]["n_pii_ip"]) == (0, 2)
    assert (got[3]["n_pii_email"], got[3]["n_pii_longid"]) == (1, 1)

    counts, red = privacy.pii_sql_exprs("text")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", docs)
    want = con.execute(
        f"SELECT doc_id, {', '.join(counts)}, {red} AS text_redacted "
        "FROM t ORDER BY doc_id").df().set_index("doc_id")
    for doc_id in (1, 2, 3):
        r, w = got[doc_id], want.loc[doc_id]
        for c in ("n_pii_email", "n_pii_ip", "n_pii_phone", "n_pii_longid"):
            assert r[c] == w[c], (doc_id, c)
        assert r["text_redacted"] == w["text_redacted"]
