"""Dedup / similarity / text / multimodal operators: internal-consistency
tests (LSH subset-of-exact, banded-simhash completeness, exact dedup on
seeded duplicates, ANN recall, multimodal plumbing)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_finds_seeded_dupes(spark, docs):
    # duplicate 10 docs under new ids -> they must map to the original id
    base = docs.limit(10).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    with_dupes = docs.select("doc_id", "text").unionByName(base)
    out = dedup.exact_dedup(with_dupes, "doc_id").toPandas()
    dup_rows = out[out["is_dup"] == 1]
    assert len(dup_rows) == 10
    assert (dup_rows["doc_id"] - 100000 == dup_rows["canonical_id"]).all()
    assert (out[out["doc_id"] < 10]["group_size"] == 2).all()


def test_minhash_lsh_subset_of_exact(spark, docs):
    exact = dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.02).toPandas()
    lsh = dedup.minhash_lsh_pairs(docs, "doc_id", threshold=0.02).toPandas()
    exact_pairs = set(zip(exact["id1"], exact["id2"]))
    lsh_pairs = set(zip(lsh["id1"], lsh["id2"]))
    # verify step kills false positives -> LSH output is a subset
    assert lsh_pairs <= exact_pairs
    # jaccard values agree where both found the pair
    merged = lsh.merge(exact, on=["id1", "id2"], suffixes=("_l", "_e"))
    np.testing.assert_allclose(merged["jaccard_l"], merged["jaccard_e"])


def test_minhash_finds_seeded_near_dupes(spark, docs):
    # a doc + its 90%-prefix are extremely similar -> banded MinHash must hit
    orig = docs.filter("doc_id < 20").select("doc_id", "text")
    mutated = orig.select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.substring("text", 1, (F.length("text") * 0.9).cast("int")).alias("text"),
    )
    both = orig.unionByName(mutated)
    found = dedup.minhash_lsh_pairs(both, "doc_id", threshold=0.5).toPandas()
    pairs = set(zip(found["id1"], found["id2"]))
    hits = sum((i, i + 500000) in pairs for i in range(20))
    assert hits >= 16  # banding s-curve: near-identical pairs ~always collide


def test_simhash_banded_pairs_complete(spark, docs):
    sig = dedup.simhash(docs.limit(120), "doc_id").toPandas()
    h = dict(zip(sig["doc_id"], sig["simhash"]))
    exact = {
        (a, b)
        for a in h for b in h if a < b
        and bin(h[a] ^ h[b]).count("1") <= 6
    }
    banded = dedup.simhash_pairs(docs.limit(120), "doc_id", max_hamming=6).toPandas()
    got = set(zip(banded["id1"], banded["id2"]))
    # pigeonhole: <=6 differing bits over 8 bands -> 2 bands equal -> complete
    assert got == exact


def test_ivf_recall_against_bruteforce(spark, embs):
    queries = embs.filter("vec_id < 10")
    bf = similarity.cosine_topk_bruteforce(embs, queries, k=5).toPandas()
    ivf = similarity.cosine_topk_ivf(embs, queries, k=5, n_centroids=8, nprobe=4).toPandas()
    bf_set = set(zip(bf["query_id"], bf["nbr_id"]))
    ivf_set = set(zip(ivf["query_id"], ivf["nbr_id"]))
    recall = len(bf_set & ivf_set) / len(bf_set)
    assert recall >= 0.5, f"IVF recall {recall}"
    # IVF results are true similarities (no fabricated scores)
    merged = ivf.merge(bf, on=["query_id", "nbr_id"], suffixes=("_i", "_b"))
    np.testing.assert_allclose(merged["sim_i"], merged["sim_b"])


def test_cosine_lsh_pairs_subset_and_recall(spark, embs):
    exact = dedup.embedding_near_dups(embs, threshold=0.35).toPandas()
    approx = similarity.cosine_lsh_pairs(embs, threshold=0.35).toPandas()
    e = set(zip(exact["id1"], exact["id2"]))
    a = set(zip(approx["id1"], approx["id2"]))
    assert a <= e
    if e:
        assert len(a) / len(e) >= 0.4, f"LSH recall {len(a)/len(e)}"


def test_text_stats_and_langid_deterministic(spark, docs):
    out = textstats.add_text_stats(docs).toPandas()
    assert (out["n_chars_c"] == out["n_chars"]).all()  # matches table metadata
    assert (out["quality_score"].between(0, 1)).all()
    lang = textstats.language_id(docs).toPandas()
    assert set(lang["pred_lang"]) <= set(textstats.LANG_MARKERS)
    fp = textstats.fingerprint(docs).toPandas()
    assert fp["fp"].nunique() == len(fp)  # distinct texts -> distinct prints


def test_repetition_stats_hand_computed(spark):
    """Gopher-style repetition signals on hand-computable fixtures:
    'a b a b a' -> 2-grams [ab, ba, ab, ba] = 2 dup of 4; 3-grams
    [aba, bab, aba] = 1 dup of 3; top 2-gram 'a b' 2/4; 3 distinct of
    5 words; max run 1. 'x x x y' -> run of 3. One-word docs get NULL
    n-gram fractions, not a crash."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["a b a b a", "x x x y", "solo"]})
    out = textstats.repetition_stats(spark.createDataFrame(pdf)) \
        .toPandas().set_index("doc_id")
    r1 = out.loc[1]
    np.testing.assert_allclose(r1["dup_2gram_frac"], 2 / 4, atol=1e-6)
    np.testing.assert_allclose(r1["dup_3gram_frac"], 1 / 3, atol=1e-6)
    np.testing.assert_allclose(r1["top_2gram_frac"], 2 / 4, atol=1e-6)
    np.testing.assert_allclose(r1["uniq_word_frac"], 2 / 5, atol=1e-6)
    assert r1["max_word_run"] == 1
    r2 = out.loc[2]
    assert r2["max_word_run"] == 3
    np.testing.assert_allclose(r2["uniq_word_frac"], 2 / 4, atol=1e-6)
    np.testing.assert_allclose(r2["dup_2gram_frac"], 1 / 3, atol=1e-6)  # xx xx xy
    r3 = out.loc[3]
    assert pd.isna(r3["dup_2gram_frac"]) and pd.isna(r3["dup_3gram_frac"])
    assert pd.isna(r3["top_2gram_frac"])
    assert r3["uniq_word_frac"] == 1.0 and r3["max_word_run"] == 1


def test_unigram_logprob_hand_computed(spark):
    """CCNet-style corpus-LM score: corpus 'a a b' + 'b c' -> p(a)=p(b)=0.4,
    p(c)=0.2; doc scores are the mean ln p(w). The scoring join must be a
    broadcast (the vocab side is bounded), not a shuffle join."""
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a a b", "b c"]})
    df = spark.createDataFrame(pdf)
    out = textstats.unigram_logprob_score(df).toPandas().set_index("doc_id")
    np.testing.assert_allclose(out.loc[1, "unigram_lp"], np.log(0.4), atol=1e-6)
    np.testing.assert_allclose(
        out.loc[2, "unigram_lp"], (np.log(0.4) + np.log(0.2)) / 2, atol=1e-6)
    assert out.loc[1, "n_words"] == 3 and out.loc[2, "n_words"] == 2
    plan = textstats.unigram_logprob_score(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media_table(spark, 32)
    feats = multimodal.extract_image_features(media, feat_dim=8).toPandas()
    assert len(feats) == 32
    assert all(len(f) == 8 for f in feats["feat"])
    assert (feats["mean_px"].between(0, 255)).all()
    # deterministic: same input -> same features
    again = multimodal.extract_image_features(media, feat_dim=8).toPandas()
    a = feats.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert (a["mean_px"] == b["mean_px"]).all()
    # PNG is decodable now (stdlib codec) — mislabelled garbage bytes fail
    # with a codec (signature) error, not the stub error
    bad = media.withColumn("media_type", F.lit("image/png"))
    with pytest.raises(Exception, match="not a PNG"):
        multimodal.extract_image_features(bad).collect()
    # JPEG is decodable now too (stdlib baseline codec) — mislabelled
    # garbage bytes fail with a codec (SOI signature) error, not the stub
    badjpg = media.withColumn("media_type", F.lit("image/jpeg"))
    with pytest.raises(Exception, match="not a JPEG"):
        multimodal.extract_image_features(badjpg).collect()
    # truly exotic formats still raise the documented stub error
    exotic = media.withColumn("media_type", F.lit("image/webp"))
    with pytest.raises(Exception, match="no decoder"):
        multimodal.extract_image_features(exotic).collect()
    frames = multimodal.frame_sample(media, every_n=2).toPandas()
    assert (frames["frame_idx"] == 0).all()  # fake format: 1 frame each


def test_short_documents_dont_crash_shingles(spark):
    # review regression: sequence(0, size-n) descends for docs with < n words
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["hello world", "one", "a b c d e"]})
    df = spark.createDataFrame(pdf)
    sh = dedup.word_shingles(df, "doc_id", n=3).toPandas()
    assert set(sh["doc_id"]) == {3}  # only the 5-word doc has 3-gram shingles
    assert dedup.ngram_jaccard_pairs(df, "doc_id").count() == 0
    sig = dedup.minhash_signatures(df, "doc_id").toPandas()
    assert set(sig["doc_id"]) == {3}


def test_adjacent_repeated_stopwords_counted(spark):
    # review regression: ' w ' needles must not overlap on shared spaces
    pdf = pd.DataFrame({"doc_id": [1], "text": ["the the the cat"],
                        "lang": ["en"], "source": ["s"], "n_chars": [15]})
    out = textstats.add_text_stats(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert out["n_words"] == 4
    np.testing.assert_allclose(out["stopword_ratio"], 3 / 4)


def test_gated_embedding_query_plan_is_bucketed(spark, embs):
    """The gated near-dup query (r7 regime: cos >= 0.8, auto planes,
    augmented corpus) must run the hyperplane-LSH plan: no O(n^2)
    BroadcastNestedLoopJoin / CartesianProduct anywhere in the physical
    plan, the inline verify keeps candidate pairs out of every Exchange
    (survivors-only distinct), and results are identical to the exact
    all-pairs baseline — planted copies sit at cos ~0.995 where the
    per-pair miss prob is < 1e-19."""
    from diive_spark.queries.llm import _augmented_embeddings
    aug = _augmented_embeddings(embs)
    out = similarity.cosine_lsh_pairs(aug, threshold=0.8,
                                      n_planes="auto", n_tables=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # single-pass candidate generation: all 32 table buckets in one
    # projection + posexplode, ONE candidate self-join — the only Union
    # is the corpus augmentation (2 branches), never a per-table fanout
    assert plan.count("Scan parquet") <= 4
    assert plan.count("Union") <= 2
    # bucket-local verification: no join at all — one grouped-map pass
    # over (table, bucket), then a survivors-only distinct
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 2
    exact = dedup.embedding_near_dups(aug, threshold=0.8).toPandas()
    got = out.toPandas()
    e = set(zip(exact["id1"], exact["id2"]))
    g = set(zip(got["id1"], got["id2"]))
    assert len(e) > 0  # augmentation actually planted qualifying pairs
    assert g == e
    # values match the exact baseline too
    em = exact.set_index(["id1", "id2"])["sim"]
    gm = got.set_index(["id1", "id2"])["sim"]
    np.testing.assert_allclose(gm.sort_index(), em.sort_index())


def test_ivf_centroids_no_single_task_stage(spark, embs):
    """Centroid pick must be a distributed TakeOrderedAndProject, not a
    global no-partition Window (which funnels the corpus into one task)."""
    cents = similarity._centroids(embs, "vec_id", "embedding", 8)
    plan = cents._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    pdf = cents.toPandas()
    assert sorted(pdf["centroid_id"]) == list(range(8))
    # deterministic across invocations
    again = similarity._centroids(embs, "vec_id", "embedding", 8).toPandas()
    assert (
        pdf.sort_values("centroid_id")["cent"].map(tuple).tolist()
        == again.sort_values("centroid_id")["cent"].map(tuple).tolist()
    )


def test_shingle_doc_freq_cap_shrinks_candidates(spark):
    """A stop-phrase shingle shared by every doc must not generate O(n^2)
    candidates once capped; distinct-overlap pairs still come through with
    exact Jaccard values."""
    stop = "the quick brown fox jumps over the lazy dog again and again"
    pdf = pd.DataFrame({
        "doc_id": range(40),
        # all docs share the stop phrase; only docs 0/1 share distinctive text
        "text": [
            stop + (" alpha beta gamma delta epsilon zeta" if i < 2 else f" unique{i} tok{i} w{i} x{i} y{i} z{i}")
            for i in range(40)
        ],
    })
    df = spark.createDataFrame(pdf)
    sh = dedup.word_shingles(df, "doc_id", n=3)
    capped = dedup.cap_shingle_doc_freq(sh, max_doc_freq=5)
    # stop-phrase shingles (df=40) are gone; distinctive ones survive
    assert capped.count() < sh.count()
    uncapped_pairs = dedup.ngram_jaccard_pairs(df, "doc_id", threshold=0.01).toPandas()
    capped_pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", threshold=0.01, max_doc_freq=5
    ).toPandas()
    # candidate generation shrank from all-pairs (every pair shares the stop
    # phrase) to only the distinct-overlap pair
    assert len(uncapped_pairs) == 40 * 39 / 2
    assert set(zip(capped_pairs["id1"], capped_pairs["id2"])) == {(0, 1)}
    # jaccard for the surviving pair is still computed over FULL shingle sets
    full_j = uncapped_pairs.set_index(["id1", "id2"]).loc[(0, 1), "jaccard"]
    np.testing.assert_allclose(capped_pairs["jaccard"].iloc[0], full_j)
    # minhash path: cap redefines the shingle universe but still finds the pair
    mh = dedup.minhash_lsh_pairs(df, "doc_id", threshold=0.5, max_doc_freq=5).toPandas()
    assert (0, 1) in set(zip(mh["id1"], mh["id2"]))


def test_audio_feature_plumbing(spark):
    """Audio multimodal path: fake PCM decodes, features are deterministic,
    zero-crossing rate tracks the planted tone frequency; real codecs raise
    the documented stub error."""
    audio = multimodal.synth_audio_table(spark, 16)
    feats = multimodal.extract_audio_features(audio).toPandas()
    assert len(feats) == 16
    assert (feats["duration_sec"] > 0.2).all() and (feats["duration_sec"] <= 1.01).all()
    assert (feats["rms"] > 1000).all()       # ~3000-amplitude tone
    assert (feats["peak"] <= 32767).all()
    # zcr of a tone ~ 2 * f0 / sr, f0 in [100, 1000] -> zcr in ~[0.01, 0.27]
    assert feats["zero_cross_rate"].between(0.005, 0.3).all()
    again = multimodal.extract_audio_features(audio).toPandas()
    assert (feats.sort_values("doc_id")["rms"].to_numpy()
            == again.sort_values("doc_id")["rms"].to_numpy()).all()
    bad = audio.withColumn("media_type", F.lit("audio/mp3"))
    with pytest.raises(Exception, match="no decoder"):
        multimodal.extract_audio_features(bad).collect()


def test_detect_new_columns(spark):
    import pandas as pd

    from diive_spark.operators import frames

    a = spark.createDataFrame(pd.DataFrame({"x": [1], "y": [2], "z": [3]}))
    b = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    assert frames.detect_new_columns(a, b) == ["y", "z"]
    assert frames.detect_new_columns(b, a) == []


def test_kmeans_refinement_improves_objective_and_is_deterministic(spark, embs):
    """Distributed k-means refinement: the clustering OBJECTIVE (mean
    assigned cosine) improves monotonically over Lloyd's iterations —
    that is the estimator's guarantee (recall at a fixed small nprobe is
    not monotone and is covered by the recall-band check below) — and the
    result is deterministic across runs."""
    from pyspark.sql import Window

    def mean_assigned_cos(cents):
        c = embs.select(F.col("vec_id").alias("_id"),
                        F.col("embedding").cast("array<double>").alias("cv"))
        w = Window.partitionBy("_id").orderBy(F.desc("csim"),
                                              F.asc("centroid_id"))
        a = (c.crossJoin(F.broadcast(cents))
             .withColumn("csim", similarity.cosine_expr(F.col("cv"),
                                                        F.col("cent")))
             .withColumn("r", F.row_number().over(w)).filter("r=1"))
        return a.agg(F.avg("csim")).collect()[0][0]

    seed = similarity._centroids(embs, "vec_id", "embedding", 8)
    obj = [mean_assigned_cos(seed)]
    for it in (1, 3):
        obj.append(mean_assigned_cos(
            similarity.kmeans_centroids(embs, n_centroids=8, n_iter=it)))
    assert obj[0] < obj[1] <= obj[2] + 1e-9, obj

    # refined IVF still lands in a sane recall band at a small probe budget
    queries = embs.filter(F.col("vec_id") < 12)
    exact = similarity.cosine_topk_bruteforce(embs, queries, k=5).toPandas()
    truth = set(zip(exact["query_id"], exact["nbr_id"]))
    got = similarity.cosine_topk_ivf(embs, queries, k=5, n_centroids=8,
                                     nprobe=2, refine_iters=3).toPandas()
    hit = set(zip(got["query_id"], got["nbr_id"]))
    assert len(hit & truth) / len(truth) > 0.35

    # deterministic: two runs give identical centroids
    a = similarity.kmeans_centroids(embs, n_centroids=8, n_iter=2).toPandas()
    b = similarity.kmeans_centroids(embs, n_centroids=8, n_iter=2).toPandas()
    av = a.sort_values("centroid_id")["cent"].map(tuple).tolist()
    bv = b.sort_values("centroid_id")["cent"].map(tuple).tolist()
    assert av == bv


# --------------------------------------------------------------------------- #
# Connected components / dedup clustering
# --------------------------------------------------------------------------- #
def _uf_oracle(pairs, ids=None):
    """Independent union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent):
        root = find(x)
        out[x] = root
    # canonical = min member per component
    comp_min = {}
    for x, r in out.items():
        comp_min.setdefault(r, x)
        comp_min[r] = min(comp_min[r], x)
    return {x: comp_min[r] for x, r in out.items()}


def test_connected_components_matches_union_find(spark):
    rng = np.random.default_rng(17)
    n = 400
    # chains, stars and random edges: multi-hop components
    pairs = [(i, i + 1) for i in range(0, 100, 2)]          # 2-chains
    pairs += [(200, 200 + k) for k in range(1, 12)]          # a star
    pairs += [(300 + i, 300 + i + 1) for i in range(20)]     # a long chain
    pairs += [(int(rng.integers(0, n)), int(rng.integers(0, n)))
              for _ in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    pdf = pd.DataFrame(pairs, columns=["id1", "id2"])
    got = dedup.connected_components(spark.createDataFrame(pdf)) \
        .toPandas().set_index("id")["component"].to_dict()
    want = _uf_oracle(pairs)
    assert got == want
    # the 21-node chain collapsed into ONE component (possibly merged
    # further by the random edges — the oracle equality above is exact)
    assert len({got[300 + i] for i in range(21)}) == 1


def test_dedup_clusters_canonical_survivors(spark):
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["a", "a2", "a3", "b", "b2", "lonely"]}))
    pairs = spark.createDataFrame(pd.DataFrame({
        "id1": [1, 2, 4], "id2": [2, 3, 5]}))
    out = dedup.dedup_clusters(docs, pairs, "doc_id").toPandas() \
        .set_index("doc_id").sort_index()
    assert out["dup_cluster"].tolist() == [1, 1, 1, 4, 4, 6]
    assert out["is_canonical"].tolist() == [True, False, False, True, False,
                                            True]
    # the deduplicated corpus keeps exactly one doc per cluster
    kept = out[out["is_canonical"]]
    assert sorted(kept.index) == [1, 4, 6]


def test_dedup_clusters_end_to_end_minhash(spark):
    # chain A~B, B~C via shared shingles: the cluster must close over the
    # chain even if A and C never pair directly
    base = "the quick brown fox jumps over the lazy dog again and again"
    mid = base.replace("quick", "swift")
    far = mid.replace("lazy", "sleepy")
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12, 99],
        "text": [base, mid, far, "completely different content here"]}))
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.3)
    out = dedup.dedup_clusters(docs, pairs, "doc_id").toPandas() \
        .set_index("doc_id")
    assert out.loc[10, "dup_cluster"] == out.loc[11, "dup_cluster"] \
        == out.loc[12, "dup_cluster"] == 10
    assert out.loc[99, "dup_cluster"] == 99 and out.loc[99, "is_canonical"]
    assert int(out["is_canonical"].sum()) == 2


def test_connected_components_long_chain_logarithmic(spark):
    # pointer doubling: a 200-node path must converge well under its
    # diameter (plain min-propagation would need ~199 rounds).
    # small_graph_edges=0 FORCES the distributed loop (r8: small graphs
    # short-circuit into the single-task union-find kernel by default).
    pairs = pd.DataFrame({"id1": list(range(199)),
                          "id2": list(range(1, 200))})
    out = dedup.connected_components(
        spark.createDataFrame(pairs), max_iters=12,
        small_graph_edges=0).toPandas()
    assert set(out["component"]) == {0}
    assert len(out) == 200


def test_assign_centroids_colinear_tiebreak(spark):
    """3+ exactly-tying centroids (duplicates under a hash-pick quantizer
    on a dup-heavy corpus): the winner must still follow the documented
    (csim desc, centroid_id asc) tie-break even when the minimum
    centroid_id falls outside the top-2 matmul shortlist (r8 ADVICE fix:
    the shortlist recheck widens to every fast-score tie)."""
    corp_rows = [("a", [1.0, 2.0, 3.0]), ("b", [3.0, -1.0, 0.5])]
    dup = [2.0, 4.0, 6.0]         # colinear with doc "a"
    cents_rows = [(7, dup), (2, dup), (9, dup), (4, [0.0, 0.0, 1.0])]
    corp = spark.createDataFrame(corp_rows, "vid string, v array<double>")
    cents = spark.createDataFrame(
        cents_rows, "centroid_id int, cent array<double>")
    out = similarity._assign_centroids(corp, cents, "vid", "v") \
        .toPandas().set_index("vid")
    # doc "a" ties exactly on all three duplicate centroids -> min id 2
    assert int(out.loc["a", "centroid_id"]) == 2
    assert out.loc["a", "csim"] == pytest.approx(1.0)
    # doc "b" has a unique winner among the duplicates
    assert int(out.loc["b", "centroid_id"]) in (2, 4)


def test_connected_components_kernel_equals_loop(spark):
    # r8: the size-gated single-task union-find path must agree with the
    # distributed loop exactly (same ids, same canonical min labels) on a
    # multi-component graph with chains, a star and random merges
    rng = np.random.default_rng(5)
    pairs = [(i, i + 1) for i in range(0, 60, 2)]
    pairs += [(500, 500 + k) for k in range(1, 9)]
    pairs += [(int(rng.integers(0, 300)), int(rng.integers(0, 300)))
              for _ in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    sdf = spark.createDataFrame(pd.DataFrame(pairs, columns=["id1", "id2"]))
    via_kernel = dedup.connected_components(sdf) \
        .toPandas().set_index("id")["component"].to_dict()
    via_loop = dedup.connected_components(sdf, small_graph_edges=0) \
        .toPandas().set_index("id")["component"].to_dict()
    assert via_kernel == via_loop
    assert via_kernel == _uf_oracle(pairs)


def test_deterministic_mixing(spark, docs):
    """source_mix keeps exactly the rows whose md5-uniform clears the
    per-source fraction (recompute in pandas), identically on rerun;
    temperature_fractions matches the closed-form numpy oracle."""
    import hashlib

    from diive_spark.operators import mixing

    fracs = {f"src{k}": 0.25 * (k % 4) + 0.25 for k in range(20)}
    got = mixing.source_mix(docs, fracs, seed=7).select("doc_id", "source") \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf = docs.select("doc_id", "source").toPandas()

    def u(doc_id):
        return int(hashlib.md5(f"{doc_id}:7".encode()).hexdigest()[:8], 16) / 2**32

    keep = pdf[[u(d) < fracs.get(s, 0.0)
                for d, s in zip(pdf["doc_id"], pdf["source"])]]
    assert sorted(got["doc_id"]) == sorted(keep["doc_id"])
    again = mixing.source_mix(docs, fracs, seed=7).count()
    assert again == len(got)
    # the draw is row-local: no Exchange in the plan
    plan = mixing.source_mix(docs, fracs, seed=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # temperature fractions vs closed form
    tf = mixing.temperature_fractions(docs, temperature=2.0, target_rows=300)
    counts = pdf.groupby("source").size()
    w = counts ** 0.5
    raw = 300 * (w / w.sum()) / counts
    for s, f in tf.items():
        np.testing.assert_allclose(f, min(raw[s], 1.0), rtol=1e-12)
    # expected kept mass ~= target when nothing is capped
    if all(v < 1.0 for v in tf.values()):
        np.testing.assert_allclose(
            sum(tf[s] * counts[s] for s in tf), 300, rtol=1e-9)


def test_remove_boilerplate_lines(spark):
    """C4-style corpus line removal: a footer line present in 3 docs is
    deleted everywhere; unique lines survive in original order; a doc that
    was ALL boilerplate comes back empty, not dropped."""
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha\ncookie notice\nbeta",
                 "gamma\ncookie notice",
                 "cookie notice\ndelta\nepsilon",
                 "cookie notice"],
    })
    out = textstats.remove_boilerplate_lines(
        spark.createDataFrame(pdf), min_count=3) \
        .toPandas().set_index("doc_id")["text"]
    assert out.loc[1] == "alpha\nbeta"
    assert out.loc[2] == "gamma"
    assert out.loc[3] == "delta\nepsilon"
    assert out.loc[4] == ""
    # below threshold: a line in only 2 docs survives
    out2 = textstats.remove_boilerplate_lines(
        spark.createDataFrame(pdf.iloc[:2]), min_count=3) \
        .toPandas().set_index("doc_id")["text"]
    assert out2.loc[1] == "alpha\ncookie notice\nbeta"


def _semdedup_oracle(ids, vecs, cents, threshold):
    """Independent numpy replay of semdedup's assignment + pairwise rule,
    sharing only the quantizer table (quantizer determinism is certified
    separately by the ann_ivf gate)."""
    def r6(x):
        return round(x + 1e-9, 6)

    V = np.asarray(vecs, dtype=np.float64)
    C = np.asarray(cents, dtype=np.float64)
    vn = np.linalg.norm(V, axis=1)
    cn = np.linalg.norm(C, axis=1)
    sims = (V @ C.T) / np.outer(vn, cn)
    # max-cosine assignment, ties -> lowest centroid id (argmax is first-max)
    cid = sims.argmax(axis=1)
    csim = np.array([r6(sims[i, cid[i]]) for i in range(len(ids))])
    removed = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cid[i] != cid[j]:
                continue
            s = r6(V[i] @ V[j] / (vn[i] * vn[j]))
            if s < threshold:
                continue
            a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
            ca, cb = (csim[i], csim[j]) if ids[i] < ids[j] else (csim[j], csim[i])
            if ca > cb:
                removed.add(a)
            elif cb > ca:
                removed.add(b)
            else:
                removed.add(max(a, b))
    return {int(ids[i]): int(cid[i]) for i in range(len(ids))}, removed


def test_semdedup_matches_numpy_oracle(spark, embs):
    """SemDeDup vs a full numpy replay on the corpus + planted near-dup
    groups: assignment, centroid_sim rounding, pairwise in-cluster
    comparison, and the lowest-centroid-sim keep rule must all agree."""
    rng = np.random.default_rng(13)
    base = embs.orderBy("vec_id").limit(60).toPandas()
    ids = list(base["vec_id"].astype(int))
    vecs = [list(map(float, v)) for v in base["embedding"]]
    # plant near-dup copies of 6 vectors at two perturbation radii: the
    # copies stay cos>0.99 to their original (natural corpus max ~0.5)
    for k in range(6):
        v = np.array(vecs[k])
        for j, eps in enumerate((0.01, 0.03)):
            pert = v + eps * rng.standard_normal(v.shape) * np.linalg.norm(v) / 8
            ids.append(10_000 + 10 * k + j)
            vecs.append([float(x) for x in pert])
    df = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id bigint, embedding array<double>")
    out = similarity.semdedup(
        df, n_clusters=6, threshold=0.9, refine_iters=0).toPandas()
    cents_pdf = similarity._centroids(df, "vec_id", "embedding", 6) \
        .orderBy("centroid_id").toPandas()
    cents = [list(map(float, c)) for c in cents_pdf["cent"]]
    want_cid, want_removed = _semdedup_oracle(ids, vecs, cents, 0.9)

    got = out.set_index("vec_id")
    assert len(got) == len(ids)
    for i in ids:
        assert int(got.loc[i, "centroid_id"]) == want_cid[i], i
        assert int(got.loc[i, "is_removed"]) == int(i in want_removed), i
    # the planted groups must actually exercise the rule: >=6 removals,
    # and no removal outside the planted id space unless oracle says so
    assert len(want_removed) >= 6
    # survivors per planted group: exactly one member kept when the group
    # is fully connected inside one cluster
    for k in range(6):
        grp = [ids[k], 10_000 + 10 * k, 10_000 + 10 * k + 1]
        if len({want_cid[g] for g in grp}) == 1:
            kept = [g for g in grp if g not in want_removed]
            pair_ok = all(
                _cos(vecs[ids.index(g1)], vecs[ids.index(g2)]) >= 0.9
                for g1 in grp for g2 in grp if g1 < g2)
            if pair_ok:
                assert len(kept) == 1


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_semdedup_pair_kernel_matches_numpy_bruteforce(spark):
    """The block-pair grouped Arrow kernel (r7: replaces the block-salted
    pair join) must reproduce EXACTLY the brute-force within-cluster pair
    set: every (id1 < id2) pair in the same cluster whose
    round(dim-major-fold-dot / (nrm1*nrm2) + 1e-9, 6) >= threshold, with
    the pair's sim value and both centroid sims — across block-pair
    replication, same-block triangles, and cross-block orientation."""
    rng = np.random.default_rng(3)
    n, dim, ncl, blocks, thr = 120, 16, 3, 4, 0.9
    V = rng.normal(size=(n, dim))
    for src, dst in [(10, 50), (11, 51), (12, 52), (13, 53), (20, 90)]:
        V[dst] = V[src] * (1.0 + 0.001 * dst)  # planted near-dups
    cl = rng.integers(0, ncl, n)
    cl[50], cl[51], cl[52], cl[90] = cl[10], cl[11], cl[12], cl[20]
    cl[53] = (cl[13] + 1) % ncl  # same vector, different cluster: no pair
    nrm = np.zeros(n)
    for d in range(dim):  # exact dim-major fold of norm_expr
        nrm += V[:, d] * V[:, d]
    nrm = np.sqrt(nrm)
    csim = np.round(rng.uniform(0, 1, n), 6)
    rows = [(int(i), [float(x) for x in V[i]], int(cl[i]), float(csim[i]),
             float(nrm[i]), int(i % blocks)) for i in range(n)]
    assigned = spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, centroid_id int, "
              "centroid_sim double, _nrm double, _blk int")
    got = similarity._semdedup_pairs(assigned, "vec_id", thr, blocks) \
        .toPandas().sort_values(["id1", "id2"]).reset_index(drop=True)
    want = []
    for i in range(n):
        for j in range(i + 1, n):
            if cl[i] != cl[j]:
                continue
            dot = 0.0
            for d in range(dim):
                dot += V[i, d] * V[j, d]
            sim = round(dot / (nrm[i] * nrm[j]) + 1e-9, 6)
            if sim >= thr:
                want.append((i, j, csim[i], csim[j], sim))
    assert len(want) >= 4  # the planted pairs actually qualify
    assert len(got) == len(want)
    for (i, j, c1, c2, sim), row in zip(want, got.itertuples(index=False)):
        assert (row.id1, row.id2) == (i, j)
        assert row.sim == sim and row.cs1 == c1 and row.cs2 == c2


def test_knn_classify_matches_numpy_oracle(spark, embs):
    """kNN label vote vs a full numpy replay (cosine matrix, top-k with
    (sim desc, id asc) tie-break, vote by (count, summed rounded sim,
    label))."""
    pdf = embs.select("vec_id", "embedding", "label").orderBy("vec_id") \
        .toPandas()
    ids = pdf["vec_id"].to_numpy()
    V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    lbl = pdf["label"].to_numpy()
    vn = np.linalg.norm(V, axis=1)
    k = 7
    got = similarity.knn_classify(
        embs, embs.filter(F.col("vec_id") < 12), k=k) \
        .toPandas().set_index("query_id").sort_index()
    sims = (V @ V.T) / np.outer(vn, vn)
    for q in range(12):
        s = np.array([round(x + 1e-9, 6) for x in sims[q]])
        order = sorted((i for i in range(len(ids)) if ids[i] != q),
                       key=lambda i: (-s[i], ids[i]))[:k]
        votes = {}
        for i in order:
            c, w = votes.get(lbl[i], (0, 0.0))
            votes[lbl[i]] = (c + 1, w + s[i])
        win = sorted(votes.items(),
                     key=lambda kv: (-kv[1][0], -round(kv[1][1] + 1e-9, 6),
                                     kv[0]))[0]
        assert int(got.loc[q, "pred_label"]) == int(win[0]), q
        assert int(got.loc[q, "n_votes"]) == win[1][0], q
        assert abs(got.loc[q, "w_sim"] - round(win[1][1] + 1e-9, 6)) < 2e-6, q


def test_temperature_fractions_water_filling(spark):
    """ADVICE r6: when a small source caps at 1.0, its shortfall must be
    redistributed onto the uncapped sources so expected kept rows still
    hit target_rows (previously the cap silently undershot)."""
    from diive_spark.operators import mixing

    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(1000)],
        "source": ["tiny"] * 20 + ["mid"] * 280 + ["big"] * 700,
    })
    docs = spark.createDataFrame(pdf)
    # T->inf-ish: near-uniform weights force the tiny source over 1.0
    tf = mixing.temperature_fractions(docs, temperature=100.0,
                                      target_rows=600)
    counts = {"tiny": 20, "mid": 280, "big": 700}
    assert tf["tiny"] == 1.0
    assert all(0.0 < f <= 1.0 for f in tf.values())
    expected = sum(tf[s] * counts[s] for s in tf)
    np.testing.assert_allclose(expected, 600, rtol=1e-9)
    # the near-uniform budget pushes mid over 1.0 on the second pass
    # too; big absorbs the full residual (600 - 20 - 280) / 700
    assert tf["mid"] == 1.0
    np.testing.assert_allclose(tf["big"], 300 / 700, rtol=1e-9)
    # target beyond the corpus: everything caps, expectation == corpus
    tf_all = mixing.temperature_fractions(docs, temperature=2.0,
                                          target_rows=10_000)
    assert all(f == 1.0 for f in tf_all.values())


def test_semdedup_refined_at_1e4_clusters_no_driver_state(spark):
    """r6 VERDICT item 5 'done' criterion: semdedup with k-means
    refinement at n_clusters=10^4 on an sf1-sized corpus (20k vectors)
    runs with ZERO large driver collects — the centroid table stays a
    DataFrame through every Lloyd iteration (localCheckpoint, not
    collect) — and the removals match a numpy replay of the refined
    pipeline (numpy Lloyd step from the same certified seed centroids +
    the pairwise keep rule)."""
    from pyspark.sql import DataFrame as _DF

    rng = np.random.default_rng(41)
    n, dim, k = 20_000, 64, 10_000
    V = rng.standard_normal((n, dim))
    # plant 400 near-dup copies (cos ~0.999) of every 50th vector
    src = np.arange(0, n, 50)
    copies = V[src] + 0.02 * rng.standard_normal((len(src), dim))
    ids = list(range(n)) + [10_000_000 + int(s) for s in src]
    X = np.vstack([V, copies])
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, X)],
        "vec_id bigint, embedding array<double>").repartition(32).cache()
    df.count()

    # spy on every driver collect below this point
    calls = []
    orig_collect = _DF.collect

    def spying_collect(self):
        rows = orig_collect(self)
        calls.append((len(rows), len(self.columns)))
        return rows

    _DF.collect = spying_collect
    try:
        out = similarity.semdedup(
            df, n_clusters=k, threshold=0.9, refine_iters=1,
        ).toPandas()
    finally:
        _DF.collect = orig_collect
    # zero >10MB collects: nothing internal may pull the corpus or the
    # 10^4 x 64 centroid table (640k doubles ~ 5MB raw but >10MB as rows)
    for n_rows, n_cols in calls:
        assert n_rows * max(n_cols, 1) <= 10_000, calls

    # numpy replay: seed centroids (certified quantizer) -> one Lloyd
    # iteration -> assignment -> pairwise in-cluster rule
    cents_pdf = similarity._centroids(df, "vec_id", "embedding", k) \
        .orderBy("centroid_id").toPandas()
    C = np.vstack(cents_pdf["cent"].map(np.asarray))
    idx = np.asarray(ids)
    order = np.argsort(idx, kind="stable")  # row order independence
    Xn = X / np.linalg.norm(X, axis=1)[:, None]

    def assign(cmat):
        cn = np.linalg.norm(cmat, axis=1)
        sims = Xn @ (cmat / np.where(cn == 0, 1, cn)[:, None]).T
        return sims.argmax(axis=1), sims

    cid0, _ = assign(C)
    C1 = C.copy()
    for c in range(k):
        members = X[cid0 == c]
        if len(members):
            C1[c] = members.mean(axis=0)
    cid, sims = assign(C1)

    got = out.set_index("vec_id")
    assert len(got) == len(ids)
    # assignments agree (vectorized compare)
    got_cid = got.loc[idx, "centroid_id"].to_numpy()
    agree = (got_cid == cid).mean()
    assert agree > 0.999, agree  # ULP-level argmax ties only

    # removals: every planted copy pair resolves by the keep rule when
    # co-clustered; nothing else reaches cos 0.9
    removed = set(got.index[got["is_removed"] == 1])
    expect_removed = set()
    for orig_row, copy_id in zip(src, [10_000_000 + int(s) for s in src]):
        i, j = int(orig_row), ids.index(copy_id)
        if cid[i] != cid[j]:
            continue
        if round(float(Xn[i] @ Xn[j]) + 1e-9, 6) < 0.9:
            continue
        csi = round(float(sims[i, cid[i]]) + 1e-9, 6)
        csj = round(float(sims[j, cid[j]]) + 1e-9, 6)
        if csi > csj:
            expect_removed.add(int(ids[i]))
        elif csj > csi:
            expect_removed.add(int(ids[j]))
        else:
            expect_removed.add(max(int(ids[i]), int(ids[j])))
    assert len(expect_removed) >= 300  # the fixture actually exercises it
    assert removed == expect_removed
