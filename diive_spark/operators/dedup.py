"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Engine-new operators (SURVEY.md scope note). Scale stance:
- exact dedup: one hash-groupBy — the only full shuffle, on a 16-byte key.
- near-dup families avoid the O(n^2) cross join: candidates come from
  *bucket joins* (shared shingle / LSH band / simhash band / hyperplane
  bucket), then only candidates are verified. At 10^12 docs the bucket join
  is the standard MinHash-LSH plan (bands x rows tuned to the threshold).
- all hashes derive from md5 prefixes so the DuckDB oracle can recompute
  identical values (no engine-specific hash functions in checked outputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1


def h32(col: Column) -> Column:
    """32-bit hash from md5 prefix — identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: every row gets its group's canonical
    (minimum) id and group size; duplicates are rows where id != canonical."""
    key = F.md5(F.col(text_col)).alias("_k")
    w = Window.partitionBy("_k")
    return (
        df.select(F.col(id_col), key)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w).cast("bigint"))
        .withColumn("is_dup", (F.col(id_col) != F.col("canonical_id")).cast("int"))
        .drop("_k")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup, keep-first (public recipe:
    Dolma / RefinedWeb drop every later occurrence of a repeated paragraph
    while the first survives — unlike C4's line removal, which deletes ALL
    occurrences of frequent lines; see :func:`textstats.remove_boilerplate_lines`
    for that policy).

    "First" is the global (id, position) order, a deterministic total
    order, so reruns and engines agree. Plan shape: posexplode paragraphs
    -> min(struct(id, pos)) window over md5(paragraph) (ONE shuffle, keyed
    on the 16-byte hash — skew bounded by the hash, never by paragraph
    text) -> keep rows equal to their group minimum -> reassemble in
    original order (sort_array of (pos, para) structs, one groupBy on id).
    Empty paragraphs are dropped. Documents whose every paragraph was a
    repeat come back with empty text, not dropped — the caller decides.

    Returns (id_col, text_col rebuilt, n_paras_kept)."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).filter(F.col("para") != "")
    w = Window.partitionBy(F.md5("para"))
    first = F.min(F.struct(F.col(id_col), F.col("pos"))).over(w)
    kept = paras.withColumn("_first", first).filter(
        (F.col("_first")[id_col] == F.col(id_col))
        & (F.col("_first")["pos"] == F.col("pos"))
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ), sep).alias(text_col),
            F.count(F.lit(1)).cast("bigint").alias("n_paras_kept"),
        )
        # docs that lost every paragraph still need a row
        .join(df.select(id_col), id_col, "right")
        .fillna({text_col: "", "n_paras_kept": 0})
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document, exploded long-form
    (id, shingle). Documents shorter than n words produce no shingles.

    Built as ``zip_with`` over ``n`` aligned ``slice`` views of a
    per-row MATERIALIZED word array — one pass, identical strings to the
    old transform + element_at form (concat of the same words with the
    same separator). The old form was the documented sf1 HOF trap
    (textstats._grams_expr): element_at inside a lambda re-evaluates the
    split per ELEMENT, and the array expr was rebuilt per element_at —
    measured 39 s -> ~2 s for the 2.65M-shingle sf1 explode, a cost paid
    by every dedup pipeline (minhash, LSH, jaccard, cluster CC)."""
    w = F.col("_ws_w")
    length = F.greatest(F.size(w) - (n - 1), F.lit(0))
    g = F.slice(w, 1, length)
    for j in range(1, n):
        g = F.zip_with(g, F.slice(w, j + 1, length),
                       lambda a, b: F.concat(a, F.lit(" "), b))
    # NOTE: no trailing .distinct() — grams are array_distinct'ed per
    # document before the explode, so (id, shingle) rows are already unique;
    # a distinct here would be a full extra shuffle of the largest table in
    # every dedup pipeline for no semantic effect.
    return (
        df.select(F.col(id_col),
                  F.split(F.col(text_col), " ").alias("_ws_w"))
        .select(F.col(id_col), F.explode(F.array_distinct(g)).alias("shingle"))
    )


def cap_shingle_doc_freq(sh: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles appearing in more than ``max_doc_freq`` documents.

    At web scale this is load-bearing: a stop-phrase shingle shared by f docs
    contributes ~f^2/2 candidate pairs to any shared-shingle self-join, so an
    uncapped head shingle ("of the and" in 10^6 docs) creates a 10^12-pair
    bucket. Capping document frequency bounds every bucket to
    max_doc_freq^2/2 pairs. Recall impact: only pairs whose ENTIRE overlap is
    high-DF shingles are missed — such pairs have near-zero distinctive
    overlap by construction. Standard MinHash-pipeline preprocessing."""
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    keep = freq.filter(F.col("_df") <= max_doc_freq).select("shingle")
    return sh.join(keep, "shingle")


def _verified_jaccard(
    sh: DataFrame, id_col: str, threshold: float,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets for all shared-shingle pairs, or only
    for the given (id1, id2) candidates."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is None:
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, F.col("a.shingle") == F.col("b.shingle"))
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .groupBy(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        sa = sh.withColumnRenamed(id_col, "id1").withColumnRenamed("shingle", "s1")
        sb = sh.withColumnRenamed(id_col, "id2").withColumnRenamed("shingle", "s2")
        inter = (
            candidates.join(sa, "id1").join(sb, "id2")
            .filter(F.col("s1") == F.col("s2"))
            .groupBy("id1", "id2").agg(F.count(F.lit(1)).alias("inter"))
        )
    s1 = sizes.withColumnRenamed(id_col, "id1").withColumnRenamed("n_sh", "n1")
    s2 = sizes.withColumnRenamed(id_col, "id2").withColumnRenamed("n_sh", "n2")
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.join(F.broadcast(s1), "id1").join(F.broadcast(s2), "id2")
        .withColumn("jaccard", F.round(jac + F.lit(1e-9), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3, threshold: float = 0.02,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact Jaccard over word n-gram shingle sets.
    Candidates = pairs sharing >= 1 shingle (bucket join on the shingle).

    ``max_doc_freq`` caps candidate generation to shingles appearing in at
    most that many documents (see cap_shingle_doc_freq) — the Jaccard VALUE
    for surviving candidates is still computed over the FULL shingle sets, so
    reported similarities are exact; only pairs whose entire overlap is
    high-DF shingles can be missed. None (default) keeps exact all-candidate
    semantics; at web scale set it to ~0.01% of the corpus size."""
    sh = word_shingles(df, id_col, text_col, n).cache()
    candidates = None
    if max_doc_freq is not None:
        # cached: both sides of the shared-shingle self-join read it
        capped = cap_shingle_doc_freq(sh, max_doc_freq).cache()
        a, b = capped.alias("a"), capped.alias("b")
        candidates = (
            a.join(b, F.col("a.shingle") == F.col("b.shingle"))
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
            .distinct()
        )
    return _verified_jaccard(sh, id_col, threshold, candidates=candidates)


def _signatures_from_shingles(sh: DataFrame, id_col: str, k: int, seed: int) -> DataFrame:
    import random

    rng = random.Random(seed)
    perms = [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(k)]
    x = h32(F.col("shingle"))
    mins = [
        F.min((F.lit(a) * x + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(perms)
    ]
    return sh.groupBy(id_col).agg(*mins)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3, k: int = 16, seed: int = 42,
) -> DataFrame:
    """MinHash signatures: k universal-hash permutations
    h_i(x) = (a_i*x + b_i) mod p over 32-bit shingle hashes; signature =
    per-permutation minimum. One explode + one groupBy — linear in total
    shingle count, never materializes pairs."""
    return _signatures_from_shingles(word_shingles(df, id_col, text_col, n), id_col, k, seed)


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3, k: int = 16, bands: int = 4,
    threshold: float = 0.02, seed: int = 42,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """MinHash LSH: band the signature (bands x k/bands rows), bucket-join on
    (band, band-hash) for candidates, verify with exact Jaccard.

    Returns (id1, id2, jaccard) for verified pairs >= threshold. Detection
    is probabilistic (bounded by the banding s-curve); the verify step means
    no false positives.

    ``max_doc_freq`` (when set) drops shingles above that document frequency
    BEFORE both signature computation and the verify join (see
    cap_shingle_doc_freq) — Jaccard is then defined over the capped shingle
    universe, the standard stop-shingle preprocessing for web-scale corpora.
    Default None preserves exact full-shingle semantics."""
    rows = k // bands
    sh_full = word_shingles(df, id_col, text_col, n).cache()
    # cache the frame every downstream stage actually reads: the CAPPED
    # shingle table feeds the signature groupBy, the verify join (both
    # sides) and the set-size agg — uncached it re-runs the doc-freq
    # groupBy + join four times (measured ~40% of pipeline wall time)
    sh = (cap_shingle_doc_freq(sh_full, max_doc_freq).cache()
          if max_doc_freq is not None else sh_full)
    sig = _signatures_from_shingles(sh, id_col, k, seed)
    # band hash from md5 over the comma-joined row values (not xxhash64) so a
    # SQL engine can reproduce the exact bucketing — makes the whole LSH
    # pipeline oracle-checkable end to end
    band_cols = [
        h32(F.concat_ws(",", *[F.col(f"mh_{b * rows + r}") for r in range(rows)])).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    long = banded.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")
    a, b2 = long.alias("a"), long.alias("b")
    cands = (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"))
        .distinct()
    )
    # verify candidates with exact jaccard (same helper as the exact path,
    # so LSH and exact Jaccard can never desynchronize); uses the same
    # (capped or full) shingle universe the signatures were built from
    return _verified_jaccard(sh, id_col, threshold, candidates=cands)


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3, bits: int = 32,
) -> DataFrame:
    """SimHash signature: for each bit position, sum +-1 over the document's
    shingle hashes; bit = 1 where the sum is positive. Built from md5-based
    h32 so the SQL oracle matches. One explode x bits (small constant)."""
    sh = word_shingles(df, id_col, text_col, n)
    x = h32(F.col("shingle"))
    sh = sh.select(id_col, x.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = sh.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(bits):
        contrib = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = contrib if sig is None else sig + contrib
    return agg.select(id_col, sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str = "text",
    n: int = 3, bits: int = 32, max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, candidate generation via
    the byte-band trick (pairs within hamming<=k share at least one of
    ceil(bits/8) >= k/8+1 bands when banded into > max_hamming slices —
    here 8 x 4-bit bands covers max_hamming <= 7 for 32 bits)."""
    n_bands = 8
    width = bits // n_bands
    sig = simhash(df, id_col, text_col, n, bits).cache()
    long = sig.select(
        id_col, "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit((1 << width) - 1)).alias("bv"),
                )
                for b in range(n_bands)
            ])
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.bv")
    a, b2 = long.alias("a"), long.alias("b")
    cands = (
        a.join(b2, (F.col("a.band") == F.col("b.band")) & (F.col("a.bv") == F.col("b.bv")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"),
            F.col("a.simhash").alias("h1"), F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cands.withColumn("hamming", ham).filter(ham <= max_hamming).select(
        "id1", "id2", "hamming"
    )


def embedding_near_dups(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. Exact pairwise (self-join) — suitable
    below ~1e5 vectors; at scale use similarity.cosine_lsh_pairs (hyperplane
    buckets) which this verifies against in tests."""
    from diive_spark.operators.similarity import cosine_expr

    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    sim = cosine_expr(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("sim", F.round(sim + F.lit(1e-9), 6))
        .filter(F.col("sim") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2"), "sim")
    )


# --------------------------------------------------------------------------- #
# Near-dup clustering: connected components over candidate pairs
# --------------------------------------------------------------------------- #

def connected_components(
    pairs: DataFrame, src_col: str = "id1", dst_col: str = "id2",
    max_iters: int = 30,
    small_graph_edges: int | None = None,
) -> DataFrame:
    """Connected components over a near-duplicate pair list — the step that
    turns pairwise matches (ngram_jaccard_pairs / minhash_lsh_pairs /
    simhash_pairs / embedding_near_dups) into dedup GROUPS, so a cluster
    keeps one canonical document no matter how the duplicates chain
    (A~B, B~C ⇒ {A,B,C} even when A≁C directly).

    Algorithm: min-label propagation with pointer-doubling shortcutting —
    each round every node adopts the minimum label in its closed
    neighbourhood (one groupBy + join on the edge list) and then labels are
    shortcut through themselves (label ← label[label], the classic
    hash-to-min doubling step), so a path of length d converges in
    O(log d) rounds rather than O(d) (same regime as the large-star /
    small-star family, Kiveris et al. 2014). No driver-side graph state —
    the edge list never leaves the cluster; convergence is checked with a
    bounded aggregate per iteration.

    Returns (id, component) with ``component`` = the MINIMUM member id of
    the node's component (stable canonical label). Only ids that appear in
    ``pairs`` are returned — singleton documents need no row.

    ``small_graph_edges`` (default ``$SPARK_GRAFT_CC_SMALL_EDGES`` or
    5e6; 0 disables): near-dup graphs are usually minuscule relative to
    the corpus (thousands of edges from millions of documents), and the
    distributed loop's cost there is pure sequential-stage latency
    (~6 exchanges + 2 jobs PER ROUND; r8 measurement: 3.3-6.5 s for a
    ~2k-edge graph). When the measured edge count is at or under the
    bound, the loop is replaced by ONE union-find kernel over the
    checkpointed edge list in a single executor task (an AQE-style
    runtime size decision, like broadcast-join selection): bounded
    memory (~tens of MB at the 5M-edge default), identical output (the
    canonical minimum member id), two jobs total. Larger graphs take the
    distributed loop unchanged.
    """
    import os

    edges0 = (
        pairs.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
    )
    # Checkpoint the CLEANED pair list first: the (often expensive)
    # upstream pair-generation lineage executes exactly once — the old
    # form checkpointed union(edges, edges.swap), whose two branches each
    # contained the full pair-generation plan, running it twice.
    edges0 = edges0.localCheckpoint(eager=True)
    n_edges = edges0.count()
    if small_graph_edges is None:
        small_graph_edges = int(
            os.environ.get("SPARK_GRAFT_CC_SMALL_EDGES", "5000000"))
    if n_edges <= small_graph_edges:
        return _cc_single_task(edges0)

    # undirected distinct edge list (reads the checkpoint twice — cheap);
    # labels start as each node's own id.
    edges = edges0.union(edges0.select(F.col("v").alias("u"),
                                       F.col("u").alias("v"))).distinct() \
                  .localCheckpoint(eager=True)
    labels = edges.select(F.col("u").alias("id")).distinct() \
                  .withColumn("label", F.col("id"))

    # size the per-round shuffles to the GRAPH, not the session default:
    # near-dup graphs are usually tiny relative to the corpus (hundreds of
    # edges from millions of documents), and every round otherwise pays
    # full-width exchanges of near-empty partitions. ~100k edges per
    # partition, capped at the session setting — so a billion-edge graph
    # still spreads across the cluster. Sizing is applied via EXPLICIT
    # repartition on the per-round materialization points (never by
    # mutating the shared session conf — a concurrent query on the same
    # SparkSession must not see a reduced partition count); iterative
    # localCheckpoint plans defeat AQE's runtime coalescing, hence the
    # explicit bound.
    spark = pairs.sparkSession
    sess_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = int(max(1, min(sess_sp, 2 * n_edges // 100_000 + 1)))
    if edges.rdd.getNumPartitions() > parts:
        edges = edges.repartition(parts, "u").localCheckpoint(eager=True)
    labels = _cc_loop(edges, labels, max_iters, parts)
    return labels.select("id", F.col("label").alias("component"))


def _cc_single_task(edges: DataFrame) -> DataFrame:
    """Union-find over a size-checked BOUNDED edge list in one executor
    task (never on the driver): path-halving union-find is O(E α(E)) and
    the edge list at the default bound is tens of MB — the whole
    components problem collapses to one mapInPandas over the checkpointed
    edges. Output contract identical to the distributed loop: one row per
    id appearing in the (cleaned) pair list, ``component`` = minimum
    member id."""
    ut = edges.schema["u"].dataType.simpleString()
    schema = f"id {ut}, component {ut}"

    def _uf(batches):
        import pandas as pd
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["u"].tolist(), pdf["v"].tolist()):
                if a not in parent:
                    parent[a] = a
                if b not in parent:
                    parent[b] = b
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[rb] = ra
        comp_min: dict = {}
        for x in parent:
            r = find(x)
            m = comp_min.get(r)
            if m is None or x < m:
                comp_min[r] = x
        ids = list(parent)
        yield pd.DataFrame(
            {"id": ids, "component": [comp_min[find(x)] for x in ids]})

    return edges.coalesce(1).mapInPandas(_uf, schema=schema)


def _cc_loop(edges, labels, max_iters, parts):
    for _ in range(max_iters):
        # propagate: every node adopts the minimum label in its closed
        # neighbourhood (its own ∪ its neighbours') — simple min-label
        # propagation; correct (monotone toward the component minimum) and
        # one shuffle per round
        lab_u = labels.withColumnRenamed("id", "u") \
                      .withColumnRenamed("label", "_lu")
        lab_v = labels.withColumnRenamed("id", "v") \
                      .withColumnRenamed("label", "_lv")
        nbr_min = (
            edges.join(lab_v, "v")
            .groupBy("u").agg(F.min("_lv").alias("_nmin"))
        )
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("u", "id"), "id", "left")
            .select("id", F.least(
                F.col("label"), F.coalesce(F.col("_nmin"), F.col("label"))
            ).alias("label"))
        )
        # pointer doubling: label <- label-of-label (labels are node ids, so
        # the label table maps them); halves the remaining path length
        lol = new_labels.select(F.col("id").alias("label"),
                                F.col("label").alias("_ll"))
        new_labels = (
            new_labels.join(lol, "label", "left")
            .select("id", F.least(
                F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
            ).alias("label"))
        )
        # localCheckpoint truncates the O(iterations) lineage so each round
        # stays a constant-depth plan (no exponential re-execution); the
        # graph-sized repartition keeps every later round's joins at
        # `parts` tasks instead of the session's full shuffle width.
        # Materialize BEFORE the convergence probe: probing the lazy frame
        # first would execute the whole round's plan twice (once for the
        # probe, once for the eager checkpoint) — measured ~2x on CC time.
        new_labels = new_labels.repartition(parts, "id") \
                               .localCheckpoint(eager=True)
        # convergence: labels only ever decrease under min-propagation, so
        # any change shows up as _new != label; probe the two checkpointed
        # frames (a bounded `parts`-task join, limit-1 short-circuit)
        changed = (
            new_labels.withColumnRenamed("label", "_new")
            .join(labels, "id")
            .filter(F.col("_new") != F.col("label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str,
    src_col: str = "id1", dst_col: str = "id2",
) -> DataFrame:
    """Attach near-dup cluster labels to the documents table and mark the
    canonical survivor per cluster: appends ``dup_cluster`` (the component's
    minimum id; the document's own id when it has no near-dups) and
    ``is_canonical`` (true for the minimum-id member — deterministic
    tie-free choice). Filtering ``is_canonical`` yields the deduplicated
    corpus; one broadcast-or-shuffle join against the bounded label table."""
    comp = connected_components(pairs, src_col, dst_col) \
        .withColumnRenamed("id", id_col)
    out = df.join(comp, on=id_col, how="left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return (
        out.withColumn("dup_cluster", cluster)
        .withColumn("is_canonical", F.col(id_col) == cluster)
        .drop("component")
    )


def simhash_expr(text_col: Column, n: int = 3, bits: int = 32) -> Column:
    """SimHash as ONE pure column expression — no explode, no groupBy.

    Same math as :func:`simhash` (md5-derived h32 per word n-gram, per-bit
    +-1 sums, bit set where the sum is positive) but folded over the
    in-row shingle array with higher-order functions, so it composes into
    ANY stage — including Structured Streaming, where the explode+groupBy
    form would be a stateful aggregation. Documents with fewer than ``n``
    words get signature 0 (the batch operator drops them instead — its
    groupBy sees no shingle rows); tests pin value parity on all other
    rows.

    Cost: O(shingles x bits) JVM expression work per row, no shuffle at
    all — the form a 100 TB ingest guard wants."""
    words = F.split(text_col, " ")
    # n-grams as zip_with over aligned slice views — one pass; the naive
    # transform + element_at form re-evaluates the inline split per element
    # (no CSE inside higher-order-function lambdas), going O(words^2)/row
    glen = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.slice(words, 1, glen)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(words, j + 1, glen),
                           lambda a, b: F.concat(a, F.lit(" "), b))
    hashes = F.transform(F.array_distinct(grams), h32)
    zero = F.array(*[F.lit(0).cast("bigint") for _ in range(bits)])
    counts = F.aggregate(
        hashes, zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1,
                       F.lit(1)).otherwise(F.lit(-1)).cast("bigint")
                for i in range(bits)
            ]),
            lambda a, b: a + b,
        ),
    )
    # bit extraction as ONE fold over zip_with(counts, powers): the counts
    # fold is evaluated once. (A per-bit element_at(counts, i) loop would
    # re-evaluate the whole O(shingles x bits) fold `bits` times — Catalyst
    # does not CSE repeated references inside a single projection.)
    powers = F.array(*[F.lit(1 << i).cast("bigint") for i in range(bits)])
    return F.aggregate(
        F.zip_with(counts, powers,
                   lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
