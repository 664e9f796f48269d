"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and two scale paths — IVF (coarse quantizer + probed cells) and
random-hyperplane LSH buckets.

Engine-new operators. Dot products are JVM array expressions
(zip_with + aggregate) over double arrays — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: previous semdedup call's cached assignment table (released on the next
#: call — see the unpersist note inside semdedup)
_SEMDEDUP_PREV_CACHE: DataFrame | None = None


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    # nullif: a zero-norm vector yields null similarity instead of an
    # ANSI-mode DIVIDE_BY_ZERO job failure
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query: broadcast the (small) query set,
    score the full corpus, row_number <= k with (sim desc, id asc) tie-break.
    At 100 TB the corpus scan is embarrassingly parallel; the only shuffle is
    the per-query top-k (tiny)."""
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("nbr_id"))
    scored = scored.withColumn("sim", F.round(cosine_expr(F.col("qv"), F.col("cv")) + F.lit(1e-9), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "nbr_id", "sim", "rnk")
    )


def _assign_centroids(
    corpus: DataFrame, cents: DataFrame,
    id_col: str, vec_col: str, n_slabs: int = 64,
) -> DataFrame:
    """Max-cosine centroid assignment, shuffle-native and vectorized —
    the shared kernel under kmeans_centroids / semdedup / IVF corpus
    assignment (r7: replaces the crossJoin + interpreted-HOF fold, which
    materialized n x k scored rows and ran ~0.4M folds/s/core — minutes
    at k=10^4 where one matmul is seconds).

    Plan: corpus rows are hash-slabbed, the centroid table is exploded
    to every slab (k x n_slabs small rows — no driver state, no
    broadcast-collect), and a cogrouped applyInPandas computes per slab:
    a normalized matmul shortlist (top-2 fast candidates per row), then
    the EXACT sequential dim-major fold of cosine_expr for just those
    candidates, picking the winner by (exact csim desc, centroid_id asc)
    — so emitted csim values are bit-identical to the Catalyst fold the
    SQL oracles replay. (The shortlist assumption: exact-vs-matmul
    divergence ~1e-15 never exceeds the fast gap between the 2nd and 3rd
    candidates — violated only by adversarially colinear centroids.)
    Zero-norm corpus vectors and zero-norm centroids are excluded, like
    cosine_expr's nullif semantics. Returns corpus columns +
    (centroid_id int, csim double, unrounded)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in corpus.schema.fields)
    schema = f"{out_fields}, centroid_id int, csim double"

    def _kern(key, corp, cent):
        import numpy as np
        import pandas as pd
        empty = corp.head(0).assign(
            centroid_id=pd.Series([], dtype="int32"),
            csim=pd.Series([], dtype="float64"))
        if len(corp) == 0 or len(cent) == 0:
            return empty
        cids = cent["centroid_id"].to_numpy()
        order = np.argsort(cids, kind="stable")
        cmat = np.vstack(cent["cent"].to_numpy())[order]
        cids = cids[order]
        cn2 = np.zeros(len(cids))
        for d in range(cmat.shape[1]):   # exact fold of norm_expr, per centroid
            cn2 += cmat[:, d] * cmat[:, d]
        ok_c = cn2 > 0
        cmat, cids, cn2 = cmat[ok_c], cids[ok_c], cn2[ok_c]
        if len(cids) == 0:
            return empty
        x = np.vstack(corp[vec_col].to_numpy())
        xn2 = np.zeros(len(x))
        for d in range(x.shape[1]):
            xn2 += x[:, d] * x[:, d]
        ok_x = xn2 > 0
        corp, x, xn2 = corp[ok_x], x[ok_x], xn2[ok_x]
        if len(x) == 0:
            return empty
        fast = (x / np.sqrt(xn2)[:, None]) @ (cmat / np.sqrt(cn2)[:, None]).T
        k = fast.shape[1]
        if k == 1:
            pick = np.zeros((len(x), 2), dtype=np.int64)
        else:
            pick = np.argpartition(-fast, 1, axis=1)[:, :2]
        # exact sequential folds for the two candidates only
        exact = np.empty((len(x), 2))
        for j in (0, 1):
            b = cmat[pick[:, j]]
            dot = np.zeros(len(x))
            for d in range(x.shape[1]):
                dot += x[:, d] * b[:, d]
            exact[:, j] = dot / (np.sqrt(xn2) * np.sqrt(cn2[pick[:, j]]))
        cid2 = cids[pick]
        take1 = (exact[:, 1] > exact[:, 0]) | (
            (exact[:, 1] == exact[:, 0]) & (cid2[:, 1] < cid2[:, 0]))
        sel = np.where(take1, 1, 0)
        rows = np.arange(len(x))
        win_cid = cid2[rows, sel].astype("int32")
        win_sim = exact[rows, sel]
        if k > 2:
            # 3+ centroids tying on exact cosine (duplicate/colinear
            # centroids — plausible under a hash-pick quantizer on a
            # dup-heavy corpus) can leave the minimum centroid_id outside
            # the top-2 shortlist, breaking the documented
            # (csim desc, centroid_id asc) tie-break. For the (rare) rows
            # whose two verified candidates tie, re-verify EVERY centroid
            # within eps of the fast maximum with the same sequential
            # dim-major fold and take min centroid_id among exact ties.
            tied = np.abs(exact[:, 0] - exact[:, 1]) <= 1e-12
            if tied.any():
                fmax = fast.max(axis=1)
                for i in np.where(tied)[0]:
                    cand = np.where(fast[i] >= fmax[i] - 1e-9)[0]
                    if len(cand) <= 2:
                        continue
                    b = cmat[cand]
                    dot = np.zeros(len(cand))
                    for d in range(x.shape[1]):
                        dot += x[i, d] * b[:, d]
                    ex = dot / (np.sqrt(xn2[i]) * np.sqrt(cn2[cand]))
                    best = np.lexsort((cids[cand], -ex))[0]
                    win_sim[i] = ex[best]
                    win_cid[i] = np.int32(cids[cand][best])
        out = corp.copy()
        out["centroid_id"] = win_cid
        out["csim"] = win_sim
        return out

    corp = corpus.withColumn(
        "_slab",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_slabs)).cast("int"))
    crep = cents.withColumn(
        "_slab", F.explode(F.sequence(F.lit(0), F.lit(n_slabs - 1))))
    return (
        corp.groupBy("_slab")
        .cogroup(crep.groupBy("_slab"))
        .applyInPandas(
            lambda key, left, right: _kern(
                key, left.drop(columns=["_slab"]),
                right.drop(columns=["_slab"])),
            schema=schema)
    )


def _centroids(corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int) -> DataFrame:
    """Deterministic coarse quantizer: pick n centroid vectors by hash order
    (a seeded sample; a k-means refinement would drop in here unchanged).

    orderBy().limit(n) executes as a distributed TakeOrderedAndProject —
    every partition contributes its local top-n, the driver merges n rows —
    unlike a global no-partitionBy Window, which would pull the whole corpus
    through one task. The hash is md5-derived (not xxhash64) so a SQL oracle
    can reproduce the selection exactly."""
    from diive_spark.operators.dedup import h32

    ranked = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("cent"))
        .withColumn("_h", h32(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_centroids)
    )
    # assign 0..n-1 ids on the (tiny) limited set; safe because it is at most
    # n_centroids rows, coalesced to one partition
    w = Window.orderBy("_h", id_col)
    return (
        ranked.coalesce(1)
        .withColumn("centroid_id", F.row_number().over(w) - 1)
        .select("centroid_id", "cent")
    )


def kmeans_centroids(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = 16, n_iter: int = 4,
) -> DataFrame:
    """Distributed spherical k-means refinement of the deterministic seed
    centroids (Lloyd's iterations, cosine assignment) — SHUFFLE-NATIVE:
    the centroid table stays a DataFrame end to end (r6 VERDICT item 5).

    Each iteration: assign every corpus vector to its max-cosine centroid
    via the shared shuffle-native kernel (_assign_centroids: slab-cogrouped
    matmul shortlist + exact-fold verify — no n x k row materialization,
    no interpreted folds, no driver state), then recompute centroids as
    the element-wise mean (posexplode + one groupBy — fully distributed;
    no normalization needed, cosine assignment is invariant to centroid
    scale). Empty clusters keep their previous centroid. The
    new centroid table is localCheckpoint-ed per iteration so the lazy
    plan stays flat across iterations with ZERO driver state — at
    n_centroids 10^5-10^6 x dim 768 the table is executor-resident (the
    pre-r7 version collected it to the driver each iteration, capping
    refinement at ~10^4 centroids).
    Deterministic: seeded init (md5-ordered pick) + tie-broken assignment
    (max csim, ties to the lowest centroid_id via the (csim, -id) key)."""
    cents = _centroids(corpus, id_col, vec_col, n_centroids)
    c = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    for _ in range(n_iter):
        # zero-norm vectors are excluded inside the kernel so they cannot
        # drag a centroid toward the origin
        assigned = _assign_centroids(c, cents, "_id", "cv")
        means = (
            assigned.select("centroid_id", F.posexplode("cv").alias("pos", "val"))
            .groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select("centroid_id",
                    F.transform("s", lambda st: st["m"]).alias("cent_new"))
        )
        merged = cents.join(means, "centroid_id", "left").select(
            "centroid_id", F.coalesce("cent_new", "cent").alias("cent"))
        # flat plans across iterations WITHOUT driver round-trips: the
        # k x dim table materializes on the executors and its lineage is
        # truncated (swap for .checkpoint() where executor loss matters)
        cents = merged.localCheckpoint(eager=True)
    return cents


def cosine_topk_ivf(
    corpus: DataFrame, queries: DataFrame, k: int = 5,
    n_centroids: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: assign corpus vectors to their nearest
    centroid (broadcast join), probe each query's nprobe nearest cells,
    exact-score only those cells. Recall < 1 by design; scan volume is
    ~nprobe/n_centroids of brute force. ``refine_iters`` > 0 runs that many
    distributed k-means iterations on the quantizer (kmeans_centroids) —
    better-balanced cells on clustered corpora at the cost of one corpus
    pass per iteration; 0 keeps the deterministic hash-pick quantizer (the
    SQL-oracle-able plan the gate certifies)."""
    if refine_iters > 0:
        cents = kmeans_centroids(corpus, id_col, vec_col, n_centroids,
                                 n_iter=refine_iters)
    else:
        # the hash-pick quantizer is a TakeOrdered over the corpus;
        # referenced twice below (slab replication + query probes), so
        # pin the k-row table on the executors instead of re-scanning
        cents = _centroids(corpus, id_col, vec_col, n_centroids) \
            .localCheckpoint(eager=True)
    c = corpus.select(
        F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    # centroid_id tie-break: deterministic (and SQL-reproducible) when two
    # cells score identically; the corpus side uses the vectorized
    # shuffle-native kernel (the queries side below stays a broadcast
    # crossJoin — it is the small side by contract)
    assigned = _assign_centroids(c, cents, "nbr_id", "cv") \
        .select("nbr_id", "cv", "centroid_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("csim", cosine_expr(F.col("qv"), F.col("cent")))
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = assigned.join(probes, "centroid_id").filter(
        F.col("query_id") != F.col("nbr_id")
    )
    scored = scored.withColumn("sim", F.round(cosine_expr(F.col("qv"), F.col("cv")) + F.lit(1e-9), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nbr_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "nbr_id", "sim", "rnk")
    )


def _semdedup_pairs(
    assigned: DataFrame, id_col: str, threshold: float, pair_blocks: int,
) -> DataFrame:
    """Within-cluster near-dup pairs from the assigned table, as a
    BLOCK-PAIR grouped Arrow kernel (r7: replaces the block-salted
    self-join + interpreted per-pair Catalyst folds, which materialized
    every within-cluster pair as a join row — 27M rows / ~69 s at the
    sf1 gate shape; the kernel does the same pairs as one numpy matmul
    shortlist per task + exact folds for candidates only: ~4 s).

    Identical certified semantics: candidates are pruned with a
    normalized matmul (exact-vs-matmul divergence ~1e-12 against the
    1e-6 prune margin), survivors get the EXACT sequential dim-major
    dot fold divided by the hoisted ``_nrm`` norms — value-for-value
    the old join's ``round(dot_expr/(na*nb) + 1e-9, 6)``, which is what
    the SQL oracle replays.

    Parallelism: every row is exploded to its ``pair_blocks`` block-pair
    keys, so a cluster is processed as (bi <= bj) block-pair tasks —
    n_clusters x pair_blocks(pair_blocks+1)/2 tasks, the same shuffle
    volume as the old a-side replication, with the per-task pair count
    bounded by (cluster/pair_blocks)^2. Returns (id1, id2, cs1, cs2,
    sim) with id1 < id2, sim >= threshold."""
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in assigned.schema.fields
    )[id_col]
    thr = float(threshold)

    def _kern(key, pdf):
        import numpy as np
        import pandas as pd
        _, bi, bj = key
        empty = pd.DataFrame({
            "id1": pdf[id_col][:0], "id2": pdf[id_col][:0],
            "cs1": pd.Series([], dtype="float64"),
            "cs2": pd.Series([], dtype="float64"),
            "sim": pd.Series([], dtype="float64")})
        same = bi == bj
        a = pdf if same else pdf[pdf["_blk"] == bi]
        b = pdf if same else pdf[pdf["_blk"] == bj]
        if len(a) == 0 or len(b) == 0 or (same and len(a) < 2):
            return empty
        ida = a[id_col].to_numpy()
        idb = b[id_col].to_numpy()
        xa = np.vstack(a["v"].to_numpy())
        xb = xa if same else np.vstack(b["v"].to_numpy())
        na = a["_nrm"].to_numpy(dtype=np.float64)
        nb = na if same else b["_nrm"].to_numpy(dtype=np.float64)
        csa = a["centroid_sim"].to_numpy(dtype=np.float64)
        csb = csa if same else b["centroid_sim"].to_numpy(dtype=np.float64)
        approx = (xa @ xb.T) / np.outer(na, nb)
        if same:
            order = np.argsort(ida, kind="stable")
            inv = np.empty(len(order), dtype=np.int64)
            # keep only one orientation: id_a < id_b via the sorted rank
            inv[order] = np.arange(len(order))
            keep = (approx >= thr - 1e-6) & (inv[:, None] < inv[None, :])
        else:
            keep = approx >= thr - 1e-6
        ik, jk = np.nonzero(keep)
        if len(ik) == 0:
            return empty
        va, vb = xa[ik], xb[jk]
        dot = np.zeros(len(ik))
        for d in range(va.shape[1]):  # exact dim-major fold == dot_expr
            dot += va[:, d] * vb[:, d]
        raw = dot / (na[ik] * nb[jk]) + 1e-9
        sims = np.asarray([round(s, 6) for s in raw.tolist()])
        final = sims >= thr
        ik, jk, sims = ik[final], jk[final], sims[final]
        if len(ik) == 0:
            return empty
        # orient each pair by id (cross-block pairs arrive unordered)
        i1, i2 = ida[ik], idb[jk]
        c1, c2 = csa[ik], csb[jk]
        swap = i1 > i2
        i1s = np.where(swap, i2, i1)
        i2s = np.where(swap, i1, i2)
        c1s = np.where(swap, c2, c1)
        c2s = np.where(swap, c1, c2)
        return pd.DataFrame({"id1": i1s, "id2": i2s, "cs1": c1s,
                             "cs2": c2s, "sim": sims})

    b = F.col("_blk")
    replicated = assigned.withColumn(
        "_bp",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(pair_blocks - 1)),
            lambda o: F.struct(F.least(b, o).alias("bi"),
                               F.greatest(b, o).alias("bj")))),
    ).select(id_col, "v", "centroid_sim", "_nrm", "_blk", "centroid_id",
             F.col("_bp.bi").alias("_bi"), F.col("_bp.bj").alias("_bj"))
    return replicated.groupBy("centroid_id", "_bi", "_bj").applyInPandas(
        _kern,
        schema=(f"id1 {id_type}, id2 {id_type}, cs1 double, cs2 double, "
                "sim double"))


def semdedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int | str = 16,
    threshold: float = 0.9,
    refine_iters: int = 2,
    pair_blocks: int = 16,
) -> DataFrame:
    """SemDeDup semantic deduplication (public recipe: Abbas et al. 2023,
    arXiv:2303.09540 — cluster the embedding space with k-means, compare
    pairs only WITHIN a cluster, and among semantic duplicates keep the
    example with the LOWEST cosine similarity to its centroid, i.e. the
    cluster-edge representative, preserving diversity).

    Plan shape (the paper's own tractability argument, distributed):
    - quantizer: seeded hash-pick centroids, optionally refined by
      ``refine_iters`` distributed k-means passes (kmeans_centroids) —
      shuffle-native since r7: the centroid table stays a DataFrame
      through every Lloyd iteration (localCheckpoint between passes), so
      n_clusters='auto' at the billion-doc regime (10^5-10^6 clusters)
      carries ZERO driver state with refinement on;
    - assignment: the shared shuffle-native kernel (_assign_centroids):
      slab-cogrouped matmul shortlist + exact-fold verify — one corpus
      scan, no n x k row materialization, no driver state;
    - candidate pairs: the block-pair grouped Arrow kernel
      (_semdedup_pairs) — pair volume is sum over clusters of |c|^2 / 2,
      bounded by the cluster granularity (n_clusters scales with corpus
      size in the paper: 50k clusters for LAION — cluster size, not
      corpus size, bounds the quadratic term), and no pair ever
      materializes as a join row;
    - removal rule, deterministic: in every near-dup pair the member
      with the HIGHER centroid similarity is removed (ties: higher id).
      For a fully-connected duplicate group this keeps exactly the
      paper's lowest-centroid-similarity representative; for chain-shaped
      groups the pairwise rule is a deterministic superset of removals
      (documented engine choice — no iterative grouping pass needed).

    Scale history (all measured at the 20k-vector / 8-cluster sf1 gate
    shape, outputs bit-identical at each step): r6 hoisted the
    per-member norms (3 array folds per pair -> 1) and block-salted the
    pair join (352 s -> 18 s at local[32]); r7 replaces the join
    entirely with the block-pair grouped Arrow kernel — matmul prune +
    exact folds for candidates only — because the join still
    materialized every within-cluster pair as a row through the
    interpreted Catalyst fold (measured 69 s at the sweep's local[8],
    ~4 s with the kernel). ``pair_blocks`` keeps its meaning as the
    parallelism salt: a cluster is processed as (bi <= bj) block-pair
    tasks. ``n_clusters='auto'`` sizes the cluster count to the corpus
    (~2k expected members per cluster, the paper's regime — cluster SIZE,
    not corpus size, bounds the quadratic term).

    Returns every corpus row with a nonzero embedding: (id_col,
    centroid_id, centroid_sim, is_removed int 0/1). (Zero-norm vectors,
    which scored NULL against every centroid pre-r7, are excluded by the
    assignment kernel — cosine is undefined for them.)"""
    if n_clusters == "auto":
        n_clusters = max(8, corpus.count() // 2048)
    if refine_iters > 0:
        cents = kmeans_centroids(corpus, id_col, vec_col, n_clusters,
                                 n_iter=refine_iters)
    else:
        cents = _centroids(corpus, id_col, vec_col, n_clusters) \
            .localCheckpoint(eager=True)
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    from diive_spark.operators.dedup import h32

    assigned = (
        _assign_centroids(c, cents, id_col, "v")
        .select(id_col, "v", "centroid_id",
                F.round(F.col("csim") + F.lit(1e-9), 6).alias("centroid_sim"))
        # reused by every pair below: same fold as cosine_expr's norm, so
        # the per-pair value is bit-identical to the fused form
        .withColumn("_nrm", norm_expr(F.col("v")))
        .withColumn("_blk", F.pmod(h32(F.col(id_col).cast("string")),
                                   F.lit(pair_blocks)))
        # cached: referenced THREE times (both pair-join sides + the final
        # left join), and the upstream assignment kernel is a full corpus
        # shuffle + Arrow pass — uncached it re-executes per reference
        # (measured 3x the gate wall at sf1). Same discipline as the
        # capped shingle table in dedup.py.
        .cache()
    )
    # release the PREVIOUS call's cache (r8, ADVICE): the return value is
    # lazy so this call's cache cannot be freed here, but repeated
    # semdedup calls in one session must not accumulate executor storage.
    # A caller still holding an unmaterialized earlier result only pays a
    # recompute — correctness is unaffected.
    global _SEMDEDUP_PREV_CACHE
    prev = _SEMDEDUP_PREV_CACHE
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    _SEMDEDUP_PREV_CACHE = assigned
    pairs = _semdedup_pairs(assigned, id_col, threshold, pair_blocks)
    loser = (
        F.when(F.col("cs1") > F.col("cs2"), F.col("id1"))
        .when(F.col("cs2") > F.col("cs1"), F.col("id2"))
        .otherwise(F.greatest(F.col("id1"), F.col("id2")))
    )
    removed = pairs.select(loser.alias(id_col)).distinct().withColumn(
        "is_removed", F.lit(1))
    return (
        assigned.join(removed, id_col, "left")
        .select(id_col, "centroid_id", "centroid_sim",
                F.coalesce("is_removed", F.lit(0)).cast("int")
                .alias("is_removed"))
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-nearest-neighbour label vote over the embedding space — the
    classic label-propagation / auto-labeling pass of a training-data
    pipeline (score unlabeled examples by their labeled neighbours).

    Plan: exact top-k per query (cosine_topk_bruteforce: broadcast the
    small query side, scan the corpus once), broadcast-join the k·|queries|
    neighbour rows back to their labels, then a bounded groupBy vote.
    The winner is deterministic: (vote count desc, summed similarity desc,
    label asc) — engine-portable because the similarities are the rounded
    gate values.

    Returns (query_id, pred_label, n_votes, w_sim) — one row per query."""
    nbrs = cosine_topk_bruteforce(corpus, queries, k=k,
                                  id_col=id_col, vec_col=vec_col)
    labels = corpus.select(F.col(id_col).alias("nbr_id"),
                           F.col(label_col).cast("bigint").alias("_lbl"))
    votes = (
        nbrs.join(labels, "nbr_id")
        .groupBy("query_id", "_lbl")
        .agg(F.count(F.lit(1)).alias("n_votes"),
             F.round(F.sum("sim") + F.lit(1e-9), 6).alias("w_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.desc("w_sim"), F.asc("_lbl"))
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", F.col("_lbl").alias("pred_label"),
                "n_votes", "w_sim")
    )


def _bucket_expr(v, n_planes: int, seed: int, dim: int):
    """Bucket id column for ONE hyperplane table: bit i = sign of the dot
    product with seeded random plane i. Cosine-similar vectors collide with
    probability 1 - theta/pi per bit."""
    import random

    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
    bucket = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot_expr(v, plane) > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def hyperplane_buckets(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 8, seed: int = 42, dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (single table)."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("bucket", _bucket_expr(v, n_planes, seed, dim))


def cosine_lsh_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.35, n_planes: int | str = 4, n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate near-dup pairs: candidates share an LSH bucket in any of
    n_tables hyperplane tables; verified with exact cosine. No O(n^2) join.

    Tuning: per-bit collision prob for angle theta is 1 - theta/pi, so bucket
    recall per table is (1 - theta/pi)^n_planes. The defaults (4 planes x 8
    tables) give ~0.7 recall at cos 0.35 and ~1.0 at true near-dup levels
    (cos >= 0.9); raise n_planes for tighter thresholds to shrink buckets.
    ``n_planes='auto'`` sizes planes to the corpus — ceil(log2(n / 64)),
    min 4 — targeting ~64-vector expected bucket occupancy, so per-table
    random-collision candidates stay ~32*n no matter how large n grows.
    That plane count is affordable exactly in the near-dup regime this
    operator is for: at cos 0.8 the per-bit prob is 0.795 and at the
    0.95+ similarities of real near-dups it is >= 0.93, so 32 tables keep
    the per-pair miss probability << 1e-6 while buckets stay tiny
    (standard rho = ln(p1)/ln(p2) = 0.33 at cos 0.8: total work ~n^1.33).

    SCALE REGIME (measured, sf1 rehearsal): hyperplane LSH is subquadratic
    only when the threshold is high enough that near pairs collide much
    more often than random ones (cos >= ~0.8, per-bit prob >= 0.80 vs 0.5).
    At loose thresholds like 0.35 (per-bit 0.61) the LSH gap ratio is close
    to 1 and NO plane/table setting is subquadratic under a fixed
    miss-probability budget: a pinned 2-plane x 32-table plan that is exact
    and instant at 2k vectors degenerated to ~1.6e9 in-bucket candidate
    pairs (>45 min) at 20k vectors. Loose-threshold similarity sweeps
    should use cosine_topk_ivf (bounded probes) instead; keep bucket-join
    LSH for true near-dup thresholds.

    Plan (one scan, one shuffle, survivors-only distinct): ALL table
    buckets are computed per row by ONE Arrow matmul UDF — (batch x dim)
    @ (dim x tables*planes), sign-packed per table — instead of
    tables*planes interpreted higher-order dot expressions (the r6 HOF
    trap: 288 interpreted folds/row at sf1 auto sizing). Rows are
    posexploded to (table, bucket) and verified BUCKET-LOCALLY with
    applyInPandas: each (table, bucket) group does a vectorized all-pairs
    matmul prune (margin 1e-6 under the threshold) and recomputes the
    exact sequential-fold cosine only for pairs that survive the prune —
    candidate pairs are never materialized into a join or an Exchange, so
    the shuffle volume is n*tables vector rows and the only downstream
    shuffle (the cross-table distinct) carries the rare survivors. Bucket
    tasks stay bounded because 'auto' pins expected occupancy at ~64; the
    exact fold reproduces DuckDB's list_dot_product associativity, so
    results are oracle-hashable."""
    import numpy as _np
    import random as _random

    if n_planes == "auto":
        import math
        n = df.count()
        n_planes = max(4, math.ceil(math.log2(max(n, 2) / 64)))

    base = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    id_type = base.schema[id_col].dataType.simpleString()

    planes = []
    for t in range(n_tables):
        rng = _random.Random(42 + 97 * t)
        planes.append([[rng.gauss(0, 1) for _ in range(dim)]
                       for _ in range(n_planes)])
    proj = _np.asarray(planes, dtype=_np.float64).reshape(
        n_tables * n_planes, dim).T  # dim x (tables*planes)
    bit_w = (1 << _np.arange(n_planes)).astype(_np.int64)
    nt, npl, thr = n_tables, n_planes, float(threshold)

    @F.pandas_udf("array<bigint>")
    def _all_buckets(v):
        import numpy as np
        import pandas as pd
        if len(v) == 0:
            return pd.Series([], dtype=object)
        x = np.vstack(v.to_numpy())
        bits = (x @ proj) > 0
        ids = (bits.reshape(len(x), nt, npl) * bit_w).sum(axis=2)
        return pd.Series(list(ids))

    def _verify_bucket(pdf):
        import numpy as np
        import pandas as pd
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id1": pdf[id_col][:0], "id2": pdf[id_col][:0],
                                 "sim": pd.Series([], dtype="float64")})
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        x = np.vstack(pdf["v"].to_numpy())[order]
        norms = np.sqrt(np.einsum("ij,ij->i", x, x))
        xn = x / np.where(norms == 0, 1.0, norms)[:, None]
        approx = xn @ xn.T
        iu, ju = np.triu_indices(m, k=1)
        keep = approx[iu, ju] >= thr - 1e-6
        ik, jk = iu[keep], ju[keep]
        if len(ik) == 0:
            return pd.DataFrame({"id1": pdf[id_col][:0], "id2": pdf[id_col][:0],
                                 "sim": pd.Series([], dtype="float64")})
        # exact fold, vectorized ACROSS pairs but sequential WITHIN each
        # pair (dim-major accumulation) — reproduces DuckDB's
        # list_dot_product left-fold associativity element for element
        a, b = x[ik], x[jk]
        dot = np.zeros(len(ik)); naa = np.zeros(len(ik)); nbb = np.zeros(len(ik))
        for k in range(x.shape[1]):
            dot += a[:, k] * b[:, k]
            naa += a[:, k] * a[:, k]
            nbb += b[:, k] * b[:, k]
        raw = dot / (np.sqrt(naa) * np.sqrt(nbb)) + 1e-9
        sims = np.asarray([round(s, 6) for s in raw.tolist()])
        final = sims >= thr
        return pd.DataFrame({"id1": ids[ik[final]], "id2": ids[jk[final]],
                             "sim": pd.Series(sims[final], dtype="float64")})

    long = base.select(
        id_col, "v",
        F.posexplode(_all_buckets(F.col("v"))).alias("table", "bucket"))
    pairs = long.groupBy("table", "bucket").applyInPandas(
        _verify_bucket, schema=f"id1 {id_type}, id2 {id_type}, sim double")
    return pairs.distinct()
