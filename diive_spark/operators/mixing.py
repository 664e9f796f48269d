"""Deterministic corpus sampling and source mixing (engine-new surface —
the data-mixture step of a training pipeline: choose how much of each
source enters the mix, reproducibly).

Sampling here is a PURE FUNCTION of (row id, seed) — an md5-derived
uniform per row compared against the fraction — not Spark's
``df.sample``/``sampleBy`` (whose Bernoulli draw depends on partitioning
and rerun). That buys three properties a 100 TB pipeline needs:

- **rerun-stable**: a resumed/replayed job keeps exactly the same rows;
- **engine-portable**: the same rows fall out of any engine that can md5
  (the SQL oracle replays the draw bit-for-bit);
- **join-free scaling**: the draw is a row-local expression riding the
  scan — no shuffle, no state.

Temperature-based mixture weights (p_i proportional to c_i^(1/T),
standard multilingual/multi-source training practice) are computed from
the per-source counts — a bounded aggregate — and applied as per-source
fractions against a target budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diive_spark.operators.dedup import h32

#: the uniform's denominator (h32 yields 32-bit values)
_U32 = float(1 << 32)


def _uniform(id_col: Column, seed: int) -> Column:
    """U(0,1) as a pure function of (id, seed): md5-derived 32-bit hash of
    'id:seed' scaled to [0, 1). Identical in Spark and DuckDB."""
    return h32(F.concat(id_col.cast("string"), F.lit(f":{seed}"))) / F.lit(_U32)


def deterministic_sample(
    df: DataFrame, fraction: float, seed: int = 0, id_col: str = "doc_id",
) -> DataFrame:
    """Keep rows whose per-row uniform falls under ``fraction``."""
    return df.filter(_uniform(F.col(id_col), seed) < fraction)


def source_mix(
    df: DataFrame,
    fractions: dict,
    seed: int = 0,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source sampling fractions (a training data mixture). Sources
    absent from ``fractions`` are dropped; fraction 1.0 keeps everything
    from that source. The fraction lookup is a CASE expression — no join,
    the draw stays row-local."""
    frac = None
    for src, f in sorted(fractions.items()):
        branch = F.when(F.col(source_col) == src, F.lit(float(f)))
        frac = branch if frac is None else frac.when(
            F.col(source_col) == src, F.lit(float(f)))
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.filter(_uniform(F.col(id_col), seed) < frac)


def deterministic_shuffle(
    df: DataFrame,
    seed: int = 0,
    epoch: int = 0,
    id_col: str = "doc_id",
    num_shards: int | None = None,
) -> DataFrame:
    """Global deterministic training order: rank every row by the
    md5-derived key of '(id):(seed):(epoch)' (ties broken by id). The
    emitted ``shuffle_pos`` (0-based) is the position a sequential trainer
    reads the row at — stable across reruns, engines, and partitionings,
    and a fresh permutation per epoch.

    NOT a global-ordering window (that plan funnels the corpus through ONE
    partition). The scalable plan: shard = the hash key's high bits (a
    DETERMINISTIC column, uniform because the key is md5-derived — unlike
    ``spark_partition_id`` after a sampled ``repartitionByRange``, it
    cannot drift between passes), rank locally inside each shard, compute
    per-shard offsets as a prefix sum over the #shards-row size table, and
    broadcast-join the offsets back. Global position = shard offset +
    local rank - 1. One corpus-sized shuffle (keyed on shard), one bounded
    aggregate, zero collects."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if num_shards is None:
        num_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    key = h32(F.concat(F.col(id_col).cast("string"),
                       F.lit(f":{seed}:{epoch}")))
    shard = F.floor(F.col("_ds_key") / F.lit(float(_U32) / num_shards)).cast("int")
    keyed = df.withColumn("_ds_key", key).withColumn("_ds_shard", shard)
    w = Window.partitionBy("_ds_shard").orderBy("_ds_key", id_col)
    local = keyed.withColumn("_ds_rk", F.row_number().over(w))
    sizes = keyed.groupBy("_ds_shard").agg(F.count(F.lit(1)).alias("_ds_cnt"))
    w_off = (Window.orderBy("_ds_shard")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = sizes.select(
        "_ds_shard",
        F.coalesce(F.sum("_ds_cnt").over(w_off), F.lit(0)).alias("_ds_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_ds_shard")
        .withColumn(
            "shuffle_pos",
            (F.col("_ds_off") + F.col("_ds_rk") - 1).cast("bigint"))
        .drop("_ds_key", "_ds_shard", "_ds_rk", "_ds_off")
    )


def temperature_fractions(
    df: DataFrame,
    temperature: float,
    target_rows: int,
    source_col: str = "source",
) -> dict:
    """Mixture fractions from temperature-scaled source sizes: sampling
    probability p_i proportional to c_i^(1/T) (T=1 -> natural proportions,
    T->inf -> uniform over sources), scaled so the expected kept rows hit
    ``target_rows``; each fraction capped at 1.0 (no upsampling — repeat
    epochs handle that downstream). Capped sources' shortfall is
    water-filled onto the uncapped sources (re-scaled on their relative
    weights each pass) until either the expected kept rows hit
    ``target_rows`` exactly or every source is capped (target exceeds the
    corpus — expected rows then undershoot at sum(counts)). One bounded
    aggregate; the returned dict is vocabulary-of-sources sized."""
    counts = {r[source_col]: r["cnt"] for r in
              df.groupBy(source_col).agg(F.count("*").alias("cnt")).collect()}
    if not counts:
        return {}
    weights = {s: c ** (1.0 / temperature) for s, c in counts.items()}
    fracs = {s: 0.0 for s in counts}
    capped: set = set()
    remaining = float(target_rows)
    # water-filling: each pass distributes the remaining row budget over
    # the uncapped sources in weight proportion; any source whose implied
    # fraction exceeds 1.0 is pinned there (contributing its full count)
    # and its overflow re-enters the pool. <= len(counts) passes.
    while remaining > 1e-9 and len(capped) < len(counts):
        free_w = sum(weights[s] for s in counts if s not in capped)
        newly_capped = False
        for s in counts:
            if s in capped:
                continue
            want = remaining * (weights[s] / free_w) / counts[s]
            if want >= 1.0:
                fracs[s] = 1.0
                capped.add(s)
                newly_capped = True
        if not newly_capped:
            for s in counts:
                if s not in capped:
                    fracs[s] = remaining * (weights[s] / free_w) / counts[s]
            break
        remaining = target_rows - sum(
            fracs[s] * counts[s] for s in capped)
    return fracs


def _hashed_grams(df: DataFrame, id_col: str, text_col: str,
                  n_buckets: int, seed: int) -> DataFrame:
    """(id, bucket) rows: one per word unigram AND adjacent word bigram
    (with multiplicity — DSIR's bag-of-hashed-ngrams features), bucketed
    by the engine's md5-derived 32-bit hash mod n_buckets. The gram
    construction is the one-pass zip_with form (never element_at inside a
    lambda, which re-evaluates split() per element)."""
    # the word array is non-cheap (filter-HOF over split) and referenced
    # three times by the gram expression — materialize it as its own
    # projection column so it is built once per row (the CSE rule; the
    # inline form re-ran the filtered split per reference)
    uni = F.col("_uni")
    big = F.zip_with(
        F.slice(uni, 1, F.greatest(F.size(uni) - 1, F.lit(0))),
        F.slice(uni, 2, F.greatest(F.size(uni) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bucket = F.pmod(
        h32(F.concat(F.col("gram"), F.lit(f":{seed}"))), F.lit(n_buckets))
    return (
        df.select(F.col(id_col),
                  F.filter(F.split(F.col(text_col), " "),
                           lambda x: x != "").alias("_uni"))
        .select(F.col(id_col), F.explode(F.concat(uni, big)).alias("gram"))
        .select(id_col, bucket.alias("bucket"))
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 0,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance log-weights (public recipe: Xie et al. 2023,
    arXiv:2302.03169 — Data Selection via Importance Resampling): score
    every raw document by how much more likely its hashed n-gram bag is
    under the TARGET distribution than under the RAW distribution,

        logw(x) = sum over grams g of ln p_target(b(g)) - ln p_raw(b(g)),

    with add-alpha smoothed bucket unigram models over ``n_buckets``
    hashed features.

    Scale shape (r7): ONE raw gram explode feeds a per-(doc, bucket)
    count table — the hashed feature bag, localCheckpoint-ed (ints only,
    far smaller than the gram stream) — from which BOTH the raw bucket
    model (regroup by bucket) and the per-doc weight sum (join the
    broadcast ratio, sum n * logratio) derive; the target pays one gram
    explode into its bounded bucket-count table. The bounded count
    tables are pinned too: each is referenced twice (ratio full-join +
    its total), and re-deriving them re-ran the corpus explode per
    reference. No driver-side data anywhere. Deterministic and
    engine-portable: buckets are md5-derived, so a SQL oracle replays
    the exact weights (per-doc float-sum ordering differs from a
    gram-by-gram fold only in the ~1e-13 reassociation range the
    +1e-9/round-6 convention absorbs).

    Returns raw's (id_col, logw) — logw rounded to 6 decimals."""
    tg = _hashed_grams(target, id_col, text_col, n_buckets, seed)
    rg = _hashed_grams(raw, id_col, text_col, n_buckets, seed)
    pdb = rg.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n")) \
        .localCheckpoint(eager=True)
    tc = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t")) \
        .localCheckpoint(eager=True)
    rc = pdb.groupBy("bucket").agg(F.sum("n").alias("c_r")) \
        .localCheckpoint(eager=True)
    # model totals derive from the (<= n_buckets-row) count tables — no
    # .count() action, no extra corpus pass, fully lazy single-row aggs
    tot_t = tc.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("_n_t"))
    tot_r = rc.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("_n_r"))
    ab = F.lit(alpha * n_buckets)
    ratio = (
        tc.join(rc, "bucket", "full")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "bucket",
            (F.log((F.coalesce("c_t", F.lit(0)) + F.lit(alpha))
                   / (F.col("_n_t") + ab))
             - F.log((F.coalesce("c_r", F.lit(0)) + F.lit(alpha))
                     / (F.col("_n_r") + ab))
             ).alias("logratio"),
        )
    )
    summed = (
        pdb.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("n") * F.col("logratio")) + F.lit(1e-9), 6)
             .alias("logw"))
    )
    # docs with zero grams score 0, not dropped
    return (
        raw.select(id_col).join(summed, id_col, "left")
        .fillna({"logw": 0.0})
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    seed: int = 0,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR's sampling step: Gumbel top-k over the importance log-weights
    (the standard without-replacement trick — adding i.i.d. Gumbel noise
    to log-weights and taking the top k samples proportionally to the
    weights). The Gumbel draw is the engine's deterministic md5 uniform of
    (id, seed), so the selected set is rerun-stable and oracle-replayable;
    orderBy().limit(k) executes as a distributed TakeOrderedAndProject.

    Returns (id_col, logw, key) for the k selected documents."""
    lw = dsir_logweights(raw, target, id_col, text_col, n_buckets, seed,
                         alpha)
    u = (h32(F.concat(F.col(id_col).cast("string"), F.lit(f":g{seed}")))
         + F.lit(0.5)) / F.lit(_U32)
    gumbel = -F.log(-F.log(u))
    return (
        lw.withColumn("key", F.round(F.col("logw") + gumbel + F.lit(1e-9), 6))
        .orderBy(F.desc("key"), F.asc(id_col))
        .limit(k)
    )
