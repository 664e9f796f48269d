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
    epochs handle that downstream). One bounded aggregate; the returned
    dict is vocabulary-of-sources sized."""
    counts = {r[source_col]: r["cnt"] for r in
              df.groupBy(source_col).agg(F.count("*").alias("cnt")).collect()}
    if not counts:
        return {}
    weights = {s: c ** (1.0 / temperature) for s, c in counts.items()}
    tot_w = sum(weights.values())
    # expected rows from source i at fraction f_i = f_i * c_i; want
    # sum_i f_i c_i = target with f_i proportional to w_i / c_i
    raw = {s: target_rows * (weights[s] / tot_w) / counts[s] for s in counts}
    return {s: min(f, 1.0) for s, f in raw.items()}
