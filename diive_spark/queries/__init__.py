"""Query catalog package: named queries over the driver test tables +
matching ANSI-SQL oracles (DuckDB dialect) — the per-round correctness gate.

Split by topic (core / llm / analysis / flux); the union-merge layer and
the 50-entry registry assembly live HERE, in one place, as before the
split. Section modules register their singles into the shared dicts in
the original monolith order.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ._shared import _hourly_gridded, _r6, _t  # noqa: F401
from ._shared import QUERIES, ORACLES
from . import core as _core  # noqa: F401  (registration side effects)
from . import llm as _llm  # noqa: F401
from . import analysis as _analysis  # noqa: F401
from . import flux as _flux  # noqa: F401
from . import hires as _hires  # noqa: F401
from . import partition as _partition  # noqa: F401

# ---------------------------------------------------------------------------
# Gate consolidation: the driver records at most 50 queries() entries
# (r3 evidence: 53 registered -> exactly the first 50 in registration order
# got CORRECTNESS rows). Same-family variant gates are therefore merged
# into UNION gates with a `variant` discriminator — each variant keeps its
# full value oracle, the merged gate certifies every underlying operator,
# and the registry below pins the final order at exactly 50 entries with
# the newest/previously-unrecorded gates early.
# ---------------------------------------------------------------------------

_SINGLE_QUERIES = dict(QUERIES)
_SINGLE_ORACLES = dict(ORACLES)


def _variant_union_sql(parts):
    """UNION ALL of (variant, select_list, oracle_sql) with NULL padding."""
    sels = []
    for variant, cols, sql in parts:
        collist = ", ".join(cols)
        sels.append(
            f"SELECT '{variant}' AS variant, {collist} FROM ({sql.strip()})")
    return "\nUNION ALL\n".join(sels)


def q_histogram_modes(spark, sf_dir):
    """Histogram family: fixed-n binning + Freedman-Diaconis auto-binning
    (both previously standalone gates) as one union, variant-tagged."""
    a = _SINGLE_QUERIES["histogram"](spark, sf_dir).select(
        F.lit("n20").alias("variant"), "bin",
        F.col("cnt").alias("counts"),
        F.lit(None).cast("double").alias("bin_start_v"))
    b = _SINGLE_QUERIES["histogram_fd"](spark, sf_dir).select(
        F.lit("fd").alias("variant"), "bin", "counts", "bin_start_v")
    return a.unionByName(b)


SQL_HISTOGRAM_MODES = _variant_union_sql([
    ("n20", ["bin", "cnt AS counts", "CAST(NULL AS DOUBLE) AS bin_start_v"],
     _SINGLE_ORACLES["histogram"]),
    ("fd", ["bin", "counts", "bin_start_v"], _SINGLE_ORACLES["histogram_fd"]),
])


def q_zscore_family(spark, sf_dir):
    """zScore global/day-night outliers + zScoreIncrements + centred
    rolling z-score as one union."""
    a = _SINGLE_QUERIES["zscore_outliers"](spark, sf_dir).select(
        F.lit("global").alias("variant"), "event_id", "event_type",
        "value_v",
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("int").alias("flag"))
    b = _SINGLE_QUERIES["zscore_increments"](spark, sf_dir).select(
        F.lit("increments").alias("variant"),
        F.lit(None).cast("long").alias("event_id"), "event_type",
        F.lit(None).cast("double").alias("value_v"), "window_start", "flag")
    c = _SINGLE_QUERIES["zscore_rolling"](spark, sf_dir).select(
        F.lit("rolling").alias("variant"),
        F.lit(None).cast("long").alias("event_id"), "event_type",
        F.lit(None).cast("double").alias("value_v"), "window_start", "flag")
    return a.unionByName(b).unionByName(c)


def q_limit_flags(spark, sf_dir):
    """AbsoluteLimits + TrimLow flag gates as one union."""
    a = _SINGLE_QUERIES["abs_limits"](spark, sf_dir).select(
        F.lit("abs_limits").alias("variant"), "event_id",
        F.lit(None).cast("string").alias("event_type"), "flag",
        F.lit(None).cast("double").alias("value_v"))
    b = _SINGLE_QUERIES["trim_low"](spark, sf_dir).select(
        F.lit("trim_low").alias("variant"), "event_id", "event_type",
        F.lit(None).cast("int").alias("flag"), "value_v")
    return a.unionByName(b)


def q_ale_1d2d(spark, sf_dir):
    """First- and second-order ALE as one union (1D rows pad the y axis)."""
    a = _SINGLE_QUERIES["ale_linear"](spark, sf_dir).select(
        F.lit("1d").alias("variant"),
        F.col("edge_idx").alias("x_idx"),
        F.lit(None).cast("int").alias("y_idx"),
        F.col("edge").alias("x_edge"),
        F.lit(None).cast("double").alias("y_edge"),
        "ale", F.col("bin_count").alias("n_cell"))
    b = _SINGLE_QUERIES["ale_interaction_2d"](spark, sf_dir).select(
        F.lit("2d").alias("variant"), "x_idx", "y_idx", "x_edge", "y_edge",
        "ale", F.col("cell_count").alias("n_cell"))
    return a.unionByName(b)


def q_cumulatives(spark, sf_dir):
    """Per-year DOY cumulative + quadrature cumulative as one union."""
    a = _SINGLE_QUERIES["doy_cumulative"](spark, sf_dir).select(
        F.lit("doy").alias("variant"), "year", "doy",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("cum_v"))
    b = _SINGLE_QUERIES["quadrature_cumulative"](spark, sf_dir).select(
        F.lit("quadrature").alias("variant"),
        F.lit(None).cast("int").alias("year"),
        F.lit(None).cast("int").alias("doy"),
        "event_id", "event_type",
        F.col("cumq_v").alias("cum_v"))
    return a.unionByName(b)


def q_gapfill_fills_1h(spark, sf_dir):
    """The three fill methods (linear interpolation, rolling-median
    cascade, climatology fallback) share one output shape — one union
    certifies all three."""
    parts = []
    for variant, name in (("interp", "interp_linear_1h"),
                          ("median", "median_fill_1h"),
                          ("climatology", "climatology_fill_1h")):
        parts.append(_SINGLE_QUERIES[name](spark, sf_dir).select(
            F.lit(variant).alias("variant"), "event_type", "window_start",
            "filled_v", "fill_flag"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _int_cast(col, typ):
    return f"CAST({col} AS {typ})"


SQL_ZSCORE_FAMILY = _variant_union_sql([
    ("global", ["event_id", "event_type", "value_v",
                "CAST(NULL AS TIMESTAMP) AS window_start",
                "CAST(NULL AS INTEGER) AS flag"],
     _SINGLE_ORACLES["zscore_outliers"]),
    ("increments", ["CAST(NULL AS BIGINT) AS event_id", "event_type",
                    "CAST(NULL AS DOUBLE) AS value_v", "window_start",
                    "flag"],
     _SINGLE_ORACLES["zscore_increments"]),
    ("rolling", ["CAST(NULL AS BIGINT) AS event_id", "event_type",
                 "CAST(NULL AS DOUBLE) AS value_v", "window_start",
                 "flag"],
     _SINGLE_ORACLES["zscore_rolling"]),
])

SQL_LIMIT_FLAGS = _variant_union_sql([
    ("abs_limits", ["event_id", "CAST(NULL AS VARCHAR) AS event_type",
                    "flag", "CAST(NULL AS DOUBLE) AS value_v"],
     _SINGLE_ORACLES["abs_limits"]),
    ("trim_low", ["event_id", "event_type",
                  "CAST(NULL AS INTEGER) AS flag", "value_v"],
     _SINGLE_ORACLES["trim_low"]),
])

SQL_ALE_1D2D = _variant_union_sql([
    ("1d", ["edge_idx AS x_idx", "CAST(NULL AS INTEGER) AS y_idx",
            "edge AS x_edge", "CAST(NULL AS DOUBLE) AS y_edge", "ale",
            "bin_count AS n_cell"],
     _SINGLE_ORACLES["ale_linear"]),
    ("2d", ["x_idx", "y_idx", "x_edge", "y_edge", "ale",
            "cell_count AS n_cell"],
     _SINGLE_ORACLES["ale_interaction_2d"]),
])

SQL_CUMULATIVES = _variant_union_sql([
    ("doy", ["year", "doy", "CAST(NULL AS BIGINT) AS event_id",
             "CAST(NULL AS VARCHAR) AS event_type", "cum_v"],
     _SINGLE_ORACLES["doy_cumulative"]),
    ("quadrature", ["CAST(NULL AS INTEGER) AS year",
                    "CAST(NULL AS INTEGER) AS doy", "event_id", "event_type",
                    "cumq_v AS cum_v"],
     _SINGLE_ORACLES["quadrature_cumulative"]),
])

SQL_GAPFILL_FILLS_1H = _variant_union_sql([
    ("interp", ["event_type", "window_start", "filled_v", "fill_flag"],
     _SINGLE_ORACLES["interp_linear_1h"]),
    ("median", ["event_type", "window_start", "filled_v", "fill_flag"],
     _SINGLE_ORACLES["median_fill_1h"]),
    ("climatology", ["event_type", "window_start", "filled_v", "fill_flag"],
     _SINGLE_ORACLES["climatology_fill_1h"]),
])

def q_grid_agg(spark, sf_dir):
    """GridAggregator equal-width + quantile binning as one union."""
    a = _SINGLE_QUERIES["grid_agg_2d"](spark, sf_dir).select(
        F.lit("equal_width").alias("variant"), "xbin", "ybin", "n_vals",
        "mean_z")
    b = _SINGLE_QUERIES["grid_agg_2d_quantile"](spark, sf_dir).select(
        F.lit("quantile").alias("variant"), "xbin", "ybin", "n_vals",
        "mean_z")
    return a.unionByName(b)


SQL_GRID_AGG = _variant_union_sql([
    ("equal_width", ["xbin", "ybin", "n_vals", "mean_z"],
     _SINGLE_ORACLES["grid_agg_2d"]),
    ("quantile", ["xbin", "ybin", "n_vals", "mean_z"],
     _SINGLE_ORACLES["grid_agg_2d_quantile"]),
])

_SSTATS_COLS = ["mean_v", "sd_v", "min_v", "p05", "p25", "median_v",
                "p75", "p95", "max_v", "skew_m"]


def q_series_stats(spark, sf_dir):
    """sstats summary + percentiles101 grid as one union."""
    a = _SINGLE_QUERIES["sstats"](spark, sf_dir).select(
        F.lit("sstats").alias("variant"), "n", *_SSTATS_COLS,
        F.lit(None).cast("bigint").alias("pct"),
        F.lit(None).cast("double").alias("pv"))
    b = _SINGLE_QUERIES["percentiles"](spark, sf_dir).select(
        F.lit("percentiles").alias("variant"),
        F.lit(None).cast("long").alias("n"),
        *[F.lit(None).cast("double").alias(c) for c in _SSTATS_COLS],
        "pct", "pv")
    return a.unionByName(b)


SQL_SERIES_STATS = _variant_union_sql([
    ("sstats", ["n", *_SSTATS_COLS,
                "CAST(NULL AS BIGINT) AS pct", "CAST(NULL AS DOUBLE) AS pv"],
     _SINGLE_ORACLES["sstats"]),
    ("percentiles", ["CAST(NULL AS BIGINT) AS n",
                     *[f"CAST(NULL AS DOUBLE) AS {c}" for c in _SSTATS_COLS],
                     "pct", "pv"],
     _SINGLE_ORACLES["percentiles"]),
])

def q_decompose_family(spark, sf_dir):
    """Classical seasonal-trend decomposition + exact-DFT harmonic
    coefficients as one union (both over the hourly mean series)."""
    a = _SINGLE_QUERIES["classical_decompose"](spark, sf_dir).select(
        F.lit("classical").alias("variant"), "event_type", "window_start",
        "trend_v", "seasonal_v", "residual_v",
        F.lit(None).cast("int").alias("harmonic"),
        F.lit(None).cast("double").alias("freq_v"),
        F.lit(None).cast("double").alias("amp_v"),
        F.lit(None).cast("double").alias("phase_v"))
    b = _SINGLE_QUERIES["harmonics"](spark, sf_dir).select(
        F.lit("harmonic").alias("variant"), "event_type",
        F.lit(None).cast("timestamp_ntz").alias("window_start"),
        F.lit(None).cast("double").alias("trend_v"),
        F.lit(None).cast("double").alias("seasonal_v"),
        F.lit(None).cast("double").alias("residual_v"),
        "harmonic", "freq_v", "amp_v", "phase_v")
    return a.unionByName(b)


SQL_DECOMPOSE_FAMILY = _variant_union_sql([
    ("classical", ["event_type", "window_start", "trend_v", "seasonal_v",
                   "residual_v", "CAST(NULL AS INTEGER) AS harmonic",
                   "CAST(NULL AS DOUBLE) AS freq_v",
                   "CAST(NULL AS DOUBLE) AS amp_v",
                   "CAST(NULL AS DOUBLE) AS phase_v"],
     _SINGLE_ORACLES["classical_decompose"]),
    ("harmonic", ["event_type", "CAST(NULL AS TIMESTAMP) AS window_start",
                  "CAST(NULL AS DOUBLE) AS trend_v",
                  "CAST(NULL AS DOUBLE) AS seasonal_v",
                  "CAST(NULL AS DOUBLE) AS residual_v",
                  "CAST(harmonic AS INTEGER) AS harmonic", "freq_v",
                  "amp_v", "phase_v"],
     _SINGLE_ORACLES["harmonics"]),
])


_PARTITION_NT_COLS = ["d", "n", "reco", "reco_rob", "gpp", "rref", "e0"]
_PARTITION_DAY_COLS = ["i", "potrad", "nep"]


def q_partition_family(spark, sf_dir):
    """ONEFlux nighttime partitioning (reference-executed goldens) +
    REddyProc-daytime deterministic stages (full SQL replay) as one
    union — see queries/partition.py for the oracle-style rationale."""
    a = _SINGLE_QUERIES["nt_oneflux"](spark, sf_dir).select(
        F.lit("nt_oneflux").alias("variant"), *_PARTITION_NT_COLS,
        F.lit(None).cast("long").alias("i"),
        F.lit(None).cast("double").alias("potrad"),
        F.lit(None).cast("double").alias("nep"))
    b = _SINGLE_QUERIES["day_rp_stages"](spark, sf_dir).select(
        F.lit("day_rp").alias("variant"),
        F.lit(None).cast("string").alias("d"),
        F.lit(None).cast("long").alias("n"),
        *[F.lit(None).cast("double").alias(c)
          for c in ("reco", "reco_rob", "gpp", "rref", "e0")],
        *_PARTITION_DAY_COLS)
    return a.unionByName(b)


SQL_PARTITION_FAMILY = _variant_union_sql([
    ("nt_oneflux", ["d", "CAST(n AS BIGINT) AS n",
                    *[f"CAST({c} AS DOUBLE) AS {c}"
                      for c in ("reco", "reco_rob", "gpp", "rref", "e0")],
                    "CAST(NULL AS BIGINT) AS i",
                    "CAST(NULL AS DOUBLE) AS potrad",
                    "CAST(NULL AS DOUBLE) AS nep"],
     _SINGLE_ORACLES["nt_oneflux"]),
    ("day_rp", ["CAST(NULL AS VARCHAR) AS d", "CAST(NULL AS BIGINT) AS n",
                *[f"CAST(NULL AS DOUBLE) AS {c}"
                  for c in ("reco", "reco_rob", "gpp", "rref", "e0")],
                "CAST(i AS BIGINT) AS i", "potrad", "nep"],
     _SINGLE_ORACLES["day_rp_stages"]),
])


_HIRES_PHYS_COLS = ["i", "ra", "t_surf", "k_air", "lv_mj", "fct_u"]
_HIRES_SF_COLS = ["daytime", "bin", "cls_min", "cls_max", "sf", "sos",
                  "nvals"]
_HIRES_PWB_STR = ["seg", "combo"]
_HIRES_PWB_DBL = ["tlag_s", "hdi_lo", "hdi_hi", "tlag_pw", "corr_pw",
                  "cov_pwb"]
_HIRES_PWB_LNG = ["tlag_rec", "ar_s", "ar_w", "ar_t", "n_used"]


def q_hires_lag(spark, sf_dir):
    """SCOP self-heating physics + scaling-factor optimizer (full SQL
    replays) + PWB winning-lag detection (reference-executed goldens) as
    one union — see queries/hires.py for fixture/oracle design."""
    _sf_dbl = ["cls_min", "cls_max", "sf", "sos"]
    a = _SINGLE_QUERIES["scop_physics"](spark, sf_dir).select(
        F.lit("physics").alias("variant"), *_HIRES_PHYS_COLS,
        *[F.lit(None).cast("long").alias(c)
          for c in ("daytime", "bin", "nvals")],
        *[F.lit(None).cast("double").alias(c) for c in _sf_dbl],
        *[F.lit(None).cast("string").alias(c) for c in _HIRES_PWB_STR],
        *[F.lit(None).cast("double").alias(c) for c in _HIRES_PWB_DBL],
        F.lit(None).cast("int").alias("reliable"),
        *[F.lit(None).cast("long").alias(c) for c in _HIRES_PWB_LNG])
    b = _SINGLE_QUERIES["scop_sf"](spark, sf_dir).select(
        F.lit("sf").alias("variant"),
        F.lit(None).cast("long").alias("i"),
        *[F.lit(None).cast("double").alias(c)
          for c in ("ra", "t_surf", "k_air", "lv_mj", "fct_u")],
        *_HIRES_SF_COLS[:2], *_sf_dbl, "nvals",
        *[F.lit(None).cast("string").alias(c) for c in _HIRES_PWB_STR],
        *[F.lit(None).cast("double").alias(c) for c in _HIRES_PWB_DBL],
        F.lit(None).cast("int").alias("reliable"),
        *[F.lit(None).cast("long").alias(c) for c in _HIRES_PWB_LNG])
    c = _SINGLE_QUERIES["pwb_lag"](spark, sf_dir).select(
        F.lit("pwb").alias("variant"),
        F.lit(None).cast("long").alias("i"),
        *[F.lit(None).cast("double").alias(x)
          for x in ("ra", "t_surf", "k_air", "lv_mj", "fct_u")],
        *[F.lit(None).cast("long").alias(x)
          for x in ("daytime", "bin")],
        *[F.lit(None).cast("double").alias(x) for x in _sf_dbl],
        F.lit(None).cast("long").alias("nvals"),
        "seg", "combo", *_HIRES_PWB_DBL, "reliable", *_HIRES_PWB_LNG)
    return a.unionByName(b).unionByName(c)


def _hires_sql_parts():
    """Each variant emits the SAME canonical column order (SQL UNION ALL
    is positional): (name, sqltype, variants-that-own-it)."""
    canon = [
        ("i", "BIGINT", {"physics"}),
        ("ra", "DOUBLE", {"physics"}), ("t_surf", "DOUBLE", {"physics"}),
        ("k_air", "DOUBLE", {"physics"}), ("lv_mj", "DOUBLE", {"physics"}),
        ("fct_u", "DOUBLE", {"physics"}),
        ("daytime", "BIGINT", {"sf"}), ("bin", "BIGINT", {"sf"}),
        ("nvals", "BIGINT", {"sf"}),
        ("cls_min", "DOUBLE", {"sf"}), ("cls_max", "DOUBLE", {"sf"}),
        ("sf", "DOUBLE", {"sf"}), ("sos", "DOUBLE", {"sf"}),
        ("seg", "VARCHAR", {"pwb"}), ("combo", "VARCHAR", {"pwb"}),
        *[(c, "DOUBLE", {"pwb"}) for c in _HIRES_PWB_DBL],
        ("reliable", "INTEGER", {"pwb"}),
        *[(c, "BIGINT", {"pwb"}) for c in _HIRES_PWB_LNG],
    ]

    def cols(variant):
        return [f"CAST({name} AS {typ}) AS {name}" if variant in owners
                else f"CAST(NULL AS {typ}) AS {name}"
                for name, typ, owners in canon]

    return [("physics", cols("physics"), _SINGLE_ORACLES["scop_physics"]),
            ("sf", cols("sf"), _SINGLE_ORACLES["scop_sf"]),
            ("pwb", cols("pwb"), _SINGLE_ORACLES["pwb_lag"])]


SQL_HIRES_LAG = _variant_union_sql(_hires_sql_parts())


_MERGED_QUERIES = {
    "grid_agg": q_grid_agg,
    "series_stats": q_series_stats,
    "histogram_modes": q_histogram_modes,
    "zscore_family": q_zscore_family,
    "limit_flags": q_limit_flags,
    "ale_1d2d": q_ale_1d2d,
    "cumulatives": q_cumulatives,
    "gapfill_fills_1h": q_gapfill_fills_1h,
    "decompose_family": q_decompose_family,
    "partition_family": q_partition_family,
    "hires_lag": q_hires_lag,
}
_MERGED_ORACLES = {
    "grid_agg": SQL_GRID_AGG,
    "series_stats": SQL_SERIES_STATS,
    "histogram_modes": SQL_HISTOGRAM_MODES,
    "zscore_family": SQL_ZSCORE_FAMILY,
    "limit_flags": SQL_LIMIT_FLAGS,
    "ale_1d2d": SQL_ALE_1D2D,
    "cumulatives": SQL_CUMULATIVES,
    "gapfill_fills_1h": SQL_GAPFILL_FILLS_1H,
    "decompose_family": SQL_DECOMPOSE_FAMILY,
    "partition_family": SQL_PARTITION_FAMILY,
    "hires_lag": SQL_HIRES_LAG,
}

#: names folded into union gates (still defined above; not registered)
_MERGED_AWAY = {
    "histogram", "histogram_fd", "zscore_outliers", "zscore_increments",
    "abs_limits", "trim_low", "ale_linear", "ale_interaction_2d",
    "doy_cumulative", "quadrature_cumulative", "interp_linear_1h",
    "median_fill_1h", "climatology_fill_1h",
    "grid_agg_2d", "grid_agg_2d_quantile", "sstats", "percentiles",
    # round-6 merges
    "zscore_rolling", "classical_decompose", "harmonics",
    "nt_oneflux", "day_rp_stages", "scop_physics", "scop_sf", "pwb_lag",
}

#: final driver registry: exactly 50 entries; previously-unrecorded and
#: round-4 gates pinned right after the flagship so a runtime-bounded
#: driver still reaches them
_FINAL_ORDER = [
    "rollup_1m",
    "partition_family", "hires_lag",
    "timestamp_shift", "wind_rot_lag",
    "flux_partition_night", "ale_1d2d", "histogram_modes",
    "mds_fill", "ustar_bootstrap", "flux_partition_day", "rollup_stream_1m",
    "rollup_1h_gate90", "cascade_1d", "daily_agg_gate",
    "monthly_matrix_ranks", "diel_cycle", "gap_table_1h",
    "gapfill_fills_1h", "zscore_family", "limit_flags", "series_stats",
    "daily_correlation", "time_since", "dedup_exact",
    "ngram_jaccard", "text_quality", "lang_id", "fingerprint",
    "token_count", "simhash", "ann_cosine_topk", "embedding_near_dups",
    "minhash_lsh", "ann_ivf", "grid_agg",
    "cumulatives", "agg_as_hires", "keep_records_where",
    "stepwise_screening", "profile_lineitem", "minhash_signatures",
    "json_props", "gap_stats_monthly", "decompose_family",
    "compound_extremes", "rank_drivers", "ustar_mp",
    "random_uncertainty", "bin_fit_linear",
]

_ALL_QUERIES = {**_SINGLE_QUERIES, **_MERGED_QUERIES}
_ALL_ORACLES = {**_SINGLE_ORACLES, **_MERGED_ORACLES}
assert len(_FINAL_ORDER) == 50, len(_FINAL_ORDER)
assert set(_FINAL_ORDER) == (
    (set(_SINGLE_QUERIES) - _MERGED_AWAY) | set(_MERGED_QUERIES)
), "registry drift"

QUERIES = {n: _ALL_QUERIES[n] for n in _FINAL_ORDER}
ORACLES = {n: _ALL_ORACLES[n] for n in _FINAL_ORDER if n in _ALL_ORACLES}
