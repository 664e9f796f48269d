"""Time-lag window recommendation (operators/timelag.py) and
highest-quality flux analysis (operators/hqflux.py) vs the reference
flux/lowres/timelag_analysis.py + hqflux.py, both reference-EXECUTED."""

import numpy as np
import pandas as pd

from diive_spark.operators import hqflux, timelag
from tests.reference_harness import run_reference

LAT, LON, UTC = 46.58, 11.43, 1


def _tlag_series(seed=3, n=4000):
    """Discrete 0.05 s lag steps: a sharp physical peak near 0.35 s plus
    uniform junk across the search range (fringe accumulation)."""
    rng = np.random.default_rng(seed)
    peak = rng.normal(0.35, 0.06, int(n * 0.7))
    junk = rng.uniform(-1.0, 5.0, int(n * 0.3))
    v = np.round(np.concatenate([peak, junk]) / 0.05) * 0.05
    return np.abs(v)


def test_recommendation_matches_executed_reference():
    vals = _tlag_series()
    ref = run_reference(f"""
import numpy as np
vals = np.array({[float(v) for v in vals]!r})
idx = pd.date_range("2024-01-01", periods=len(vals), freq="30min")
df = pd.DataFrame({{"CO2_TLAG_ACTUAL": vals}}, index=idx)
from diive.flux.lowres.timelag_analysis import TimeLagAnalysis
tla = TimeLagAnalysis(df=df)
a = tla.analyze_gas("CO2")
print(json.dumps({{
    "peak": float(a["peak"]), "peak_min": float(a["peak_min"]),
    "peak_max": float(a["peak_max"]),
    "eddypro_min": float(a["eddypro_min"]),
    "eddypro_max": float(a["eddypro_max"]),
    "hist_bins": [float(b) for b in a["histogram_results"]["BIN_START_INCL"]],
    "hist_counts": [int(c) for c in a["histogram_results"]["COUNTS"]],
}}))
""")
    rec = timelag.recommend_lag_window(vals)
    assert rec["peak"] == ref["peak"]
    assert rec["peak_min"] == ref["peak_min"]
    assert rec["peak_max"] == ref["peak_max"]
    assert abs(rec["eddypro_min"] - ref["eddypro_min"]) < 1e-12
    assert abs(rec["eddypro_max"] - ref["eddypro_max"]) < 1e-12
    # the display-filtered histogram itself matches
    bins, counts = timelag.uniques_edge_histogram(vals)
    keep = (bins >= 0.0) & (bins <= 10.0)
    assert np.allclose(bins[keep], ref["hist_bins"])
    assert list(counts[keep]) == ref["hist_counts"]


def test_timelag_recommendation_spark(spark):
    frames = []
    for i, gas in enumerate(("CO2", "CH4")):
        frames.append(pd.DataFrame({
            "gas": gas, "tlag": _tlag_series(seed=3 + i)}))
    out = timelag.timelag_recommendation(
        spark.createDataFrame(pd.concat(frames)), ["gas"], "tlag"
    ).toPandas().set_index("gas")
    assert len(out) == 2
    for i, gas in enumerate(("CO2", "CH4")):
        want = timelag.recommend_lag_window(_tlag_series(seed=3 + i))
        for k, v in want.items():
            assert out.loc[gas, k] == v, (gas, k)
    # the recommendation brackets the planted 0.35 s peak
    assert out.loc["CO2", "eddypro_min"] <= 0.35 <= out.loc["CO2",
                                                            "eddypro_max"]


def _flux_frame(n_days=40, seed=9):
    rng = np.random.default_rng(seed)
    idx = pd.date_range("2023-06-01 00:15", periods=n_days * 48,
                        freq="30min")
    hours = idx.hour.to_numpy(float) + idx.minute.to_numpy(float) / 60.0
    base = -8 * np.maximum(0, np.sin((hours - 6) / 12 * np.pi)) \
        + 3 + rng.normal(0, 0.8, len(idx))
    base[rng.integers(0, len(idx), 25)] += rng.choice([-40, 40], 25)
    base[rng.integers(0, len(idx), 60)] = np.nan
    q = lambda a: np.round(a * 64) / 64  # noqa: E731
    return pd.DataFrame({"ts": idx, "NEE": q(base)})


def test_hqflux_matches_executed_reference(spark, tmp_path):
    pdf = _flux_frame()
    payload = tmp_path / "flux.json"
    payload.write_text(pdf.to_json())
    ref = run_reference(f"""
pdf = pd.read_json({str(payload)!r})
pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ms")
flux = pd.Series(pdf["NEE"].to_numpy(), index=pdf["ts"], name="NEE")
from diive.flux.lowres.hqflux import analyze_highest_quality_flux
hqdf, summary = analyze_highest_quality_flux(
    flux=flux, lat={LAT}, lon={LON}, utc_offset={UTC}, showplot=False,
    return_summary=True)
def ser(s):
    return [None if not np.isfinite(v) else float(v)
            for v in np.asarray(s, float)]
print(json.dumps({{
    "day": ser(hqdf["FLUX_DAYTIME"]), "night": ser(hqdf["FLUX_NIGHTTIME"]),
    "rmed_day": ser(hqdf["ROLLING_MEDIAN_DAYTIME"]),
    "rmed_night": ser(hqdf["ROLLING_MEDIAN_NIGHTTIME"]),
    "sd_day": float(hqdf["SD_DAYTIME"].dropna().iloc[0]),
    "sd_night": float(hqdf["SD_NIGHTTIME"].dropna().iloc[0]),
    "win_day": int(hqdf["WINSIZE_DAYTIME"].dropna().iloc[0]),
    "win_night": int(hqdf["WINSIZE_NIGHTTIME"].dropna().iloc[0]),
    "total": int(summary["total_records"]),
    "valid": int(summary["valid_records"]),
    "outliers": int(summary["outliers_found"]),
    "window_length": int(summary["window_length"]),
}}))
""", timeout=600)
    hqdf, summary = hqflux.analyze_highest_quality_flux(
        spark.createDataFrame(pdf.assign(site="A")), ["site"], "ts", "NEE",
        lat=LAT, lon=LON, utc_offset=UTC)
    got = hqdf.toPandas().sort_values("ts").reset_index(drop=True)
    s = summary.toPandas().iloc[0]
    assert int(s["total_records"]) == ref["total"]
    assert int(s["valid_records"]) == ref["valid"]
    assert int(s["outliers_found"]) == ref["outliers"]
    assert int(s["window_length"]) == ref["window_length"]

    def side(period):
        sub = got[got["period"] == period].sort_values("ts")
        return sub

    for period, fkey, rkey, sdkey, wkey in (
            ("DAYTIME", "day", "rmed_day", "sd_day", "win_day"),
            ("NIGHTTIME", "night", "rmed_night", "sd_night", "win_night")):
        sub = side(period)
        want_f = np.array([np.nan if v is None else v for v in ref[fkey]])
        want_r = np.array([np.nan if v is None else v for v in ref[rkey]])
        # the reference frame is full-length with NaN off-period; restrict
        # to this period's timestamps via the finite positions of the
        # engine's rows
        pos = pdf["ts"].isin(sub["ts"]).to_numpy()
        assert np.allclose(sub["FLUX_FILTERED"].to_numpy(), want_f[pos],
                           equal_nan=True)
        assert np.allclose(sub["ROLLING_MEDIAN"].to_numpy(), want_r[pos],
                           equal_nan=True)
        assert abs(sub["SD"].iloc[0] - ref[sdkey]) < 1e-9
        assert int(sub["WINSIZE"].iloc[0]) == ref[wkey]


def test_encoded_value_matches_executed_reference(spark):
    """functions/binary.encoded_value (JVM arithmetic) == the reference's
    string-slicing get_encoded_value_series, incl. null passthrough."""
    from pyspark.sql import functions as F

    from diive_spark.functions import binary

    ints = [18, 250, 0, 255, 129, None, 77]
    ref = run_reference(f"""
import numpy as np
from diive.io.binary.extract import get_encoded_value_series
s = pd.Series([np.nan if v is None else float(v) for v in {ints!r}])
out1 = get_encoded_value_series(s.copy(), 4, 8, gain=6.25, n_bits=8)
out2 = get_encoded_value_series(s.copy(), 0, 3, gain=1, n_bits=8)
def ser(x):
    return [None if not np.isfinite(v) else float(v) for v in x]
print(json.dumps({{"a": ser(out1), "b": ser(out2)}}))
""")
    pdf = pd.DataFrame({"i": pd.array(ints, dtype="Int64"),
                        "rn": range(len(ints))})
    out = spark.createDataFrame(pdf).select(
        "rn",
        binary.encoded_value("i", 4, 8, gain=6.25).alias("a"),
        binary.encoded_value("i", 0, 3).alias("b"),
    ).toPandas().sort_values("rn")
    for col in ("a", "b"):
        want = [np.nan if v is None else v for v in ref[col]]
        assert np.allclose(out[col].astype(float), want, equal_nan=True)


def test_apply_time_lag_shifts_scalars_per_key(spark):
    from diive_spark.operators import windlag
    n = 50
    pdf = pd.concat([
        pd.DataFrame({"seg": "A", "rec": range(n),
                      "w": np.arange(n, dtype=float),
                      "c": 100.0 + np.arange(n)}),
        pd.DataFrame({"seg": "B", "rec": range(n),
                      "w": np.arange(n, dtype=float),
                      "c": 200.0 + np.arange(n)}),
    ])
    lags = pd.DataFrame({"seg": ["A", "B"], "lag_records": [3, 0]})
    out = windlag.apply_time_lag(
        spark.createDataFrame(pdf), ["seg"], "rec", ["c"],
        spark.createDataFrame(lags),
    ).toPandas().sort_values(["seg", "rec"]).reset_index(drop=True)
    a = out[out["seg"] == "A"]
    # row n takes the scalar from row n + 3 (scalar shifted backward)
    assert np.allclose(a["c_LAGGED"].to_numpy()[:-3], 100.0 + np.arange(3, n))
    assert a["c_LAGGED"].isna().tail(3).all()
    # wind column untouched
    assert np.allclose(a["w"], np.arange(n))
    b = out[out["seg"] == "B"]
    assert np.allclose(b["c_LAGGED"], b["c"])


def test_steadiness_flag_and_combine_variables_match_reference(spark):
    from diive_spark.functions import eddypro
    from diive_spark.operators import frames

    codes = [800000000, 810000000, None, 890000000, 819999999]
    vals1 = [1.0, None, 3.0, 4.0, None]
    vals2 = [10.0, 20.0, None, 40.0, None]
    ref = run_reference(f"""
import numpy as np
from diive.flux.lowres.quality_flags import FluxQualityFlagsEddyPro
from diive.preprocessing.qaqc import flag_steadiness_horizontal_wind_eddypro_test
from diive.variables.utilities import combine_variables
idx = pd.date_range("2024-01-01", periods=5, freq="30min")
df = pd.DataFrame({{"VM97_NSHW_HF":
    [np.nan if v is None else float(v) for v in {codes!r}]}}, index=idx)
fl = flag_steadiness_horizontal_wind_eddypro_test(df=df, flux="FC")
s1 = pd.Series([np.nan if v is None else v for v in {vals1!r}], index=idx,
               name="A")
s2 = pd.Series([np.nan if v is None else v for v in {vals2!r}], index=idx,
               name="B")
def ser(x):
    return [None if not np.isfinite(v) else float(v)
            for v in np.asarray(x, float)]
print(json.dumps({{
    "flag": ser(fl),
    "mult_overlap": ser(combine_variables(s1, s2, "multiply", True)),
    "add_union": ser(combine_variables(s1, s2, "add", False)),
    "fillgaps": ser(combine_variables(s1, s2, "fillgaps")),
}}))
""")
    pdf = pd.DataFrame({
        "rn": range(5),
        "VM97_NSHW_HF": pd.array(codes, dtype="Int64"),
        "A": [np.nan if v is None else v for v in vals1],
        "B": [np.nan if v is None else v for v in vals2]})
    sdf = eddypro.flag_steadiness_horizontal_wind(
        spark.createDataFrame(pdf), "FC")
    sdf = frames.combine_variables(sdf, "A", "B", "multiply", True,
                                   out_col="res_m")
    sdf = frames.combine_variables(sdf, "A", "B", "add", False,
                                   out_col="res_a")
    sdf = frames.combine_variables(sdf, "A", "B", "fillgaps", out_col="res_f")
    got = sdf.toPandas().sort_values("rn")

    def w(key):
        return [np.nan if v is None else v for v in ref[key]]

    assert np.allclose(got["FLAG_L2_FC_VM97_NSHW_HF_TEST"].astype(float),
                       w("flag"), equal_nan=True)
    assert np.allclose(got["res_m"].astype(float), w("mult_overlap"),
                       equal_nan=True)
    assert np.allclose(got["res_a"].astype(float), w("add_union"),
                       equal_nan=True)
    assert np.allclose(got["res_f"].astype(float), w("fillgaps"),
                       equal_nan=True)


def test_files_overview_matches_executed_reference(spark, tmp_path):
    """sources/discovery.files_overview == the reference's FileDetector
    EXECUTED on the same (real) files — expected grid, availability,
    unexpected files, expected end/duration/records, file limit."""
    from diive_spark.sources import discovery

    names = ["202406010000.csv", "202406010600.csv",  # regular 6h grid
             "202406011800.csv",                       # 12:00 missing
             "202406011causedrop",                     # (not created)
             "202406020300.csv"]                       # unexpected start
    names = [n for n in names if n.endswith(".csv")]
    paths = []
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_text("x" * (10 + i))
        paths.append(str(p))
    ref = run_reference(f"""
from pathlib import Path
from diive.core.io.filedetector import FileDetector
fd = FileDetector(filelist=[Path(p) for p in {paths!r}],
                  file_date_format="%Y%m%d%H%M.csv",
                  file_generation_res="6h", data_res=0.05,
                  files_how_many=None)
fd.run()
res = fd.get_results()
def ser(x):
    import numpy as np
    return [None if (v is None or (isinstance(v, float) and not np.isfinite(v))) else float(v)
            for v in x]
print(json.dumps({{
    "idx": [str(v) for v in res.index],
    "avail": ser(res["file_available"]),
    "size": ser(res["filesize"]),
    "dur": ser(res["expected_duration"]),
    "recs": ser(res["expected_records"]),
    "names": [None if not isinstance(v, str) else v for v in res["filename"]],
}}))
""")
    out = discovery.files_overview(
        spark, paths, "%Y%m%d%H%M.csv", "6h", 0.05
    ).toPandas().sort_values("expected_start").reset_index(drop=True)
    assert [str(v) for v in out["expected_start"]] == ref["idx"]
    assert list(out["file_available"]) == ref["avail"]
    for col, key in (("filesize", "size"), ("expected_duration", "dur"),
                     ("expected_records", "recs")):
        want = [np.nan if v is None else v for v in ref[key]]
        assert np.allclose(out[col].astype(float), want, equal_nan=True), col
    assert [v if isinstance(v, str) else None
            for v in out["filename"]] == ref["names"]
    # the file limit trims to the first N available
    lim = discovery.files_overview(
        spark, paths, "%Y%m%d%H%M.csv", "6h", 0.05, files_how_many=2
    ).toPandas()
    assert lim["file_available"].sum() == 2


def test_wind_direction_agg_matches_executed_reference(spark):
    """functions/thermo.wind_direction_agg == the reference's Kanda
    circular aggregation, all four modes, incl. the 0/360 wrap."""
    from diive_spark.functions.thermo import wind_direction_agg
    rng = np.random.default_rng(11)
    angles = np.concatenate([
        (350 + rng.uniform(0, 20, 40)) % 360,  # wraps the north
        rng.uniform(80, 120, 20)])
    angles = np.round(angles, 3)
    ref = run_reference(f"""
import numpy as np
from diive.core.funcs.funcs import winddirection_agg_kanda
s = pd.Series(np.array({[float(v) for v in angles]!r}))
print(json.dumps({{a: float(winddirection_agg_kanda(s, a))
                  for a in ("mean", "median", "P25", "P75")}}))
""")
    from pyspark.sql import functions as F
    sdf = spark.createDataFrame(pd.DataFrame({"wd": angles}))
    got = sdf.agg(*[
        wind_direction_agg(F.col("wd"), a).alias(a)
        for a in ("mean", "median", "P25", "P75")]).collect()[0]
    for a in ("mean", "median", "P25", "P75"):
        assert abs(got[a] - ref[a]) < 1e-9, a
    # wrap sanity: 350 and 10 average to 0, not 180
    two = spark.createDataFrame(pd.DataFrame({"wd": [350.0, 10.0]}))
    v = two.agg(wind_direction_agg(F.col("wd")).alias("m")).collect()[0]["m"]
    assert min(v, 360 - v) < 1e-9


def test_measurement_registry_matches_executed_reference():
    """classification.detect_measurement / corrections_for_measurement ==
    the reference qaqc/measurements.py registry EXECUTED (prefix routing
    and per-measurement correction dispatch)."""
    from diive_spark.functions import classification as cl
    names = ["SW_IN_T1_2_1", "SWC_GF1_0.05_1", "RH_T1_2_1", "Tair_F",
             "PPFD_IN", "WD_2_1", "G_PLATE_1", "FC", "VPD_F", "PREC_TOT",
             "LW_OUT", "TS_0.1", "PA", "WS_MAX"]
    ref = run_reference(f"""
from diive.preprocessing.qaqc.measurements import (
    detect_measurement, corrections_for_measurement, MEASUREMENTS)
codes = [detect_measurement(n) for n in {names!r}]
print(json.dumps({{
    "codes": codes,
    "corrs": {{str(c): corrections_for_measurement(c)
               for c in [m.code for m in MEASUREMENTS]}},
    "all_codes": [m.code for m in MEASUREMENTS],
}}))
""")
    assert [cl.detect_measurement(n) for n in names] == ref["codes"]
    assert list(cl.MEASUREMENTS) == ref["all_codes"]
    for code in ref["all_codes"]:
        assert cl.corrections_for_measurement(code) == ref["corrs"][code], \
            code
    assert cl.corrections_for_measurement(None) == \
        list(cl._GENERIC_KEYS)


def test_files_overview_unsorted_filelist(spark, tmp_path):
    """ADVICE r5: grid bounds come from min/max of the parsed starts, so an
    unsorted filelist yields the same inventory as the sorted one."""
    from diive_spark.sources import discovery

    names = ["202406010000.csv", "202406010600.csv", "202406011800.csv"]
    paths = []
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_text("x" * (10 + i))
        paths.append(str(p))
    sorted_out = discovery.files_overview(
        spark, paths, "%Y%m%d%H%M.csv", "6h", 0.05
    ).toPandas().sort_values("expected_start").reset_index(drop=True)
    shuffled = [paths[2], paths[0], paths[1]]
    shuf_out = discovery.files_overview(
        spark, shuffled, "%Y%m%d%H%M.csv", "6h", 0.05
    ).toPandas().sort_values("expected_start").reset_index(drop=True)
    # 00,06,12(missing),18 + the trailing expected-end row
    assert len(shuf_out) == len(sorted_out) == 5
    assert list(shuf_out["file_available"]) == list(sorted_out["file_available"])
    assert list(shuf_out["expected_start"]) == list(sorted_out["expected_start"])


def test_hqflux_auto_length_bucketing_bounded(spark):
    """ADVICE r5: many keys with varying sizes must not grow the plan —
    auto window lengths quantize onto ≤ max_distinct_lengths values and
    routing is a broadcast join (no per-key literals)."""
    import pandas as pd
    from diive_spark.operators.hqflux import analyze_highest_quality_flux

    rng = np.random.default_rng(7)
    frames = []
    for i, n_days in enumerate([10, 20, 35, 50, 70, 90, 120, 150, 180, 210,
                                240, 270]):
        ts = pd.date_range("2024-01-01", periods=n_days * 48, freq="30min")
        frames.append(pd.DataFrame({
            "site": f"s{i:02d}", "ts": ts,
            "flux": rng.normal(0, 1, len(ts))}))
    sdf = spark.createDataFrame(pd.concat(frames))
    hqdf, summary = analyze_highest_quality_flux(
        sdf, ["site"], "ts", "flux", lat=47.0, lon=8.0, utc_offset=1,
        max_distinct_lengths=4)
    s = summary.toPandas()
    assert len(s) == 12
    assert s["window_length"].nunique() <= 4
    # quantization rounds UP: every bucketed length >= the exact rule
    exact = {f"s{i:02d}": max(int(n * 48 / 100), 13)
             for i, n in enumerate([10, 20, 35, 50, 70, 90, 120, 150, 180,
                                    210, 240, 270])}
    for _, row in s.iterrows():
        assert row["window_length"] >= exact[row["site"]]
    assert hqdf.count() == sum(n * 48 for n in [10, 20, 35, 50, 70, 90, 120,
                                                150, 180, 210, 240, 270])


def test_hqflux_single_distinct_length_routes_to_max(spark):
    """ADVICE r6: max_distinct_lengths=1 previously divided by zero when
    keys had >1 distinct auto length; now every key routes to the max
    auto length (wider window — the conservative direction)."""
    import pandas as pd
    from diive_spark.operators.hqflux import analyze_highest_quality_flux

    rng = np.random.default_rng(3)
    frames = []
    for i, n_days in enumerate([10, 30, 60]):
        ts = pd.date_range("2024-01-01", periods=n_days * 48, freq="30min")
        frames.append(pd.DataFrame({
            "site": f"s{i}", "ts": ts,
            "flux": rng.normal(0, 1, len(ts))}))
    sdf = spark.createDataFrame(pd.concat(frames))
    hqdf, summary = analyze_highest_quality_flux(
        sdf, ["site"], "ts", "flux", lat=47.0, lon=8.0, utc_offset=1,
        max_distinct_lengths=1)
    s = summary.toPandas()
    assert len(s) == 3
    # exact rule maxes at 60*48/100 = 28; all keys routed there
    assert set(s["window_length"]) == {28}
    assert hqdf.count() == (10 + 30 + 60) * 48
    import pytest as _pt
    with _pt.raises(ValueError, match="max_distinct_lengths"):
        analyze_highest_quality_flux(
            sdf, ["site"], "ts", "flux", lat=47.0, lon=8.0, utc_offset=1,
            max_distinct_lengths=0)
