"""FLUXNET / meteo exporters (sources/formats.py) vs the reference's
io/formats/fluxnet.py + meteo.py, incl. reference-EXECUTION golden
output for the meteo FLUXNET-upload layout."""

import numpy as np
import pandas as pd

from diive_spark.sources import formats
from tests.reference_harness import run_reference


def _meteo_frame(n=96):
    rng = np.random.default_rng(2)
    # MIDDLE-convention half-hourly index (:15/:45) spanning a year edge
    idx = pd.date_range("2023-12-30 00:15", periods=n, freq="30min")
    ta = np.round(rng.normal(5, 3, n), 2)
    sw = np.round(np.maximum(rng.normal(100, 80, n), 0), 2)
    ta[5] = np.nan
    sw[10] = np.nan
    return pd.DataFrame({"ts": idx, "TA": ta, "SW_IN": sw})


def test_fluxnet_upload_format_contract(spark):
    n = 48
    idx = pd.date_range("2024-01-01 00:15", periods=n, freq="30min")
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({
        "ts": idx,
        "FC": np.round(rng.normal(0, 5, n), 3),
        "FC_SSITC_TEST": np.float64(rng.integers(0, 3, n)),
        "LE": np.round(rng.normal(50, 20, n), 3),
        "USTAR": np.round(rng.uniform(0, 1, n), 3),
        "TA_1_1_1": np.round(rng.normal(5, 3, n), 2),
        "EMPTY_COL_H": np.full(n, np.nan),
        "IGNORED": rng.normal(0, 1, n),
    })
    pdf.loc[3, "FC"] = np.nan
    out = formats.fluxnet_upload_format(
        spark.createDataFrame(pdf.rename(columns={"EMPTY_COL_H": "H"})),
        "ts", 1800, convention="middle",
    ).toPandas().sort_values("TIMESTAMP_START").reset_index(drop=True)
    # contract: timestamps first, suffix added except existing _x_x_x,
    # empty H dropped, non-FLUXNET var dropped, -9999 sentinel
    assert list(out.columns) == [
        "TIMESTAMP_START", "TIMESTAMP_END", "FC_1_1_1",
        "FC_SSITC_TEST_1_1_1", "LE_1_1_1", "USTAR_1_1_1", "TA_1_1_1"]
    assert out["TIMESTAMP_START"].iloc[0] == "202401010000"
    assert out["TIMESTAMP_END"].iloc[0] == "202401010030"
    assert out["FC_1_1_1"].iloc[3] == -9999.0
    assert (out["FC_1_1_1"] != -9999.0).sum() == n - 1


def test_fluxnet_required_vars_match_reference_constants():
    ref = run_reference(r"""
import diive.io.formats.fluxnet as fx
print(json.dumps({
    "co2": fx.VARS_CO2, "h2o": fx.VARS_H2O, "h": fx.VARS_H,
    "n2o": fx.VARS_N2O, "ch4": fx.VARS_CH4, "wind": fx.VARS_WIND,
    "meteo": fx.VARS_METEO}))
""")
    assert formats.VARS_CO2 == ref["co2"]
    assert formats.VARS_H2O == ref["h2o"]
    assert formats.VARS_H == ref["h"]
    assert formats.VARS_N2O == ref["n2o"]
    assert formats.VARS_CH4 == ref["ch4"]
    assert formats.VARS_WIND == ref["wind"]
    assert formats.VARS_METEO == ref["meteo"]


def test_meteo_fluxnet_upload_matches_executed_reference(spark):
    """Engine meteo_fluxnet_upload_format == the reference's
    FormatMeteoForFluxnetUpload EXECUTED on the same frame (its
    TimestampSanitizer is a no-op on the clean middle-convention grid)."""
    pdf = _meteo_frame()
    ref = run_reference(f"""
import io
pdf = pd.read_json(io.StringIO({pdf.to_json()!r}))
pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ms")
pdf = pdf.set_index("ts")
pdf.index.name = "TIMESTAMP_MIDDLE"
from diive.io.formats.meteo import FormatMeteoForFluxnetUpload
f = FormatMeteoForFluxnetUpload(df=pdf, cols={{"TA": "TA_1_1_1",
                                               "SW_IN": "SW_IN_1_1_1"}})
f.run()
res = f.get_results().reset_index(drop=True)
print(json.dumps({{
    "columns": list(res.columns),
    "ts_start": list(res["TIMESTAMP_START"])[:5],
    "ts_end": list(res["TIMESTAMP_END"])[:5],
    "ta": [float(v) for v in res["TA_1_1_1"]],
    "sw": [float(v) for v in res["SW_IN_1_1_1"]],
}}))
""")
    out = formats.meteo_fluxnet_upload_format(
        spark.createDataFrame(pdf), "ts", 1800,
        {"TA": "TA_1_1_1", "SW_IN": "SW_IN_1_1_1"}, convention="middle",
    ).toPandas().sort_values("TIMESTAMP_START").reset_index(drop=True)
    assert list(out.columns) == ref["columns"]
    assert list(out["TIMESTAMP_START"][:5]) == [str(v) for v in
                                                ref["ts_start"]]
    assert list(out["TIMESTAMP_END"][:5]) == [str(v) for v in ref["ts_end"]]
    assert np.allclose(out["TA_1_1_1"], ref["ta"])
    assert np.allclose(out["SW_IN_1_1_1"], ref["sw"])


def test_save_yearly_csv_contract(spark, tmp_path):
    pdf = _meteo_frame(n=144)  # 3 days: spans 2023 -> 2024
    out = formats.meteo_fluxnet_upload_format(
        spark.createDataFrame(pdf), "ts", 1800,
        {"TA": "TA_1_1_1", "SW_IN": "SW_IN_1_1_1"})
    paths = formats.save_yearly_csv(out, str(tmp_path / "up"), "CH-TEST")
    names = [p.rsplit("/", 1)[1] for p in paths]
    assert names == ["CH-TEST_2023_fluxes_meteo.csv",
                     "CH-TEST_2024_fluxes_meteo.csv"]
    back = pd.concat([pd.read_csv(p, dtype={"TIMESTAMP_START": str,
                                            "TIMESTAMP_END": str})
                      for p in paths])
    assert len(back) == 144
    # yearly split on the START timestamp, rows ordered within each file
    y23 = pd.read_csv(paths[0], dtype=str)
    assert (y23["TIMESTAMP_START"].str[:4] == "2023").all()
    assert list(y23["TIMESTAMP_START"]) == sorted(y23["TIMESTAMP_START"])
    # -9999 survives the round-trip
    assert (back["TA_1_1_1"] == -9999.0).sum() == 1


def test_meteo_eddypro_two_row_header(spark, tmp_path):
    pdf = _meteo_frame(n=12)
    df, units = formats.meteo_eddypro_format(
        spark.createDataFrame(pdf), "ts",
        {"TA": ("Ta", "degC"), "SW_IN": ("Rg", "W+1m-2")})
    assert df.columns == ["TIMESTAMP_1", "TIMESTAMP_2", "Ta", "Rg"]
    assert units == ["yyyy-mm-dd", "HH:MM", "degC", "W+1m-2"]
    target = str(tmp_path / "eddypro_input.csv")
    formats.save_two_row_header_csv(df.orderBy("TIMESTAMP_1",
                                               "TIMESTAMP_2"),
                                    units, target)
    lines = open(target).read().splitlines()
    assert lines[0] == "TIMESTAMP_1,TIMESTAMP_2,Ta,Rg"
    assert lines[1] == "yyyy-mm-dd,HH:MM,degC,W+1m-2"
    assert lines[2].startswith("2023-12-30,00:15,")
    assert len(lines) == 14
    # the engine's own multi-row-header reader ingests it back
    body = pd.read_csv(target, skiprows=[1])
    assert (body["Ta"] == -9999.0).sum() == 1
