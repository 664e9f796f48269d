"""Self-heating correction (operators/selfheating.py) vs the reference
flux/lowres/selfheating.py: reference-EXECUTION parity for the ScopPhysics
numeric path (all three methods), exact-optimum verification for the
convex L1 cost the reference solves with scipy, and the planted-factor
end-to-end chain."""

import numpy as np
import pandas as pd
import pytest

from diive_spark.operators import selfheating
from tests.reference_harness import run_reference

LAT, LON, UTC = 46.58, 11.43, 1


def _sensor_frame(n=960, seed=8):
    rng = np.random.default_rng(seed)
    idx = pd.date_range("2023-06-01 00:15", periods=n, freq="30min")
    hours = idx.hour + idx.minute / 60.0
    ta = 12 + 8 * np.sin((hours - 9) / 24 * 2 * np.pi) \
        + rng.normal(0, 0.5, n)
    u = np.abs(rng.normal(2.0, 0.8, n)) + 0.1
    ustar = np.abs(rng.normal(0.3, 0.1, n)) + 0.02
    pdf = pd.DataFrame({
        "ts": idx, "TA": ta, "U": u, "USTAR": ustar,
        "GAS_DENSITY": 16000 + rng.normal(0, 200, n),
        "RHO_A": 1.2 + rng.normal(0, 0.01, n),
        "RHO_V": 0.008 + rng.normal(0, 0.0005, n),
        "CP": 1005.0 + rng.normal(0, 1.0, n),
    })
    pdf.loc[17, "TA"] = np.nan
    pdf.loc[33, "USTAR"] = 0.0  # ra undefined
    return pdf


@pytest.mark.parametrize("method", ["JAR09", "BUR06", "BUR08"])
def test_scop_physics_matches_executed_reference(spark, method, tmp_path):
    pdf = _sensor_frame()
    payload = tmp_path / "frame.json"
    payload.write_text(pdf.to_json())
    ref = run_reference(f"""
pdf = pd.read_json({str(payload)!r})
pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ms")
pdf = pdf.set_index("ts")
from diive.flux.lowres.selfheating import ScopPhysics
sp = ScopPhysics(flux_type="CO2", ta=pdf["TA"], gas_density=pdf["GAS_DENSITY"],
                 rho_a=pdf["RHO_A"], rho_v=pdf["RHO_V"], u=pdf["U"],
                 c_p=pdf["CP"], ustar=pdf["USTAR"], lat={LAT}, lon={LON},
                 utc_offset={UTC}, remove_outliers_method="fast")
sp.run(correction_method_base={method!r}, gapfill=False)
def ser(s):
    return [None if not np.isfinite(v) else float(v) for v in np.asarray(s, float)]
out = {{"fct": ser(sp.fct_unsc), "ra": ser(sp.ra),
        "day": [int(v) for v in sp.daytime]}}
out["ts_surf"] = ser(sp.ts) if {method!r} != "BUR08" else ser(sp.S)
print(json.dumps(out))
""")
    out = selfheating.scop_physics(
        spark.createDataFrame(pdf), [], "ts",
        ta_col="TA", gas_density_col="GAS_DENSITY", rho_a_col="RHO_A",
        rho_v_col="RHO_V", u_col="U", ustar_col="USTAR", cp_col="CP",
        method=method, lat=LAT, lon=LON, utc_offset=UTC,
    ).toPandas().sort_values("ts").reset_index(drop=True)
    assert list(out["DAYTIME"]) == ref["day"]

    def cmp(got, want, rtol=1e-9):
        w = np.array([np.nan if v is None else v for v in want])
        g = got.to_numpy(dtype=float)
        assert np.isnan(g).sum() == np.isnan(w).sum()
        m = np.isfinite(w)
        assert np.array_equal(np.isfinite(g), m)
        assert np.allclose(g[m], w[m], rtol=rtol)

    cmp(out["RA"], ref["ra"])
    cmp(out["FCT_UNSC"], ref["fct"])
    cmp(out["S"] if method == "BUR08" else out["T_SURF"], ref["ts_surf"])


def test_exact_l1_factor_is_global_optimum():
    rng = np.random.default_rng(12)
    for _ in range(5):
        n = 200
        fct = np.abs(rng.normal(1, 0.3, n))
        ref = rng.normal(0, 2, n).cumsum() * 0.01
        target = ref - rng.uniform(0.5, 8) * fct + rng.normal(0, 0.2, n)
        f, cost = selfheating.exact_l1_factor(target, ref, fct)
        grid = np.linspace(0, 50, 50001)
        a = np.cumsum(target - ref)
        b = np.cumsum(fct)
        gcost = np.abs(a[None, :] + grid[:, None] * b[None, :]).sum(axis=1)
        assert cost <= gcost.min() + 1e-9


def test_exact_l1_factor_recovers_planted_factor():
    rng = np.random.default_rng(3)
    fct = np.abs(rng.normal(1, 0.3, 300))
    ref = rng.normal(5, 1, 300)
    target = ref - 3.0 * fct  # corrected with xi=3 reproduces ref exactly
    f, cost = selfheating.exact_l1_factor(target, ref, fct)
    assert abs(f - 3.0) < 1e-12
    assert cost < 1e-9


def test_scop_chain_end_to_end(spark):
    rng = np.random.default_rng(21)
    n = 2000
    idx = pd.date_range("2023-06-01 00:15", periods=n, freq="30min")
    fct = np.abs(rng.normal(1.0, 0.2, n))
    ustar = np.abs(rng.normal(0.3, 0.12, n)) + 0.01
    day = (idx.hour >= 6) & (idx.hour < 18)
    ref_flux = rng.normal(-5, 3, n)
    openpath = ref_flux - 2.5 * fct + rng.normal(0, 0.05, n)
    pdf = pd.DataFrame({
        "ts": idx, "site": "A", "FCT_UNSC": fct, "USTAR": ustar,
        "DAYTIME": day.astype(int), "OP": openpath, "CP_REF": ref_flux})
    # a few rows lose the class variable -> MDV fallback must fill SF
    pdf.loc[100:104, "USTAR"] = np.nan
    sdf = spark.createDataFrame(pdf)
    sf = selfheating.scop_optimizer(
        sdf, ["site"], "ts", target_col="OP", reference_col="CP_REF",
        fct_col="FCT_UNSC", class_col="USTAR", daytime_col="DAYTIME",
        n_classes=4).toPandas()
    assert len(sf) == 8  # 2 daytime states x 4 bins
    assert np.allclose(sf["SF_MEDIAN"], 2.5, atol=0.2)
    out = selfheating.scop_applicator(
        sdf, ["site"], "ts", flux_col="OP", fct_col="FCT_UNSC",
        class_col="USTAR", daytime_col="DAYTIME",
        sf_df=spark.createDataFrame(sf)).toPandas() \
        .sort_values("ts").reset_index(drop=True)
    assert len(out) == n
    assert out["SF"].notna().all()  # MDV fallback covered the NaN-class rows
    good = out["OP_CORRECTED"] - out["CP_REF"]
    assert abs(good.mean()) < 0.2
    assert good.abs().median() < 0.5


def test_scop_optimizer_bootstrap_deterministic(spark):
    rng = np.random.default_rng(5)
    n = 400
    idx = pd.date_range("2023-06-01 00:15", periods=n, freq="30min")
    fct = np.abs(rng.normal(1.0, 0.2, n))
    pdf = pd.DataFrame({
        "ts": idx, "site": "A", "FCT_UNSC": fct,
        "USTAR": np.abs(rng.normal(0.3, 0.1, n)) + 0.01,
        "DAYTIME": 1, "CP_REF": rng.normal(-5, 3, n)})
    pdf["OP"] = pdf["CP_REF"] - 1.8 * pdf["FCT_UNSC"]
    sdf = spark.createDataFrame(pdf)
    runs = [selfheating.scop_optimizer(
        sdf, ["site"], "ts", target_col="OP", reference_col="CP_REF",
        fct_col="FCT_UNSC", class_col="USTAR", daytime_col="DAYTIME",
        n_classes=2, n_bootstrap=8).toPandas()
        .sort_values("GROUP_CLASSVAR").reset_index(drop=True)
        for _ in range(2)]
    pd.testing.assert_frame_equal(runs[0], runs[1])
    assert np.allclose(runs[0]["SF_MEDIAN"], 1.8, atol=0.1)
    assert (runs[0]["SF_Q25"] <= runs[0]["SF_MEDIAN"]).all()
