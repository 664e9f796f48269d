"""Generate reference-executed golden oracles for the non-SQL-expressible
gate variants (PWB lag detection, ONEFlux nighttime partitioning).

For each fixture: execute the REFERENCE implementation (via
tests/reference_harness.py, with the engine's optimizer injected where
the parity protocol requires a shared optimizer), execute the engine
kernel, assert 1e-9 parity, then emit the ENGINE's driver-rounded rows
as DuckDB VALUES literals into diive_spark/queries/_goldens.py.

The embedded goldens therefore certify engine == executed-reference: the
pytest in tests/test_partition_hires_gates.py re-runs the same parity
assertion so the literals can never silently drift from the reference.
"""

import json
import pathlib
import sys
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

from tests.reference_harness import run_reference  # noqa: E402

from diive_spark.operators import oneflux_nt, pwb  # noqa: E402
from diive_spark.queries import hires  # noqa: E402
from diive_spark.queries import partition as partition_gates  # noqa: E402


def _lit(v):
    if v is None:
        return "CAST(NULL AS DOUBLE)"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, str):
        return f"'{v}'"
    if isinstance(v, float):
        if not np.isfinite(v):
            return "CAST(NULL AS DOUBLE)"
        return repr(v)
    return str(v)


def _r6(v):
    """The catalog's rounding: round(1e-9 + x, 6), NaN -> NULL."""
    if v is None or not np.isfinite(v):
        return None
    return float(np.round(1e-9 + v, 6))


def pwb_reference(key, w, s, t, n_bootstrap, hz):
    import pandas as pd
    seed = zlib.crc32(key.encode())
    pdf = pd.DataFrame({"W": w, "S": s, "T": t})
    payload = pathlib.Path(f"/tmp/pwb_golden_{key}.json")
    payload.write_text(pdf.to_json())
    return run_reference(f"""
import numpy as np
import scipy, scipy.signal, scipy.stats
scipy.__version__ = "1.11.0"
def _corr(a, v, mode='full', method='auto'):
    return np.correlate(np.asarray(a, float), np.asarray(v, float), mode)
scipy.signal.correlate = _corr
sys.path.insert(0, "/root/repo")
from diive_spark.operators.pwb import linear_detrend
def _detrend(x, type='linear', axis=-1):
    return linear_detrend(x) if type == 'linear' else x - np.mean(x)
scipy.signal.detrend = _detrend
def _lfilter(b, a, x):
    return np.convolve(np.asarray(x, float), np.asarray(b, float))[:len(x)]
scipy.signal.lfilter = _lfilter
class _KDE:
    def __init__(self, z, bw_method=None):
        self.z = np.asarray(z, float)
        self.bw = self.z.std(ddof=1) * len(self.z) ** (-1.0 / 5.0)
    def __call__(self, grid):
        g = np.atleast_1d(np.asarray(grid, float))
        return np.exp(-0.5 * ((g[:, None] - self.z[None, :])
                              / self.bw) ** 2).sum(axis=1)
scipy.stats.gaussian_kde = _KDE
import diive.flux.hires.lag_pwb as lp
lp._signal_correlate = _corr
lp._detrend = _detrend
lp.lfilter = _lfilter
lp.gaussian_kde = _KDE
pdf = pd.read_json({str(payload)!r})
det = lp.PreWhiteningBootstrap(
    df=pdf, var_w="W", var_scalar="S", var_tsonic="T", hz={hz},
    lag_max_s=10.0, n_bootstrap={n_bootstrap}, random_state={seed})
det.run()
print(json.dumps({{
    "tlag_pw_s": det.tlag_pw_s, "corr_pw": det.corr_pw,
    "tlag_records": int(det._tlag_records),
    "tlag_s": None if not np.isfinite(det.tlag_s) else det.tlag_s,
    "hdi_lo_s": None if not np.isfinite(det.hdi_lo_s) else det.hdi_lo_s,
    "hdi_hi_s": None if not np.isfinite(det.hdi_hi_s) else det.hdi_hi_s,
    "best": det._best_combination,
    "ar_orders": det._ar_orders,
    "cov_pwb": det.cov_pwb,
    "is_reliable": bool(det.is_reliable),
}}))
""", timeout=900)


def gen_pwb():
    rows = []
    for key, (w, s, t) in hires.pwb_fixture_arrays().items():
        seed = zlib.crc32(key.encode())
        got = pwb.pwb_detect(w, s, t, hz=hires.PWB_HZ,
                             n_bootstrap=hires.PWB_NBOOT, seed=seed)
        ref = pwb_reference(key, w, s, t, hires.PWB_NBOOT, hires.PWB_HZ)
        assert got["tlag_pw_s"] == ref["tlag_pw_s"], key
        assert abs(got["corr_pw"] - ref["corr_pw"]) < 1e-9, key
        assert got["tlag_records"] == ref["tlag_records"], key
        assert got["combination"] == ref["best"], key
        assert got["tlag_s"] == ref["tlag_s"] or (
            np.isnan(got["tlag_s"]) and ref["tlag_s"] is None), key
        assert got["ar_order_scalar"] == ref["ar_orders"]["scalar"], key
        assert got["is_reliable"] == ref["is_reliable"], key
        assert abs(got["cov_pwb"] - ref["cov_pwb"]) < 1e-9, key
        rows.append((
            key, _r6(got["tlag_s"]), got["tlag_records"],
            _r6(got["hdi_lo_s"]), _r6(got["hdi_hi_s"]),
            int(got["is_reliable"]), got["combination"],
            _r6(got["tlag_pw_s"]), _r6(got["corr_pw"]),
            _r6(got["cov_pwb"]), got["ar_order_scalar"],
            got["ar_order_w"], got["ar_order_tsonic"], got["n_used"]))
        print("pwb", key, "parity OK:", rows[-1])
    body = ",\n".join("  (" + ", ".join(_lit(v) for v in r) + ")"
                      for r in rows)
    return hires.SQL_PWB_LAG_TEMPLATE.format(rows=body)


def nt_reference(pdf):
    payload = pathlib.Path("/tmp/nt_golden_year.json")
    payload.write_text(pdf.to_json())
    return run_reference(f"""
sys.path.insert(0, "/root/repo")
from diive_spark.operators.oneflux_nt import leastsq_lm
import diive.flux.partitioning.nighttime_oneflux as nt
nt.leastsq = leastsq_lm
pdf = pd.read_json({str(payload)!r})
res = nt._partition_one_year(
    nee=pdf["NEE"].to_numpy(), tair=pdf["TA"].to_numpy(),
    sw_in=pdf["SW_IN"].to_numpy(), nee_f=pdf["NEE_F"].to_numpy(),
    tair_f=pdf["TA_F"].to_numpy(), doy=pdf["doy"].to_numpy(),
    hr=pdf["hr"].to_numpy(), lat={partition_gates.NT_LAT}, verbose=0)
def ser(a):
    return [None if not np.isfinite(v) else float(v) for v in a]
print(json.dumps({{k: ser(v) for k, v in res.items()}}))
""", timeout=900)


def gen_nt():
    pdf = partition_gates.nt_fixture_pdf()
    got = oneflux_nt.partition_year_arrays(
        pdf["NEE"].to_numpy(), pdf["TA"].to_numpy(),
        pdf["SW_IN"].to_numpy(), pdf["NEE_F"].to_numpy(),
        pdf["TA_F"].to_numpy(), pdf["doy"].to_numpy(),
        pdf["hr"].to_numpy(), partition_gates.NT_LAT)
    ref = nt_reference(pdf)
    for col in oneflux_nt.OUT_COLS:
        want = np.array([np.nan if v is None else v for v in ref[col]])
        g = got[col]
        assert np.array_equal(np.isnan(g), np.isnan(want)), col
        m = np.isfinite(want)
        assert np.allclose(g[m], want[m], rtol=1e-9, atol=1e-12), col
    print("nt_oneflux parity OK on all", len(oneflux_nt.OUT_COLS), "cols")
    # daily aggregation mirroring q_nt_oneflux (mean ignores NaN)
    import pandas as pd
    day = pd.DataFrame({
        "d": pdf["ts"].dt.date.astype(str),
        "reco": got["RECO_NT_OF"], "reco_rob": got["RECO_NT_OF_ROB"],
        "gpp": got["GPP_NT_OF"], "rref": got["RREF_NT_OF"],
        "e0": got["E0_NT_OF"],
    })
    agg = day.groupby("d", sort=True).agg(
        n=("reco", "count"), reco=("reco", "mean"),
        reco_rob=("reco_rob", "mean"), gpp=("gpp", "mean"),
        rref=("rref", "mean"), e0=("e0", "first"))
    rows = []
    for d, r in agg.iterrows():
        rows.append((str(d), int(r["n"]), _r6(r["reco"]),
                     _r6(r["reco_rob"]), _r6(r["gpp"]), _r6(r["rref"]),
                     _r6(r["e0"])))
    body = ",\n".join(
        "  (" + ", ".join(_lit(v) for v in r) + ")" for r in rows)
    return partition_gates.SQL_NT_ONEFLUX_TEMPLATE.format(rows=body)


def main():
    which = sys.argv[1:] or ["pwb", "nt"]
    out = pathlib.Path("/root/repo/diive_spark/queries/_goldens.py")
    existing = {}
    if out.exists():
        ns = {}
        exec(out.read_text(), ns)
        existing = {k: v for k, v in ns.items() if k.endswith("_SQL")}
    if "pwb" in which:
        existing["PWB_GOLDEN_SQL"] = gen_pwb()
    if "nt" in which:
        existing["NT_ONEFLUX_GOLDEN_SQL"] = gen_nt()
    text = ('"""REFERENCE-EXECUTED golden oracles (generated by\n'
            "scripts/gen_gate_goldens.py; parity re-asserted by\n"
            'tests/test_partition_hires_gates.py). Do not edit by hand."""\n\n')
    for k, v in existing.items():
        text += f"{k} = '''{v}'''\n\n"
    out.write_text(text)
    print("wrote", out)


if __name__ == "__main__":
    main()
