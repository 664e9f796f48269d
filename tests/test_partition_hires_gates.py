"""Round-6 gate guards: the embedded golden oracles
(diive_spark/queries/_goldens.py) can never silently drift from either
the engine or the executed reference.

- golden-vs-engine: recompute the engine kernels on the gate fixtures
  and compare against the embedded VALUES rows (fast, in-process).
- golden-vs-reference: one LIVE reference execution (PWB segB) through
  tests/reference_harness.py re-asserts the shared-RNG parity protocol
  end to end; the ONEFlux nighttime fixture's reference parity is
  asserted at generation time (scripts/gen_gate_goldens.py) and by the
  structurally-identical fixture in tests/test_oneflux_nt.py.
"""

import zlib

import duckdb
import numpy as np
import pandas as pd

from diive_spark.operators import oneflux_nt, pwb
from diive_spark.queries import hires
from diive_spark.queries import partition as pg
from diive_spark.queries._goldens import (NT_ONEFLUX_GOLDEN_SQL,
                                          PWB_GOLDEN_SQL)
from tests.reference_harness import run_reference


def _r6(v):
    if v is None or not np.isfinite(v):
        return None
    return float(np.round(1e-9 + v, 6))


def test_pwb_goldens_match_engine_kernel():
    want = duckdb.sql(PWB_GOLDEN_SQL).df().set_index("seg")
    fixtures = hires.pwb_fixture_arrays()
    assert set(want.index) == set(fixtures)
    for key, (w, s, t) in fixtures.items():
        seed = zlib.crc32(key.encode())
        got = pwb.pwb_detect(w, s, t, hz=hires.PWB_HZ,
                             n_bootstrap=hires.PWB_NBOOT, seed=seed)
        row = want.loc[key]
        assert _r6(got["tlag_s"]) == row["tlag_s"], key
        assert got["tlag_records"] == row["tlag_rec"], key
        assert _r6(got["hdi_lo_s"]) == row["hdi_lo"], key
        assert _r6(got["corr_pw"]) == row["corr_pw"], key
        assert _r6(got["cov_pwb"]) == row["cov_pwb"], key
        assert got["combination"] == row["combo"], key
        assert int(got["is_reliable"]) == row["reliable"], key
        assert (got["ar_order_scalar"], got["ar_order_w"],
                got["ar_order_tsonic"]) == (row["ar_s"], row["ar_w"],
                                            row["ar_t"]), key


def test_pwb_golden_matches_live_reference(tmp_path):
    """One live reference execution on the gate fixture (segB) — the
    same matched-RNG protocol the generator uses."""
    import scripts.gen_gate_goldens as gen

    key = "segB"
    w, s, t = hires.pwb_fixture_arrays()[key]
    ref = gen.pwb_reference(key, w, s, t, hires.PWB_NBOOT, hires.PWB_HZ)
    row = duckdb.sql(PWB_GOLDEN_SQL).df().set_index("seg").loc[key]
    assert _r6(ref["tlag_s"]) == row["tlag_s"]
    assert ref["tlag_records"] == row["tlag_rec"]
    assert ref["best"] == row["combo"]
    assert _r6(ref["corr_pw"]) == row["corr_pw"]
    assert _r6(ref["cov_pwb"]) == row["cov_pwb"]
    assert ref["ar_orders"]["scalar"] == row["ar_s"]


def test_nt_goldens_match_engine_kernel():
    pdf = pg.nt_fixture_pdf()
    got = oneflux_nt.partition_year_arrays(
        pdf["NEE"].to_numpy(), pdf["TA"].to_numpy(),
        pdf["SW_IN"].to_numpy(), pdf["NEE_F"].to_numpy(),
        pdf["TA_F"].to_numpy(), pdf["doy"].to_numpy(),
        pdf["hr"].to_numpy(), pg.NT_LAT)
    day = pd.DataFrame({
        "d": pdf["ts"].dt.date.astype(str),
        "reco": got["RECO_NT_OF"], "reco_rob": got["RECO_NT_OF_ROB"],
        "gpp": got["GPP_NT_OF"], "rref": got["RREF_NT_OF"],
        "e0": got["E0_NT_OF"]})
    agg = day.groupby("d", sort=True).agg(
        n=("reco", "count"), reco=("reco", "mean"),
        reco_rob=("reco_rob", "mean"), gpp=("gpp", "mean"),
        rref=("rref", "mean"), e0=("e0", "first"))
    want = duckdb.sql(NT_ONEFLUX_GOLDEN_SQL).df().set_index("d").sort_index()
    assert len(agg) == len(want) == pg.NT_DAYS
    for col in ("reco", "reco_rob", "gpp", "rref", "e0"):
        g = agg[col].map(_r6).to_numpy(dtype=object)
        wv = want[col].to_numpy()
        for a, b in zip(g, wv):
            if a is None:
                assert b is None or (isinstance(b, float) and np.isnan(b))
            else:
                assert a == b, (col, a, b)
    assert (agg["n"].to_numpy() == want["n"].to_numpy()).all()


def test_scop_optimizer_quantized_inputs_make_cumsums_exact():
    """The gate's dyadic quantization contract: FCT on a 2^-20 grid and
    jitter on 2^-34 make every running cumsum an exactly-representable
    double, so the weighted-median breakpoint selection is
    order-independent (the cross-engine determinism argument in
    queries/hires.py)."""
    rng = np.random.default_rng(3)
    fct = np.round(rng.uniform(1e-4, 6e-4, 800) * 2**20) / 2**20
    eps = 0.25 * (rng.integers(0, 2**32, 800) / 2**32 - 0.5)
    delta = -2.5 * fct + eps
    # exact: forward cumsum equals arbitrary-order association via Fraction
    from fractions import Fraction
    acc = Fraction(0)
    fwd = np.cumsum(delta)
    for i, v in enumerate(delta):
        acc += Fraction(v)
        assert float(acc) == fwd[i]
