"""EddyPro FluxNet-output quality flags — Level-2 test extractors.

Column-expression ports of the reference's EddyPro flag extractors
(/root/reference/diive/preprocessing/qaqc/eddyproflags.py): each function
appends one ``FLAG_L2_..._TEST`` column in the DIIVE convention (0 good,
1 soft, 2 hard, NULL not-assessable) from the corresponding EddyPro output
variable. Combined with ``outliers.flag_qcf`` these reproduce the
reference flux chain's Level-2 — verified against the reference's OWN
golden count on its bundled EddyPro file (tests/test_fluxchain.py).

Every extractor is a pure JVM expression — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: EddyPro VM97 multi-digit code positions (eddyproflags.py:239-249).
#: 9-digit integer, leading digit always 8; position -> (suffix, hard).
VM97_POSITIONS = {
    1: ("VM97_SPIKE_HF", True),
    2: ("VM97_AMPLITUDE_RESOLUTION_HF", True),
    3: ("VM97_DROPOUT", True),
    4: ("VM97_ABSOLUTE_LIMITS_HF", True),
    5: ("VM97_SKEWKURT_HF", True),
    6: ("VM97_SKEWKURT_SF", False),
    7: ("VM97_DISCONTINUITIES_HF", True),
    8: ("VM97_DISCONTINUITIES_SF", False),
}

#: the reference's fill code for a missing VM97 value (all digits 9)
_VM97_MISSING = 899999999.0


def _digit(col, position: int, n_digits: int = 9):
    """Digit at ``position`` (0-based from the left) of an ``n_digits``-long
    integer code, extracted numerically (robust against Spark's scientific
    double-to-string casts)."""
    return (F.floor(col / F.pow(F.lit(10.0), F.lit(n_digits - 1 - position)))
            % 10).cast("int")


def _diive_flag(digit, hard: bool):
    """EddyPro digit -> DIIVE flag: 9 (missing) -> NULL; hard 1 -> 2."""
    f = F.when(digit == 9, None).otherwise(digit)
    return F.when(f == 1, 2 if hard else 1).otherwise(f).cast("int")


def flag_ssitc(df: DataFrame, flux: str, flagcol: str | None = None) -> DataFrame:
    """SSITC (Mauder & Foken 2004) flag, taken from EddyPro's
    ``{flux}_SSITC_TEST`` as-is (eddyproflags.py:455)."""
    src = flagcol or f"{flux}_SSITC_TEST"
    return df.withColumn(f"FLAG_L2_{flux}_SSITC_TEST",
                         F.col(src).cast("int"))


def flag_gas_completeness(
    df: DataFrame, flux: str, basevar: str,
    thres_good: float = 0.99, thres_ok: float = 0.97,
    expect_nr_col: str | None = None, basevar_nr_col: str | None = None,
) -> DataFrame:
    """Base-variable completeness (Sabbatini 2018; eddyproflags.py:341):
    share of expected raw records present, >=0.99 good / >=0.97 ok / bad."""
    pct = (F.col(basevar_nr_col or f"{basevar}_NR")
           / F.col(expect_nr_col or "EXPECT_NR"))
    flag = (
        F.when(pct >= thres_good, 0)
        .when(pct >= thres_ok, 1)
        .when(pct < thres_ok, 2)
    )
    return df.withColumn(f"FLAG_L2_{flux}_COMPLETENESS_TEST",
                         flag.cast("int"))


def flag_spectral_correction(
    df: DataFrame, flux: str, thres_good: float = 2.0, thres_ok: float = 4.0,
    scfcol: str | None = None,
) -> DataFrame:
    """Spectral correction factor magnitude (eddyproflags.py:409):
    < 2 good / < 4 ok / >= 4 bad."""
    scf = F.col(scfcol or f"{flux}_SCF")
    flag = (
        F.when(scf < thres_good, 0)
        .when(scf < thres_ok, 1)
        .when(scf >= thres_ok, 2)
    )
    return df.withColumn(f"FLAG_L2_{flux}_SCF_TEST", flag.cast("int"))


def flag_signal_strength(
    df: DataFrame, flux: str, signal_strength_col: str,
    method: str, threshold: float,
) -> DataFrame:
    """Gas-analyzer signal strength / AGC threshold (eddyproflags.py:59):
    'discard below' or 'discard above' ``threshold``."""
    ss = F.col(signal_strength_col)
    if method == "discard below":
        flag = F.when(ss >= threshold, 0).when(ss < threshold, 2)
    elif method == "discard above":
        flag = F.when(ss <= threshold, 0).when(ss > threshold, 2)
    else:
        raise ValueError(f"unknown method {method!r}")
    return df.withColumn(f"FLAG_L2_{flux}_SIGNAL_STRENGTH_TEST",
                         flag.cast("int"))


def flag_vm97(
    df: DataFrame, flux: str, basevar: str,
    spikes: bool = True, amplitude: bool = False, dropout: bool = True,
    abslim: bool = False, skewkurt_hf: bool = False, skewkurt_sf: bool = False,
    discont_hf: bool = False, discont_sf: bool = False,
    vm97col: str | None = None,
) -> DataFrame:
    """VM97 (Vickers & Mahrt 1997) raw-data screening flags, unpacked from
    EddyPro's 9-digit ``{basevar}_VM97_TEST`` code (eddyproflags.py:213):
    one flag column per selected digit; missing code -> all digits 9 ->
    NULL flags; hard digits 1 -> 2, soft keep 1."""
    code = F.coalesce(F.col(vm97col or f"{basevar}_VM97_TEST").cast("double"),
                      F.lit(_VM97_MISSING))
    selected = {1: spikes, 2: amplitude, 3: dropout, 4: abslim,
                5: skewkurt_hf, 6: skewkurt_sf, 7: discont_hf, 8: discont_sf}
    out = df
    for pos, (suffix, hard) in VM97_POSITIONS.items():
        if not selected[pos]:
            continue
        name = f"FLAG_L2_{flux}_{basevar}_{suffix}_TEST"
        out = out.withColumn(name, _diive_flag(_digit(code, pos), hard))
    return out


def flag_steadiness_horizontal_wind(
    df: DataFrame, flux: str, nshwcol: str | None = None,
) -> DataFrame:
    """Steadiness-of-horizontal-wind flag (VM97 par. 6g), digit 1 of
    EddyPro's ``VM97_NSHW_HF`` 9-digit code, hard (eddyproflags.py:115):
    systematic along/crosswind drift over the averaging period."""
    code = F.coalesce(F.col(nshwcol or "VM97_NSHW_HF").cast("double"),
                      F.lit(_VM97_MISSING))
    return df.withColumn(f"FLAG_L2_{flux}_VM97_NSHW_HF_TEST",
                         _diive_flag(_digit(code, 1), hard=True))


def flag_angle_of_attack(
    df: DataFrame, ts_col: str, flux: str,
    application_dates: list | None = None, aoacol: str | None = None,
) -> DataFrame:
    """Angle-of-attack test from EddyPro's 2-digit ``VM97_AOA_HF`` code
    (eddyproflags.py:159): second digit, hard flag; with
    ``application_dates`` ([['from','to'], ...]) the flag applies only
    inside those windows and is NULL elsewhere."""
    code = F.coalesce(F.col(aoacol or "VM97_AOA_HF").cast("double"),
                      F.lit(89.0))
    flag = _diive_flag(_digit(code, 1, n_digits=2), hard=True)
    if application_dates:
        in_window = F.lit(False)
        for frm, to in application_dates:
            in_window = in_window | F.col(ts_col).between(
                F.lit(frm).cast("timestamp_ntz"),
                F.lit(to).cast("timestamp_ntz"))
        flag = F.when(in_window, flag)
    return df.withColumn(f"FLAG_L2_{flux}_VM97_AOA_HF_TEST", flag)
