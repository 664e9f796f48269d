"""EddyPro Level-2 flag extractors vs REFERENCE-EXECUTED goldens.

The golden constants below were minted by running the reference's own flag
code (/root/reference/diive/preprocessing/qaqc/eddyproflags.py +
qcf.py FlagQCF, executed 2026-08-17 with plotting libs stubbed) over the
reference's bundled EddyPro FLUXNET files, with this exact config:
missing + SSITC + CO2 completeness + SCF + signal strength (FC_SS,
discard below 80) + VM97 spikes/dropout + angle of attack. The engine
must reproduce every flag distribution, the QCF distribution and the
filtered-series counts on the same files through its own reader.
"""

import pytest
from pyspark.sql import functions as F

from diive_spark.functions import eddypro
from diive_spark.operators import outliers
from diive_spark.sources import csv as csvsrc

EXAMPLEDATA = "/root/reference/diive/configs/exampledata"

GOLDENS = {
    "2012": {
        "file": ("exampledata_EDDYPRO-FLUXNET-CSV-30MIN_2012_eddypro_"
                 "CH-FRU_FR-20230425-220357_fluxnet_2023-04-26T201227_adv.csv"),
        "rows": 49,
        "flag_counts": {
            "FLAG_L2_FC_MISSING_TEST": {0: 49},
            "FLAG_L2_FC_SSITC_TEST": {0: 19, 1: 25, 2: 5},
            "FLAG_L2_FC_COMPLETENESS_TEST": {0: 48, 2: 1},
            "FLAG_L2_FC_SCF_TEST": {0: 49},
            "FLAG_L2_FC_SIGNAL_STRENGTH_TEST": {0: 10, 2: 39},
            "FLAG_L2_FC_CO2_VM97_SPIKE_HF_TEST": {0: 49},
            "FLAG_L2_FC_CO2_VM97_DROPOUT_TEST": {0: 49},
            "FLAG_L2_FC_VM97_AOA_HF_TEST": {0: 47, 2: 2},
        },
        "qcf_counts": {1: 5, 2: 44},
        "filtered_nonnull": 5,
        "filtered_hq_nonnull": 0,
    },
    "2023": {
        "file": ("exampledata_EDDYPRO-FLUXNET-CSV-30MIN_2023_eddypro_"
                 "CH-FRU_FR-20240228-000000_fluxnet_MERGED_adv.csv"),
        "rows": 29,
        "flag_counts": {
            "FLAG_L2_FC_MISSING_TEST": {0: 20, 2: 9},
            "FLAG_L2_FC_SSITC_TEST": {0: 7, 1: 10, 2: 3},
            "FLAG_L2_FC_COMPLETENESS_TEST": {0: 26, 1: 1, 2: 2},
            "FLAG_L2_FC_SCF_TEST": {0: 17, 1: 2, 2: 1},
            "FLAG_L2_FC_SIGNAL_STRENGTH_TEST": {0: 8, 2: 21},
            "FLAG_L2_FC_CO2_VM97_SPIKE_HF_TEST": {0: 29},
            "FLAG_L2_FC_CO2_VM97_DROPOUT_TEST": {0: 29},
            "FLAG_L2_FC_VM97_AOA_HF_TEST": {0: 29},
        },
        # 9 records have missing SSITC/SCF (NaN flags, skipped in sums)
        "qcf_counts": {2: 29},
        "filtered_nonnull": 0,
        "filtered_hq_nonnull": 0,
    },
}


@pytest.mark.parametrize("tag", sorted(GOLDENS))
def test_eddypro_l2_flags_match_reference_execution(spark, tag):
    g = GOLDENS[tag]
    df, _ = csvsrc.read_filetype(spark, f"{EXAMPLEDATA}/{g['file']}",
                                 "EDDYPRO-FLUXNET-CSV-30MIN")
    assert df.count() == g["rows"]
    flux, basevar = "FC", "CO2"
    out = df.withColumn(
        f"FLAG_L2_{flux}_MISSING_TEST",
        F.when(F.col(flux).isNull(), 2).otherwise(0).cast("int"))
    out = eddypro.flag_ssitc(out, flux)
    out = eddypro.flag_gas_completeness(out, flux, basevar)
    out = eddypro.flag_spectral_correction(out, flux)
    out = eddypro.flag_signal_strength(out, flux, "FC_SS",
                                       "discard below", 80)
    out = eddypro.flag_vm97(out, flux, basevar, spikes=True, dropout=True)
    out = eddypro.flag_angle_of_attack(out, "TIMESTAMP_END", flux)
    out = outliers.flag_qcf(out, qcf_col="FLAG_L2_QCF")
    pdf = out.toPandas()

    for col, want in g["flag_counts"].items():
        got = {int(k): int(v)
               for k, v in pdf[col].value_counts().items()}
        assert got == want, f"{tag}.{col}: {got} != {want}"
    qcf = {int(k): int(v) for k, v in pdf["FLAG_L2_QCF"].value_counts().items()}
    assert qcf == g["qcf_counts"], f"{tag} QCF: {qcf}"
    filtered = pdf.loc[pdf["FLAG_L2_QCF"] < 2, flux].notna().sum()
    assert int(filtered) == g["filtered_nonnull"]
    hq = pdf.loc[pdf["FLAG_L2_QCF"] == 0, flux].notna().sum()
    assert int(hq) == g["filtered_hq_nonnull"]


def test_aoa_application_dates_restrict(spark):
    g = GOLDENS["2012"]
    df, _ = csvsrc.read_filetype(spark, f"{EXAMPLEDATA}/{g['file']}",
                                 "EDDYPRO-FLUXNET-CSV-30MIN")
    # outside the data's 2012 span: flag NULL everywhere (reference
    # restrict_application fill_value=nan semantics)
    out = eddypro.flag_angle_of_attack(
        df, "TIMESTAMP_END", "FC",
        application_dates=[["2023-07-01", "2023-09-01"]]).toPandas()
    assert out["FLAG_L2_FC_VM97_AOA_HF_TEST"].isna().all()
    # window covering the span: same counts as unrestricted
    out2 = eddypro.flag_angle_of_attack(
        df, "TIMESTAMP_END", "FC",
        application_dates=[["2012-01-01", "2012-12-31"]]).toPandas()
    got = {int(k): int(v) for k, v in
           out2["FLAG_L2_FC_VM97_AOA_HF_TEST"].value_counts().items()}
    assert got == {0: 47, 2: 2}
