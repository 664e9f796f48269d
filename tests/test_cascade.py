"""Retention cascade: 1h-from-1m == 1h-from-raw, 1d-from-1h == 1d-from-raw
(partial/final composition, SURVEY.md §2.4)."""

import numpy as np
import pytest

from diive_spark import synth
from diive_spark.operators import resample


@pytest.fixture(scope="module")
def tiers(spark):
    df = synth.inject_gaps(
        synth.with_event_time(synth.token_table(spark, 8_000, with_tokens=False))
    ).select("n_tok", "source", "event_time")
    t1m = resample.rollup(df, "event_time", ["n_tok"], "1m", key_cols=["source"]).cache()
    return df, t1m


def _sorted(pdf):
    return pdf.sort_values(["source", "window_start"]).reset_index(drop=True)


def _assert_equal(a, b):
    a, b = _sorted(a), _sorted(b)
    assert len(a) == len(b)
    for c in ["source", "window_start", "window_end", "n_tok_cnt", "n_tok_min", "n_tok_max"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), err_msg=c)
    for c in ["n_tok_sum", "n_tok_sumsq", "n_tok_mean"]:
        np.testing.assert_allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=1e-12, err_msg=c)


def test_1h_from_1m_equals_direct(tiers):
    df, t1m = tiers
    from_cascade = resample.reaggregate(t1m, "1h", ["n_tok"], key_cols=["source"]).toPandas()
    direct = resample.rollup(df, "event_time", ["n_tok"], "1h", key_cols=["source"]).toPandas()
    _assert_equal(from_cascade, direct)


def test_1d_from_1h_from_1m_equals_direct(tiers):
    df, t1m = tiers
    t1h = resample.reaggregate(t1m, "1h", ["n_tok"], key_cols=["source"])
    t1d = resample.reaggregate(t1h, "1d", ["n_tok"], key_cols=["source"]).toPandas()
    direct = resample.rollup(df, "event_time", ["n_tok"], "1d", key_cols=["source"]).toPandas()
    _assert_equal(t1d, direct)
