"""Driver-gate rehearsal: every QUERIES entry must match its DuckDB oracle
(row count, column names, order-insensitive values) on the sf0.001 tables."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from diive_spark import queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if np.issubdtype(pdf[c].dtype, np.datetime64):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(queries.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    if name not in queries.ORACLES:
        # rows-only contract (approximate/probabilistic op): must run, >=0 rows
        n = queries.QUERIES[name](spark, SF_DIR).count()
        assert n >= 0
        return
    got = _normalize(queries.QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(queries.ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(np.asarray(w).dtype, np.floating) or np.issubdtype(np.asarray(g).dtype, np.floating):
            # EXACT equality: both sides round(x + 1e-9, 6), which keeps
            # every value off the .5e-6 boundary where summation-order noise
            # could flip the last digit — so a strict driver value-hash holds
            gg = pd.to_numeric(g).astype(float).to_numpy()
            ww = pd.to_numeric(w).astype(float).to_numpy()
            bad = ~((gg == ww) | (np.isnan(gg) & np.isnan(ww)))
            assert not bad.any(), f"{name}.{c}: {int(bad.sum())} mismatches, e.g. {gg[bad][:3]} vs {ww[bad][:3]}"
        else:
            mism = (g.astype(str).fillna("<NA>") != w.astype(str).fillna("<NA>"))
            assert not mism.any(), f"{name}.{c}: {int(mism.sum())} mismatches, e.g.\n{got[mism].head(3)}\nvs\n{want[mism].head(3)}"
