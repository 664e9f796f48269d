"""Query catalog: named queries over the driver test tables + matching
ANSI-SQL oracles (DuckDB dialect) — the per-round correctness gate.

Each entry exercises one operator family from SURVEY.md §2 through the
engine's own operator library where applicable. Float aggregates are rounded
to 6 decimals on BOTH sides so cross-engine summation-order noise (~1e-13
relative) can't flip the driver's value hash.

Conventions: every computed column is aliased identically in the Spark plan
and the SQL; tables are read as ``{sf_dir}/{name}.parquet`` (driver
pre-registers the same files as DuckDB views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.operators import gapfill, grid, outliers, resample  # noqa: F401


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(c):
    # +1e-9 before rounding: synthetic 2-decimal inputs produce means that
    # sit EXACTLY on .5e-6 rounding boundaries, where ~1e-13 cross-engine
    # summation-order noise flips the 6th decimal. The shift moves every
    # such value off the boundary; the SQL oracles apply the same shift.
    c = F.col(c) if isinstance(c, str) else c
    return F.round(c + F.lit(1e-9), 6)



# ---------------------------------------------------------------------------
# gap machinery
# ---------------------------------------------------------------------------

def _hourly_gridded(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    r = resample.rollup(ev, "ts", ["value"], "1h", key_cols=["event_type"])
    return grid.gridded(r, "1h", ["event_type"])



#: the catalog registries, mutated in registration order by the section
#: modules (core -> llm -> analysis -> flux), then snapshot + union-merged
#: by the package __init__.
QUERIES: dict = {}
ORACLES: dict = {}
