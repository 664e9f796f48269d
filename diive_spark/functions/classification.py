"""Variable classification by column-name convention.

Reference: ``classify_variable``
(/root/reference/diive/variables/classification.py:62-110): prefix rules map
flux/meteo column names to (kind, category); FC is word-boundary matched so
it does not catch FCH4; bare TA is exact-matched so a TA prefix does not
catch TARGET/TAU.

Two forms: a driver-side Python function (names are metadata, like the
reference) and a Column expression for classifying a name column in a frame.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column
from pyspark.sql import functions as F

CATEGORY_CARBON = "carbon"
CATEGORY_WATER = "water"
CATEGORY_RADIATION = "radiation"
CATEGORY_METEO = "meteo"
CATEGORY_SOIL = "soil"
CATEGORY_NITROGEN = "nitrogen"


class VariableClass(NamedTuple):
    kind: str
    category: str


_RULES: tuple[tuple[str, str, str], ...] = (
    ("NEE", "NEE", CATEGORY_CARBON),
    ("GPP", "GPP", CATEGORY_CARBON),
    ("Reco", "Reco", CATEGORY_CARBON),
    ("FCH4", "FCH4", CATEGORY_CARBON),
    ("FN2O", "FN2O", CATEGORY_NITROGEN),
    ("FH2O", "FH2O", CATEGORY_WATER),
    ("LE_", "LE", CATEGORY_WATER),
    ("ET_", "ET", CATEGORY_WATER),
    ("Rg_", "Rg", CATEGORY_RADIATION),
    ("SW_IN_", "SW_IN", CATEGORY_RADIATION),
    ("PPFD", "PPFD", CATEGORY_RADIATION),
    ("PAR_", "PAR", CATEGORY_RADIATION),
    ("LW_", "LW", CATEGORY_RADIATION),
    ("Tair", "TA", CATEGORY_METEO),
    ("TA_", "TA", CATEGORY_METEO),
    ("VPD", "VPD", CATEGORY_METEO),
    ("SWC", "SWC", CATEGORY_SOIL),
)


def classify_variable(name: str) -> VariableClass | None:
    """Driver-side classification (classification.py:62)."""
    if not isinstance(name, str):
        return None
    if name == "FC" or name.startswith("FC_"):
        return VariableClass("FC", CATEGORY_CARBON)
    if name == "TA":
        return VariableClass("TA", CATEGORY_METEO)
    for prefix, kind, category in _RULES:
        if name.startswith(prefix):
            return VariableClass(kind, category)
    return None


def classify_variable_expr(name_col: Column) -> Column:
    """Column form: struct(kind, category) or null — same rule order."""
    expr = F.when(
        (name_col == "FC") | name_col.startswith("FC_"),
        F.struct(F.lit("FC").alias("kind"), F.lit(CATEGORY_CARBON).alias("category")),
    ).when(
        name_col == "TA",
        F.struct(F.lit("TA").alias("kind"), F.lit(CATEGORY_METEO).alias("category")),
    )
    for prefix, kind, category in _RULES:
        expr = expr.when(
            name_col.startswith(prefix),
            F.struct(F.lit(kind).alias("kind"), F.lit(category).alias("category")),
        )
    return expr
