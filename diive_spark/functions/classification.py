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


# ---------------------------------------------------------------------------
# Measurement registry + applicable-corrections dispatch
# (reference preprocessing/qaqc/measurements.py — the metadata that routes
# each meteo variable to the corrections that physically apply to it; the
# correction implementations themselves live in functions/corrections.py)
# ---------------------------------------------------------------------------

#: measurement code -> description (measurements.py:35-49)
MEASUREMENTS: dict[str, str] = {
    "TA": "air temperature", "RH": "relative humidity",
    "VPD": "vapor pressure deficit", "SW": "shortwave radiation",
    "LW": "longwave radiation", "PPFD": "photosynthetic photon flux density",
    "PA": "air pressure", "PREC": "precipitation", "WS": "wind speed",
    "WD": "wind direction", "SWC": "soil water content",
    "TS": "soil temperature", "G": "soil heat flux",
}

#: variable-name prefix -> code, FIRST match wins, most specific first
#: (measurements.py:131-148; case-sensitive)
MEASUREMENT_PREFIXES: tuple[tuple[str, str], ...] = (
    ("SWC", "SWC"), ("SW_", "SW"), ("SW", "SW"), ("PPFD", "PPFD"),
    ("LW", "LW"), ("RH", "RH"), ("VPD", "VPD"), ("TA", "TA"),
    ("Tair", "TA"), ("TS", "TS"), ("PREC", "PREC"), ("PA", "PA"),
    ("WS", "WS"), ("WD", "WD"), ("G_", "G"),
)

#: correction key -> (engine implementation, needs site coordinates)
#: (measurements.py:78-116; implementations in functions/corrections.py)
CORRECTION_KEYS: tuple[tuple[str, bool], ...] = (
    ("radiation_zero_offset", True),     # remove_nighttime_zero_offset
    ("relativehumidity_offset", False),  # remove_relativehumidity_offset
    ("setto_max", False),                # setto_threshold(mode='max')
    ("setto_min", False),                # setto_threshold(mode='min')
    ("setto_value", False),              # event-ranged setto (corrections)
    ("set_exact_to_missing", False),     # set_exact_values_to_missing
)

_GENERIC_KEYS = ("setto_max", "setto_min", "setto_value",
                 "set_exact_to_missing")
_SPECIFIC = {"radiation_zero_offset": frozenset({"SW", "PPFD"}),
             "relativehumidity_offset": frozenset({"RH"})}


def detect_measurement(varname: str) -> str | None:
    """Measurement code from a variable-name prefix (measurements.py:187):
    ``'SW_IN_T1_2_1' -> 'SW'``; None when no prefix matches."""
    if not isinstance(varname, str):
        return None
    for prefix, code in MEASUREMENT_PREFIXES:
        if varname.startswith(prefix):
            return code
    return None


def corrections_for_measurement(code: str | None) -> list[str]:
    """The correction keys that apply to a measurement, in canonical
    order: measurement-specific physics first, then the generic set
    (measurements.py:165-185)."""
    keys = [k for k, _ in CORRECTION_KEYS
            if code is not None and code in _SPECIFIC.get(k, frozenset())]
    keys += list(_GENERIC_KEYS)
    order = {k: i for i, (k, _) in enumerate(CORRECTION_KEYS)}
    return sorted(dict.fromkeys(keys), key=lambda k: order[k])
