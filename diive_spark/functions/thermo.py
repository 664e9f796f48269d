"""Thermodynamic / micrometeorological scalar functions.

Reference formulas (/root/reference/diive/variables/thermodynamic.py), each a
pure column expression (same constants, same operation order, so a pandas
oracle matches bit-for-bit):

- calc_vpd_from_ta_rh (thermodynamic.py:96-131): Magnus form,
  VPD[kPa] = 0.1 * 6.1078 * (1 - RH/100) * exp(17.08085*TA / (234.175+TA))
- aerodynamic_resistance (thermodynamic.py:19-50): ra = u / ustar^2,
  null where ustar <= 0
- dry_air_density (thermodynamic.py:53-93): rho_d = rho_a - rho_v
- air_temp_from_sonic_temp (thermodynamic.py:133-170):
  TA = T_sonic / (1 + 0.32 * h2o)
- latent_heat_of_vaporization (thermodynamic.py:173-...):
  LHV [J kg-1] = (2.501 - 0.00237 * TA) * 1e6   (Stull 1988 / bigleaf)
- et_from_le: ET [mm] = LE / LHV * interval_seconds
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def vpd_from_ta_rh(ta: Column, rh: Column) -> Column:
    """VPD in kPa from air temperature [degC] and relative humidity [%]."""
    a = F.lit(6.1078)
    b = 1 - rh / 100
    c = ta * 17.08085 / (ta + 234.175)
    return a * b * F.exp(c) * 0.1


def aerodynamic_resistance(u: Column, ustar: Column) -> Column:
    """ra = u / ustar^2 [s m-1]; null where ustar <= 0."""
    ustar_ok = F.when(ustar > 0, ustar)
    return u / (ustar_ok * ustar_ok)


def dry_air_density(rho_a: Column, rho_v: Column) -> Column:
    return rho_a - rho_v


def air_temp_from_sonic_temp(sonic_temp_k: Column, h2o_molmol: Column) -> Column:
    return sonic_temp_k / (1 + 0.32 * h2o_molmol)


def latent_heat_of_vaporization(ta_c: Column) -> Column:
    """LHV [J kg-1] from air temperature [degC] (Stull 1988, p.641)."""
    return (F.lit(2.501) - 0.00237 * ta_c) * 1e6


def et_from_le(le: Column, ta_c: Column, interval_seconds: int) -> Column:
    """Evapotranspiration [mm per interval] from latent heat flux [W m-2]."""
    return le / latent_heat_of_vaporization(ta_c) * interval_seconds


def wind_direction_agg(angle_col: Column, agg: str = "mean") -> Column:
    """Circular wind-direction aggregate in degrees [0, 360) — the
    reference's Kanda vector aggregation (core/funcs/funcs.py:85-118):
    aggregate the sin/cos components (mean / median / P25 / P75), then
    atan2 back to a direction. A plain average of angles breaks across
    the 0/360 wrap (e.g. 350° and 10° must average to 0°, not 180°);
    the vector form is the standard fix, here as a pure JVM aggregation
    expression usable inside any groupBy/rollup."""
    rad = angle_col * (math.pi / 180.0)
    comps = {
        "mean": (F.avg(F.sin(rad)), F.avg(F.cos(rad))),
        "median": (F.percentile(F.sin(rad), F.lit(0.5)),
                   F.percentile(F.cos(rad), F.lit(0.5))),
        "P25": (F.percentile(F.sin(rad), F.lit(0.25)),
                F.percentile(F.cos(rad), F.lit(0.25))),
        "P75": (F.percentile(F.sin(rad), F.lit(0.75)),
                F.percentile(F.cos(rad), F.lit(0.75))),
    }
    if agg not in comps:
        raise ValueError(f"unknown agg {agg!r}; choose from {list(comps)}")
    s, c = comps[agg]
    deg = F.atan2(s, c) * (180.0 / math.pi)
    return F.when(deg < 0, deg + 360.0).otherwise(deg)
