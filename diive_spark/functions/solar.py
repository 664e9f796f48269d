"""Solar geometry: potential radiation + daytime/nighttime flags.

Reference: ``potrad_eot`` (/root/reference/diive/variables/radiation.py:15-100)
— equation-of-time based top-of-atmosphere shortwave, Woolf (1968) EoT,
solstice-anchored declination — and ``DaytimeNighttimeFlag``
(/root/reference/diive/variables/temporal.py:19-110): daytime where potential
radiation >= threshold (default 20 W m-2).

Deterministic pure column math over the timestamp (sin/cos chains, no UDF).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

S_SC = 1361.0          # solar constant W m-2
D_Y = 365.25
D_R = 173              # summer solstice DOY
PHI_R = math.radians(23.45)


def potential_radiation(
    ts: Column, lat: float, lon: float, utc_offset: int,
    use_atmospheric_transmission: bool = False,
    method: str = "eot",
) -> Column:
    """Potential shortwave radiation [W m-2].

    ``method='eot'`` (default) is the reference's equation-of-time variant
    (radiation.py:15 ``potrad_eot``: Woolf EoT, eccentricity factor,
    optional clear-sky transmission); ``method='stull'`` is the plain
    Stull (1988) formulation (radiation.py:100 ``potrad``: S=1361, hour
    angle ``pi·h/12 + lambda_e`` with the minus-cosine convention, no
    eccentricity). Both reference-execution parity-tested."""
    if not -90 <= lat <= 90:
        raise ValueError(f"latitude {lat} out of range")
    if not -180 <= lon <= 180:
        raise ValueError(f"longitude {lon} out of range")
    phi = math.radians(lat)

    utc = ts - F.expr(f"INTERVAL {utc_offset} HOURS")
    doy = F.dayofyear(utc).cast("double")
    utc_h = (
        F.hour(utc).cast("double")
        + F.minute(utc).cast("double") / 60.0
        + F.second(utc).cast("double") / 3600.0
    )

    delta = PHI_R * F.cos(2 * math.pi * (doy - D_R) / D_Y)
    if method == "stull":
        lambda_e = math.radians(lon)
        sin_psi = (
            math.sin(phi) * F.sin(delta)
            - math.cos(phi) * F.cos(delta)
            * F.cos(math.pi * utc_h / 12.0 + lambda_e)
        )
        return F.greatest(F.lit(1361.0) * sin_psi, F.lit(0.0))
    b = 2 * math.pi * (doy - 81) / 365.0
    eot_h = (9.87 * F.sin(2 * b) - 7.53 * F.cos(b) - 1.5 * F.sin(b)) / 60.0
    solar_time_h = utc_h + lon / 15.0 + eot_h
    h_rad = (solar_time_h - 12) * (math.pi / 12)

    sin_psi = (
        math.sin(phi) * F.sin(delta) + math.cos(phi) * F.cos(delta) * F.cos(h_rad)
    )
    eccentricity = 1 + 0.033 * F.cos(2 * math.pi * doy / 365.0)
    rad = S_SC * eccentricity * sin_psi
    if use_atmospheric_transmission:
        m = 1 / F.greatest(sin_psi, F.lit(0.01))
        rad = rad * F.pow(F.lit(0.75), m)
    return F.greatest(rad, F.lit(0.0))


def daytime_nighttime_flag(
    df: DataFrame, ts_col: str, lat: float, lon: float, utc_offset: int,
    nighttime_threshold: float = 20.0,
) -> DataFrame:
    """SW_IN_POT + DAYTIME/NIGHTTIME 0/1 flags (temporal.py:19-110)."""
    pot = potential_radiation(F.col(ts_col), lat, lon, utc_offset)
    return (
        df.withColumn("SW_IN_POT", pot)
        .withColumn("DAYTIME", (F.col("SW_IN_POT") >= nighttime_threshold).cast("int"))
        .withColumn("NIGHTTIME", (F.col("SW_IN_POT") < nighttime_threshold).cast("int"))
    )
