"""Great-circle distance kernels.

One kernel serves both of the reference's distance paths (SURVEY §7.3):
argmin(chord) == argmin(great-circle) and the reported km (S2 angle x
6371, s2.go:72) equals the haversine with R=6371 (city.go:69-81).

Hot path is the pure-Column form (JVM, whole-stage codegen — no UDF);
the NumPy form backs pandas-UDF kernels and tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM, ROUND_DIGITS


def _c(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


def haversine_col(
    lat1: str | Column, lon1: str | Column, lat2: str | Column, lon2: str | Column
) -> Column:
    """Great-circle km, atan2 form (matches reference lib/city/city.go:69-81)."""
    la1, lo1, la2, lo2 = _c(lat1), _c(lon1), _c(lat2), _c(lon2)
    a = (
        F.pow(F.sin(F.radians(la2 - la1) / 2), 2)
        + F.cos(F.radians(la1)) * F.cos(F.radians(la2))
        * F.pow(F.sin(F.radians(lo2 - lo1) / 2), 2)
    )
    return 2.0 * EARTH_RADIUS_KM * F.atan2(F.sqrt(a), F.sqrt(F.greatest(F.lit(0.0), 1.0 - a)))


def haversine_rounded_col(lat1, lon1, lat2, lon2, digits: int = ROUND_DIGITS) -> Column:
    """Floor-form rounding (colutils.round_digits_col): bit-identical
    to sqlcompat.haversine_rounded_sql in DuckDB AND ~12x faster than
    F.round (no BigDecimal in the per-candidate loop)."""
    from cityfinder_spark.colutils import round_digits_col

    return round_digits_col(haversine_col(lat1, lon1, lat2, lon2), digits)


def haversine_np(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Vectorized NumPy haversine (for pandas-UDF kernels and oracles)."""
    la1, lo1 = np.radians(lat1), np.radians(lon1)
    la2, lo2 = np.radians(lat2), np.radians(lon2)
    a = (
        np.sin((la2 - la1) / 2) ** 2
        + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arctan2(np.sqrt(a), np.sqrt(np.maximum(0.0, 1.0 - a)))
