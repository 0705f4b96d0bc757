"""Column helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round6_col(col: Column) -> Column:
    """Portable 6-digit half-up rounding (see sqlcompat.round6_sql):
    identical IEEE sequence to the DuckDB oracle, unlike F.round whose
    HALF_UP-on-decimal-expansion disagrees at .xxxxxx5 boundaries."""
    return F.floor(col * 1000000.0 + 0.5) / 1000000.0
