"""Column helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round6_col(col: Column) -> Column:
    """Portable 6-digit half-up rounding (see sqlcompat.round6_sql):
    identical IEEE sequence to the DuckDB oracle, unlike F.round whose
    HALF_UP-on-decimal-expansion disagrees at .xxxxxx5 boundaries."""
    return F.floor(col * 1000000.0 + 0.5) / 1000000.0


def round_digits_col(col: Column, digits: int) -> Column:
    """Floor-form half-up rounding at `digits` decimal places.

    Besides cross-engine bit-identity (same IEEE sequence as the
    round{n}_sql helpers), this is ~12x faster than F.round in the hot
    path: F.round routes every double through BigDecimal HALF_UP while
    this stays in whole-stage-codegen double arithmetic."""
    scale = float(10 ** digits)
    return F.floor(col * scale + 0.5) / scale


def spread(df, min_parts: int | None = None):
    """Repartition a fact-side DataFrame up to the session's default
    parallelism when the scan under-parallelizes.

    The driver's sf tables are single-file/single-row-group parquet, so
    the scan yields ONE partition and every downstream stage runs
    single-threaded on local[32]. At real scale inputs have thousands
    of files and this is a no-op (we never repartition *down*)."""
    if df.isStreaming:
        # micro-batch partitioning belongs to the source (maxFilesPer
        # Trigger etc.); df.rdd is illegal on a streaming DataFrame
        return df
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
