"""GeoNames-format sources (SURVEY §2.1 S1/S3, §2.2 P1-P5).

Declarative Spark scans with the exact row-handling semantics of the
reference's loaders:

  * cities TSV (allCountries.txt layout, 19 tab-separated fields):
    project name(f1), altnames(f3, comma-split), lat(f4), lon(f5),
    country(f8); rows with fewer than 19 fields or unparseable
    lat/lon are silently skipped (reference
    lib/dataLoader/cityCoordinate.go:24-48: parse errors `continue`).
  * postal TSV (zipCodes.txt layout, 12 positional fields): parse
    errors become zero values, not skipped rows (reference
    lib/dataLoader/zipCodes.go:41-58 ignores strconv errors).

Both are pure Catalyst plans: whole-line read + split, null-safe
casts, filters — predicate pushdown and column pruning apply; no UDF.
The emitted schemas feed the same operators as the synthetic
dimensions (nearest join, name/postal lookup), so the reference's
own 1,000-row testdata samples run through the engine unchanged —
that is how the fixture-parity tests load them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# allCountries.txt columns (19 of them; reference reads 1,3,4,5,8)
_CITY_MIN_FIELDS = 19


def load_geonames_cities(spark: SparkSession, path: str) -> DataFrame:
    """cities: (city_id, name, alt_names array<string>, lat, lon,
    country) — malformed rows silently dropped (S1/P1/P2/P3)."""
    lines = spark.read.text(path)
    f = F.split(F.col("value"), "\t")
    df = lines.select(
        F.size(f).alias("__n"),
        f.getItem(0).cast("long").alias("city_id"),
        f.getItem(1).alias("name"),
        F.split(f.getItem(3), ",").alias("alt_names"),
        f.getItem(4).cast("double").alias("lat"),
        f.getItem(5).cast("double").alias("lon"),
        f.getItem(8).alias("country"),
    )
    return (
        df.where(
            (F.col("__n") >= _CITY_MIN_FIELDS)
            & F.col("lat").isNotNull()
            & F.col("lon").isNotNull()
        )
        .drop("__n")
    )


def load_postal_codes(spark: SparkSession, path: str) -> DataFrame:
    """postal rows: (country_code, postal_code, place_name,
    admin_name1..3, admin_code1..3, lat, lon, accuracy, line_no).

    Parse failures on numeric fields become zero values (coalesce),
    mirroring the reference's ignored strconv errors (S3); line_no
    (monotonic file order) feeds the last-write-wins dedup (J5)."""
    lines = spark.read.text(path).withColumn(
        "line_no", F.monotonically_increasing_id()
    )
    f = F.split(F.col("value"), "\t")
    return lines.select(
        f.getItem(0).alias("country_code"),
        f.getItem(1).alias("postal_code"),
        f.getItem(2).alias("place_name"),
        f.getItem(3).alias("admin_name1"),
        f.getItem(4).alias("admin_code1"),
        f.getItem(5).alias("admin_name2"),
        f.getItem(6).alias("admin_code2"),
        f.getItem(7).alias("admin_name3"),
        f.getItem(8).alias("admin_code3"),
        F.coalesce(f.getItem(9).cast("double"), F.lit(0.0)).alias("lat"),
        F.coalesce(f.getItem(10).cast("double"), F.lit(0.0)).alias("lon"),
        F.coalesce(f.getItem(11).cast("int"), F.lit(0)).alias("accuracy"),
        "line_no",
    )
