"""Drop-in Finder facade — the reference's public API surface
(lib/finder/finder.go:47-64) over the distributed operators.

The reference exposes exactly three entry points:
  FindNearestCity(lat, lon)           finder.go:58-64
  FindCityByName(name, country)       finder.go:53-55
  FindCityByPostalCode(code, country) finder.go:48-50

Here each exists in two forms:
  * a DataFrame form (the engine's native surface): pass a DataFrame
    of queries, get a DataFrame of answers — a lookup applied to 10^12
    rows IS a join (SURVEY §0);
  * a single-query convenience form mirroring the reference's
    request/response signatures (returns a dict or None, like the
    JSON bodies of cmd/server/routes/routes.go) — driver-side sugar
    over the same plan, for parity tests and interactive use.

Build once from the dimension tables (the reference's Initialize(),
initializer.go:22-27); the nearest index is built eagerly and reused
across calls like the gob-cached ShapeIndex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cityfinder_spark.operators.name_lookup import city_by_name
from cityfinder_spark.operators.nearest import choose_level
from cityfinder_spark.operators.nearest_arrow import (
    build_city_index,
    nearest_city_join_arrow,
)
from cityfinder_spark.operators.postal_lookup import city_by_postal


class CityFinder:
    """finder.Finder analog: holds the three lookup structures.

    cities:  (city_id, name, lat, lon, country[, alt_names])
    postal:  (country_code, postal_code, place_name, lat, lon,
              accuracy, line_no) — optional
    """

    def __init__(
        self,
        cities: DataFrame,
        postal: DataFrame | None = None,
        *,
        level: int | None = None,
        ring: int = 1,
    ):
        self.spark: SparkSession = cities.sparkSession
        self.cities = cities
        self.postal = postal
        n = cities.count()
        self.level = level if level is not None else choose_level(n, ring)
        self.ring = ring
        # build-once, like ensureS2Index (initializer.go:192-215)
        self.index = build_city_index(cities, self.level, ring)

    # ---- index persistence (SURVEY §2.1 S5/S6/S7) ----
    #
    # The reference serializes its three lookup structures to gob files
    # (s2.go:77-129, name.go:78-122, postalCode.go:76-115) and reloads
    # them instead of re-parsing the TSVs. The Spark analog is Parquet
    # dimension tables: cities annotated with their index cell_id (the
    # S5 "Cities + ShapeIndex" pair), names in the exploded layout
    # resolved at query time (S6), postal as-is (S7). The worker-side
    # CityIndex is rebuilt from the loaded table — like
    # DeserializeIndex rebuilding ShapeIndex from points (s2.go:103-127).

    def save_index(self, path: str) -> None:
        import os

        from cityfinder_spark.geo.cells import cell_col

        # cell_id annotation = the S5 "Cities + ShapeIndex" pair: the
        # stored table doubles as a ready-made cover/join key for
        # external JVM-side consumers (load_index itself rebuilds the
        # worker index from lat/lon and ignores it)
        self.cities.withColumn(
            "cell_id", cell_col("lat", "lon", self.level)
        ).write.mode("overwrite").parquet(os.path.join(path, "cities"))
        if self.postal is not None:
            self.postal.write.mode("overwrite").parquet(
                os.path.join(path, "postal")
            )
        # meta rides through the same writer as the tables so any
        # filesystem the tables can reach (hdfs://, s3a://), meta can too
        self.spark.createDataFrame(
            [(self.level, self.ring, self.postal is not None)],
            "level int, ring int, has_postal boolean",
        ).coalesce(1).write.mode("overwrite").json(os.path.join(path, "meta"))

    @classmethod
    def load_index(cls, spark: SparkSession, path: str) -> "CityFinder":
        import os

        meta = spark.read.json(os.path.join(path, "meta")).collect()[0]
        cities = spark.read.parquet(os.path.join(path, "cities")).drop("cell_id")
        postal = (
            spark.read.parquet(os.path.join(path, "postal"))
            if meta["has_postal"]
            else None
        )
        return cls(cities, postal, level=int(meta["level"]), ring=int(meta["ring"]))

    # ---- DataFrame forms (the engine surface) ----

    def nearest_city_df(
        self, points: DataFrame, id_col: str = "pt_id",
        lat_col: str = "lat", lon_col: str = "lon",
    ) -> DataFrame:
        return nearest_city_join_arrow(
            points, self.cities,
            level=self.level, ring=self.ring, id_col=id_col,
            lat_col=lat_col, lon_col=lon_col, city_index=self.index,
        )

    def city_by_name_df(self, queries: DataFrame, **kw) -> DataFrame:
        return city_by_name(queries, self.cities, **kw)

    def city_by_postal_df(self, queries: DataFrame, **kw) -> DataFrame:
        if self.postal is None:
            raise ValueError("no postal dimension loaded")
        return city_by_postal(queries, self.postal, **kw)

    # ---- single-query conveniences (routes.go parity) ----

    def find_nearest_city(self, lat: float, lon: float) -> dict | None:
        """finder.go:58-64; None when the index is empty ('no city
        found'). Validates ranges like routes.go:26-32."""
        if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
            raise ValueError("invalid latitude/longitude")
        pts = self.spark.createDataFrame([(0, lat, lon)], "pt_id long, lat double, lon double")
        row = self.nearest_city_df(pts).collect()[0]
        if row["city_id"] is None:
            return None
        # city coordinates from the in-memory index (routes.go:41
        # returns the CITY's lat/lon, not the query's)
        import numpy as np

        pos = int(np.searchsorted(self.index.city_id, row["city_id"]))
        return {
            "Latitude": float(self.index.lat[pos]),
            "Longitude": float(self.index.lon[pos]),
            "Name": row["name"],
            "Country": row["country"],
            "DistanceKm": row["dist_km"],
        }

    def find_city_by_name(self, name: str, country: str) -> dict | None:
        """finder.go:53-55 (exact then fuzzy; country uppercased at the
        boundary, routes.go:49)."""
        q = self.spark.createDataFrame(
            [(0, name, country)], "q_id long, q_name string, q_country string"
        )
        row = self.city_by_name_df(q).collect()[0]
        if row["city_id"] is None:
            return None
        return {
            "Name": row["name"],
            "Latitude": row["c_lat"],
            "Longitude": row["c_lon"],
            "Country": row["q_country"],
            "MatchType": row["match_type"],
            "EditDist": row["edit_dist"],
        }

    def find_city_by_postal_code(self, code: str, country: str) -> dict | None:
        """finder.go:48-50 / postalCode.go:58-73: synthesize a city
        from the postal entry; None on miss."""
        q = self.spark.createDataFrame(
            [(0, code, country)], "q_id long, q_code string, q_country string"
        )
        row = self.city_by_postal_df(q).collect()[0]
        if row["name"] is None:
            return None
        return {
            "Name": row["name"],
            "Latitude": row["c_lat"],
            "Longitude": row["c_lon"],
            "Country": row["q_country"],
        }
