"""City-by-name lookup: exact inverted-index join + fuzzy Levenshtein
fallback.

Reimplements the reference's NameFinder (lib/finder/name/name.go:56-75):
  * build: every city indexed under its primary name AND each alternate
    name (name.go:43-53 appends Name to AltNames and indexes each);
    duplicates per (country, name) keep insertion order -> our
    monotonic city_id column (J6).
  * exact: InvertedIndex[country][name] -> cities[0], i.e. lowest
    city_id among duplicates (J2; name.go:60-62). Country codes are
    uppercased at the boundary (routes.go:49, P5).
  * fuzzy: on exact miss, BK-tree search radius 2 then first candidate
    present in the queried country's index (J3; name.go:64-72 +
    util/util.go:99-137). The BK-tree is purely a pruning structure —
    the semantics are "any indexed name within Levenshtein distance
    <= 2". Reference candidate ORDER is BK-tree-traversal-dependent
    (SURVEY §7.3); we standardize the documented deterministic
    tie-break: (edit distance, name asc, city_id).

Spark plan: the name dictionary is the small broadcast side; exact
lookup is a broadcast equi-join on (country, name); fuzzy is a
broadcast join on country pruned by the length-difference bound
(|len(a)-len(b)| <= k is implied by lev(a,b) <= k — replaces the
BK-tree triangle-inequality prune, SURVEY §4) + exact levenshtein.
No fact-side shuffle anywhere except the first-match window, which
partitions by the (unique) query id and is map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def build_name_index(cities: DataFrame) -> DataFrame:
    """Exploded-name dictionary: one row per (country, name, city).

    cities: city_id, name, lat, lon, country [, alt_names array<string>].
    """
    cols = set(cities.columns)
    names = (
        F.array_union(F.array(F.col("name")), F.col("alt_names"))
        if "alt_names" in cols
        else F.array(F.col("name"))
    )
    return (
        cities.withColumn("__names", names)
        .select(
            F.col("city_id").cast("long").alias("city_id"),
            F.col("name").alias("primary_name"),
            F.col("lat").cast("double").alias("c_lat"),
            F.col("lon").cast("double").alias("c_lon"),
            F.upper(F.col("country")).alias("c_country"),
            F.explode("__names").alias("indexed_name"),
        )
        .where(F.col("indexed_name").isNotNull() & (F.col("indexed_name") != ""))
        .dropDuplicates(["c_country", "indexed_name", "city_id"])
    )


def city_by_name(
    queries: DataFrame,
    cities: DataFrame,
    *,
    fuzzy: bool = True,
    max_dist: int = 2,
    id_col: str = "q_id",
    name_col: str = "q_name",
    country_col: str = "q_country",
) -> DataFrame:
    """queries + (city_id, name, c_lat, c_lon, match_type, edit_dist).

    match_type in ('exact', 'fuzzy', NULL-on-miss). Exact hits resolve
    to the lowest city_id (reference first-match). Fuzzy hits resolve
    by (edit distance, indexed name asc, city_id).
    """
    index = F.broadcast(build_name_index(cities))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(name_col).alias("q_name"),
        F.upper(F.col(country_col)).alias("q_country"),
    )

    w_exact = Window.partitionBy("q_id").orderBy("city_id")
    exact = (
        q.join(
            index,
            (q["q_country"] == index["c_country"])
            & (q["q_name"] == index["indexed_name"]),
            "inner",
        )
        .withColumn("__rn", F.row_number().over(w_exact))
        .where(F.col("__rn") == 1)
        .select(
            "q_id", "q_name", "q_country",
            "city_id",
            F.col("primary_name").alias("name"),
            "c_lat", "c_lon",
            F.lit("exact").alias("match_type"),
            F.lit(0).alias("edit_dist"),
        )
    )
    if not fuzzy:
        misses = q.join(exact.select("q_id"), "q_id", "left_anti")
        return exact.unionByName(
            misses.select(
                "q_id", "q_name", "q_country",
                F.lit(None).cast("long").alias("city_id"),
                F.lit(None).cast("string").alias("name"),
                F.lit(None).cast("double").alias("c_lat"),
                F.lit(None).cast("double").alias("c_lon"),
                F.lit(None).cast("string").alias("match_type"),
                F.lit(None).cast("int").alias("edit_dist"),
            )
        )

    misses = q.join(exact.select("q_id"), "q_id", "left_anti")
    lev = F.levenshtein(F.col("q_name"), F.col("indexed_name"))
    w_fuzzy = Window.partitionBy("q_id").orderBy("edit_dist", "indexed_name", "city_id")
    fuzzy_hits = (
        misses.join(
            index,
            (misses["q_country"] == index["c_country"])
            # length-difference bound: sound prune for lev <= max_dist
            & (
                F.abs(F.length(misses["q_name"]) - F.length(index["indexed_name"]))
                <= max_dist
            ),
            "inner",
        )
        .withColumn("edit_dist", lev)
        .where(F.col("edit_dist") <= max_dist)
        .withColumn("__rn", F.row_number().over(w_fuzzy))
        .where(F.col("__rn") == 1)
        .select(
            "q_id", "q_name", "q_country",
            "city_id",
            F.col("primary_name").alias("name"),
            "c_lat", "c_lon",
            F.lit("fuzzy").alias("match_type"),
            F.col("edit_dist").cast("int").alias("edit_dist"),
        )
    )
    true_misses = misses.join(fuzzy_hits.select("q_id"), "q_id", "left_anti").select(
        "q_id", "q_name", "q_country",
        F.lit(None).cast("long").alias("city_id"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("double").alias("c_lat"),
        F.lit(None).cast("double").alias("c_lon"),
        F.lit(None).cast("string").alias("match_type"),
        F.lit(None).cast("int").alias("edit_dist"),
    )
    return exact.unionByName(fuzzy_hits).unionByName(true_misses)
