"""Spatial hotspot clustering: grid-DBSCAN over the cell lattice.

The reference stops at per-cell candidate lookup (lib/finder/
coordinates/s2.go cell decomposition); an analytics engine over
geotagged image corpora also needs the opposite direction — DISCOVER
dense regions. This is the classic grid-based DBSCAN reduction:

  1. density — one map-side-combined `groupBy(cell_id).count()` over
     the fact table (the same skew pre-pass as `hot_cells`); cells with
     `n_points >= min_count` are core ("hot") cells. The only
     corpus-sized exchange in the plan, and it carries (cell, partial
     count) longs.
  2. adjacency — each hot cell explodes into its ring-1 neighbors
     (pure Column arithmetic, lon wraps / lat clamps) and semi-joins
     the hot set: an edge per pair of 8-adjacent hot cells. All sizes
     here are |hot cells|, corpus-independent.
  3. merge — `components.connected_components` (driver union-find for
     small graphs, O(log diameter) pointer-jumping label propagation
     above the budget) labels each hot cell with the MIN cell id of its
     cluster; isolated hot cells are their own cluster.

Output (cell_id, cluster_id, n_points): deterministic, one row per hot
cell. Scale: after the density agg everything is dimension-sized; a
10^12-row fact table costs exactly one count-shuffle of cell ids. The
cluster label join is a broadcast of the (hot-cell -> label) map.

Cite: grid-DBSCAN is the standard density-clustering reduction (Ester
et al. 1996 DBSCAN; STING/CLIQUE grid variants); the cell/ring
machinery is shared with the kNN operators (geo/cells.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.geo.cells import cell_col, ring_cells_col
from cityfinder_spark.operators.components import connected_components


def hotspot_clusters(
    points: DataFrame,
    *,
    level: int,
    min_count: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """-> (cell_id, cluster_id, n_points) for every hot cell
    (n_points >= min_count); cluster_id = min cell_id over the
    8-adjacency connected component of hot cells."""
    hot = (
        points.select(cell_col(lat_col, lon_col, level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .where(F.col("n_points") >= min_count)
    )
    nbrs = hot.select(
        "cell_id",
        F.explode(ring_cells_col(F.col("cell_id"), 1, level)).alias("nbr"),
    ).where(F.col("nbr") != F.col("cell_id"))
    # semi-join against the hot set keeps only hot->hot edges; ring
    # arrays can repeat a cell when the grid is tiny (lon wrap), which
    # duplicates edges — harmless to the min-label merge.
    edges = nbrs.join(
        hot.select(F.col("cell_id").alias("nbr")), "nbr", "inner"
    ).select("cell_id", "nbr")
    labels = connected_components(edges, "cell_id", "nbr")
    return (
        hot.join(
            F.broadcast(labels), hot["cell_id"] == labels["node"], "left"
        )
        .select(
            "cell_id",
            F.coalesce("label", "cell_id").alias("cluster_id"),
            "n_points",
        )
    )


def kanon_cells(
    pts: DataFrame,
    user_col: str,
    level: int,
    k: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """K-anonymity cell suppression — the publish gate any per-cell
    statistic (heat map, density tile, rollup) must pass before
    leaving the platform: a cell is publishable only when at least
    `k` DISTINCT contributors fall in it, otherwise its counts are
    suppressed (row kept, `published=false`, so the suppression set
    itself is auditable and the gate hashes both verdicts).

    Output: (cell_id, n_points, n_users, published).

    Scale: one exchange keyed on (cell, user) — Catalyst plans
    count(DISTINCT) as a two-phase expand/partial-agg, so per-partition
    duplicate (cell,user) pairs collapse map-side and the wire carries
    the distinct pair stream, the provable minimum for exact distinct
    counts; the per-cell rollup rides the same exchange. No second
    corpus pass, no sketch error — at publish grain, exactness is the
    point (a false "k met" is a privacy leak).
    """
    from cityfinder_spark.geo.cells import cell_col

    return (
        pts.select(
            cell_col(lat_col, lon_col, level).alias("cell_id"),
            F.col(user_col).alias("__u"),
        )
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("__u").alias("n_users"),
        )
        .select(
            "cell_id",
            "n_points",
            "n_users",
            (F.col("n_users") >= k).alias("published"),
        )
    )
