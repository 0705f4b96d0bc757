"""Per-entity trajectory statistics over geotagged rows.

Movement analytics over the image+caption fact table: order each
entity's points by a sequence key, measure consecutive great-circle
steps, roll up path length / step extremes per entity. The classic
GPS/geotag post-processing stage (trip length, teleport detection).

Scale shape: ONE exchange — the hash partition by entity that the LAG
window needs — then pure codegen (shared-text haversine, floor-form
rounding). Aggregates are ORDER-FREE on purpose: each step is rounded
to integer tenth-of-meter micro-units (floor(hav * 10^4 + 0.5), the
same IEEE sequence as sqlcompat.haversine_rounded_sql) and summed as
integers, so the distributed sum is bit-identical to any replay —
a float sum over window rows would accumulate in partition order and
could flip the last rounded digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cityfinder_spark import sqlcompat as sc

_SCALE = 10**sc.ROUND_DIGITS


def trajectory_stats(
    points: DataFrame,
    entity_col: str = "cust_id",
    order_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """-> (entity, n_points, total_km, max_step_km, min_step_km):
    consecutive-step haversine stats per entity, steps ordered by
    `order_col` (ties impossible when it is a row id). Entities with a
    single point report 0 steps -> 0.0 km everywhere."""
    w = Window.partitionBy(entity_col).orderBy(order_col)
    plat = F.lag(lat_col).over(w)
    plon = F.lag(lon_col).over(w)
    step_um = F.expr(
        f"cast(floor({sc.haversine_sql(lat_col, lon_col, '__plat', '__plon')}"
        f" * {_SCALE}.0 + 0.5) as bigint)"
    )
    steps = points.select(
        F.col(entity_col).alias("entity"),
        F.col(lat_col),
        F.col(lon_col),
        plat.alias("__plat"),
        plon.alias("__plon"),
    ).withColumn("__um", F.when(F.col("__plat").isNull(), None).otherwise(step_um))
    return steps.groupBy("entity").agg(
        F.count(F.lit(1)).alias("n_points"),
        (
            F.coalesce(F.sum("__um"), F.lit(0)) / F.lit(float(_SCALE))
        ).alias("total_km"),
        (
            F.coalesce(F.max("__um"), F.lit(0)) / F.lit(float(_SCALE))
        ).alias("max_step_km"),
        (
            F.coalesce(F.min("__um"), F.lit(0)) / F.lit(float(_SCALE))
        ).alias("min_step_km"),
    )


def trajectory_stays(
    points: DataFrame,
    entity_col: str = "cust_id",
    order_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    r_km: float = 4000.0,
    min_pts: int = 2,
) -> DataFrame:
    """Stay-point detection per entity: maximal runs of consecutive
    points whose step distance stays within `r_km`, emitted as
    (entity, stay_id, n_points, start_ord, end_ord, center_lat,
    center_lon) for runs of >= min_pts points — the GPS/geotag
    "where did this device linger" primitive (home/POI detection,
    burst-upload grouping for image streams).

    Determinism at any parallelism: the break predicate compares the
    INTEGER micro-unit step (same floor-form rounding as
    trajectory_stats) against an integer radius, stay_id is a running
    integer sum of breaks, and the centroid divides integer
    micro-degree sums — no float accumulates across rows anywhere, so
    the DuckDB window replay matches bit-for-bit.

    Scale shape: the same ONE entity-keyed exchange as
    trajectory_stats (the LAG/running-sum window), then a stay-grain
    groupBy whose partial aggregation collapses each run map-side —
    the second exchange carries <= |stays| rows. Per-task state is one
    entity's track; parallelism = |entities|."""
    r_um = int(r_km * _SCALE + 0.5)
    w = Window.partitionBy(entity_col).orderBy(order_col)
    plat = F.lag(lat_col).over(w)
    plon = F.lag(lon_col).over(w)
    step_um = F.expr(
        f"cast(floor({sc.haversine_sql(lat_col, lon_col, '__plat', '__plon')}"
        f" * {_SCALE}.0 + 0.5) as bigint)"
    )
    lat_ud = F.expr(f"cast(floor({lat_col} * 1000000.0 + 0.5) as bigint)")
    lon_ud = F.expr(f"cast(floor({lon_col} * 1000000.0 + 0.5) as bigint)")
    staged = (
        points.select(
            F.col(entity_col).alias("entity"),
            F.col(order_col).alias("__ord"),
            F.col(lat_col),
            F.col(lon_col),
            plat.alias("__plat"),
            plon.alias("__plon"),
        )
        .withColumn(
            "__break",
            F.when(F.col("__plat").isNull(), F.lit(1))
            .when(step_um > F.lit(r_um), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "stay_id",
            F.sum("__break").over(
                Window.partitionBy("entity").orderBy("__ord")
            ),
        )
    )
    return (
        staged.groupBy("entity", "stay_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("__ord").alias("start_ord"),
            F.max("__ord").alias("end_ord"),
            F.sum(lat_ud).alias("__slat"),
            F.sum(lon_ud).alias("__slon"),
        )
        .where(F.col("n_points") >= F.lit(min_pts))
        .select(
            "entity",
            "stay_id",
            "n_points",
            "start_ord",
            "end_ord",
            (
                F.col("__slat")
                / (F.col("n_points") * F.lit(1000000.0))
            ).alias("center_lat"),
            (
                F.col("__slon")
                / (F.col("n_points") * F.lit(1000000.0))
            ).alias("center_lon"),
        )
    )


def od_flows(
    pts: DataFrame,
    level: int,
    k_anon: int,
    cust_col: str = "cust_id",
    seq_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Origin-destination flow matrix over the cell lattice — the
    mobility product every geo platform publishes (commute matrices,
    traffic flows), with k-anonymity suppression built in (OD
    matrices are the canonical re-identification surface: a rare
    home->work cell pair IS a person, so a publish gate is not
    optional — same stance as hotspots.kanon_cells).

    Each entity's track, ordered by `seq_col`, contributes one
    (origin_cell, dest_cell) transition per consecutive point pair
    (self-loops kept — stays are real flows). Per OD pair:
    n_trips, n_users (DISTINCT entities), published := n_users >= k.

    Scale: one entity-keyed exchange (the LAG window — same hash as
    trajectory_stats, Catalyst reuses it when composed) + one
    map-side-combined (o,d)-keyed count/distinct agg whose exchange
    carries the distinct (o, d, entity) stream — the exact-distinct
    minimum, as kanon_cells. Grid-bounded output."""
    from cityfinder_spark.geo.cells import cell_col

    w = Window.partitionBy(cust_col).orderBy(seq_col)
    cells = pts.select(
        cust_col,
        seq_col,
        cell_col(lat_col, lon_col, level).alias("d_cell"),
    )
    edges = (
        cells.withColumn("o_cell", F.lag("d_cell").over(w))
        .where(F.col("o_cell").isNotNull())
        .select(cust_col, "o_cell", "d_cell")
    )
    return (
        edges.groupBy("o_cell", "d_cell")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.countDistinct(cust_col).alias("n_users"),
        )
        .select(
            "o_cell",
            "d_cell",
            "n_trips",
            "n_users",
            (F.col("n_users") >= k_anon).alias("published"),
        )
    )


def geofence_events(
    points: DataFrame,
    polygons: DataFrame,
    *,
    entity_col: str = "cust_id",
    order_col: str = "pt_id",
) -> DataFrame:
    """Geofence ENTER/EXIT detection — the standard mobility alerting
    workload: for every (entity, fence) pair, emit a transition event
    whenever the entity's track crosses the fence boundary between
    consecutive observations. An 'enter' is an inside-observation whose
    predecessor (in the entity's own sequence) was not inside that
    fence; an 'exit' is an inside-observation whose successor is not.
    Episodes are inclusive: a track that starts (ends) inside opens
    (closes) an episode at its first (last) observation.

    Scale shape: ONE entity-keyed window assigns per-track sequence
    numbers (parallelism = |entities|, the trajectory_stats stance);
    containment tags come from the broadcast PIP join, so only
    INSIDE rows — not points x fences — reach the per-(entity, fence)
    LAG/LEAD window, whose partition is at most one track's inside
    segment. Everything integer, order-free, replayable.

    Output: (entity_col, polygon_id, event in {enter, exit}, seq).
    """
    from cityfinder_spark.operators.point_in_polygon import (
        tag_points_with_polygons,
    )

    seqw = Window.partitionBy(entity_col).orderBy(order_col)
    pts = points.withColumn("seq", F.row_number().over(seqw))
    tagged = tag_points_with_polygons(pts, polygons).select(
        entity_col, "polygon_id", "seq"
    )
    w2 = Window.partitionBy(entity_col, "polygon_id").orderBy("seq")
    ev = tagged.select(
        entity_col,
        "polygon_id",
        "seq",
        F.lag("seq").over(w2).alias("prev_seq"),
        F.lead("seq").over(w2).alias("next_seq"),
    )
    enters = ev.where(
        F.col("prev_seq").isNull() | (F.col("prev_seq") != F.col("seq") - 1)
    ).select(entity_col, "polygon_id", F.lit("enter").alias("event"), "seq")
    exits = ev.where(
        F.col("next_seq").isNull() | (F.col("next_seq") != F.col("seq") + 1)
    ).select(entity_col, "polygon_id", F.lit("exit").alias("event"), "seq")
    return enters.unionByName(exits)
