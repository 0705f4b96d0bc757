"""S2-style region covering: approximate a polygon with a minimal set
of MIXED-LEVEL hierarchical cells, then drive point-in-polygon reads
off the cover so the exact ray-cast runs ONLY on boundary-cell rows.

The reference's S2 library does exactly this internally
(RegionCoverer behind the ShapeIndex the reference builds at
lib/finder/coordinates/s2.go:33-49); the reference never exposes it,
but the north star names "S2 cell covering" as a required capability,
and at 10^12 rows it IS the point-in-polygon scale plan:

  * `region_cover` is dimension-side metadata — a few hundred cells
    per polygon, computed once from the (tiny) polygon table and
    broadcast. Nothing fact-sized is touched.
  * `cover_read` tags fact rows by a broadcast equi-join on cell_id.
    Rows landing in FULL cells are accepted with zero per-row
    geometry; only rows in PARTIAL (boundary) cells pay the exact
    even-odd ray cast. The boundary fraction shrinks as
    cell_size/polygon_size -> 0, so the exact-test cost scales with
    the polygon PERIMETER measured in max-level cells, not with the
    fact-row count times polygon count.

Classification contract (exact for simple polygons, no sampling):
a candidate cell is
  * `full`    iff all 4 corners are inside (even-odd ray cast) AND
    no polygon vertex lies in the cell AND no polygon edge crosses a
    cell border — exact containment for arbitrary simple polygons
    (the extra witnesses cost nothing and close the non-convex
    "bite" case);
  * `partial` iff not full AND (>=1 corner inside, OR >=1 polygon
    vertex inside the cell, OR >=1 polygon edge properly crossing a
    cell border segment). For simple polygons this is exactly
    "intersects": any nonempty intersection exhibits one of the
    three witnesses (a band/sliver crossing produces border
    crossings even when no corner or vertex is interior).
  * cells are emitted top-down: a full cell suppresses all its
    descendants; partial cells are refined until `max_level`, where
    they are emitted as the boundary set. The emitted cover is
    therefore DISJOINT and every polygon point lies in exactly one
    cover cell.

Everything is relational (codegen'd column arithmetic + two
dimension-side joins) — no UDFs, no driver loops — so the DuckDB
oracle replays the construction operation-for-operation and the
`cover_read` output is value-hash-identical to the plain
`point_in_polygon` contract query, cross-validating the cover's
exactness every round.

Antimeridian stance: input polygons must NOT cross the +-180 meridian
(pre-split them, the standard GeoJSON convention) — a crossing ring's
raw lon bbox would span the whole circle and the candidate j-range
has no wrap branch. The fact-side cell computation DOES wrap (pmod),
so split halves cover and read correctly. box_range_join is the
operator family with first-class wrap if unsplit boxes are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cityfinder_spark.sqlcompat import LEVEL_STRIDE

COVER_MIN_LEVEL = 4
COVER_MAX_LEVEL = 7


def _polygon_edges(polygons: DataFrame) -> DataFrame:
    """(polygon_id, country, y1, x1, y2, x2) — one row per directed
    polygon edge, built in-array (single pass, no self-join)."""
    n = "size(ring_lats)"
    return (
        polygons.select(
            "polygon_id",
            "country",
            F.expr(
                f"transform(sequence(0, {n} - 1), k -> struct("
                f"ring_lats[k] AS y1, ring_lons[k] AS x1, "
                f"ring_lats[(k + 1) % {n}] AS y2, "
                f"ring_lons[(k + 1) % {n}] AS x2))"
            ).alias("edges"),
        )
        .select("polygon_id", "country", F.explode("edges").alias("e"))
        .select("polygon_id", "country", "e.y1", "e.x1", "e.y2", "e.x2")
    )


def _crosses(cy, cx) -> F.Column:
    """Even-odd ray-cast crossing indicator for corner (cy, cx) vs the
    edge row (y1,x1)-(y2,x2): horizontal ray in +lon direction. Same
    arithmetic (and operand order) as point_in_polygon_np and the
    DuckDB PIP oracle, so all three agree bit-for-bit."""
    y1, x1, y2, x2 = F.col("y1"), F.col("x1"), F.col("y2"), F.col("x2")
    return (
        ((y1 > cy) != (y2 > cy)) & (cx < (x2 - x1) * (cy - y1) / (y2 - y1) + x1)
    ).cast("int")


def _ccw(ay, ax, by, bx, cy, cx) -> F.Column:
    """Orientation sign of (A->B->C): cross((B-A),(C-A)) > 0."""
    return ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) > 0


def _seg_cross(py1, px1, py2, px2) -> F.Column:
    """Proper-crossing test of cell border segment P1-P2 vs the edge
    row (y1,x1)-(y2,x2). Strict orientation flips on both segments;
    collinear touches don't count (fixture geometry has none)."""
    qy1, qx1, qy2, qx2 = F.col("y1"), F.col("x1"), F.col("y2"), F.col("x2")
    return (
        (_ccw(qy1, qx1, qy2, qx2, py1, px1) != _ccw(qy1, qx1, qy2, qx2, py2, px2))
        & (_ccw(py1, px1, py2, px2, qy1, qx1) != _ccw(py1, px1, py2, px2, qy2, qx2))
    ).cast("int")


def _candidate_cells(polygons: DataFrame, min_level: int, max_level: int) -> DataFrame:
    """All cells whose bbox intersects the polygon bbox, at every
    level in [min_level, max_level]: (polygon_id, country, level, i,
    j, lat0, lat1, lon0, lon1). Cell size 180/2**level degrees is an
    exact binary double, so the bounds arithmetic is reproducible."""
    p = polygons.select(
        "polygon_id",
        "country",
        F.array_min("ring_lats").alias("blat0"),
        F.array_max("ring_lats").alias("blat1"),
        F.array_min("ring_lons").alias("blon0"),
        F.array_max("ring_lons").alias("blon1"),
    )
    lv = p.select(
        "*", F.explode(F.sequence(F.lit(min_level), F.lit(max_level))).alias("level")
    )
    s = F.expr("180.0 / cast(shiftleft(1, level) AS double)")
    nlat = F.expr("cast(shiftleft(1, level) AS long)")
    nlon = F.expr("cast(shiftleft(2, level) AS long)")
    clampi = lambda c: F.least(F.greatest(c, F.lit(0).cast("long")), nlat - 1)  # noqa: E731
    clampj = lambda c: F.least(F.greatest(c, F.lit(0).cast("long")), nlon - 1)  # noqa: E731
    ranged = lv.select(
        "polygon_id",
        "country",
        "level",
        clampi(F.floor((F.col("blat0") + 90.0) / s)).alias("i0"),
        clampi(F.floor((F.col("blat1") + 90.0) / s)).alias("i1"),
        clampj(F.floor((F.col("blon0") + 180.0) / s)).alias("j0"),
        clampj(F.floor((F.col("blon1") + 180.0) / s)).alias("j1"),
        s.alias("s"),
    )
    return (
        ranged.select(
            "polygon_id",
            "country",
            "level",
            "s",
            F.explode(F.sequence("i0", "i1")).alias("i"),
            "j0",
            "j1",
        )
        .select(
            "polygon_id",
            "country",
            "level",
            "s",
            "i",
            F.explode(F.sequence("j0", "j1")).alias("j"),
        )
        .select(
            "polygon_id",
            "country",
            "level",
            "i",
            "j",
            (F.col("i") * F.col("s") - 90.0).alias("lat0"),
            ((F.col("i") + 1) * F.col("s") - 90.0).alias("lat1"),
            (F.col("j") * F.col("s") - 180.0).alias("lon0"),
            ((F.col("j") + 1) * F.col("s") - 180.0).alias("lon1"),
        )
    )


def classify_cells(polygons: DataFrame, min_level: int, max_level: int) -> DataFrame:
    """Candidate cells with exact classification:
    (polygon_id, country, level, i, j, lat0..lon1, n_corners_in
    [0..4], has_vertex, has_cross). One dimension-side join
    (candidates x 6 edges) + one aggregate."""
    cand = _candidate_cells(polygons, min_level, max_level)
    edges = _polygon_edges(polygons).drop("country")
    lat0, lat1 = F.col("lat0"), F.col("lat1")
    lon0, lon1 = F.col("lon0"), F.col("lon1")
    joined = cand.join(edges, "polygon_id").select(
        "polygon_id",
        "country",
        "level",
        "i",
        "j",
        "lat0",
        "lat1",
        "lon0",
        "lon1",
        _crosses(lat0, lon0).alias("c00"),
        _crosses(lat0, lon1).alias("c01"),
        _crosses(lat1, lon0).alias("c10"),
        _crosses(lat1, lon1).alias("c11"),
        (
            F.col("y1").between(lat0, lat1) & F.col("x1").between(lon0, lon1)
        ).cast("int").alias("vin"),
        F.greatest(
            _seg_cross(lat0, lon0, lat0, lon1),  # south border
            _seg_cross(lat1, lon0, lat1, lon1),  # north border
            _seg_cross(lat0, lon0, lat1, lon0),  # west border
            _seg_cross(lat0, lon1, lat1, lon1),  # east border
        ).alias("ecross"),
    )
    agg = joined.groupBy(
        "polygon_id", "country", "level", "i", "j", "lat0", "lat1", "lon0", "lon1"
    ).agg(
        (
            F.pmod(F.sum("c00"), F.lit(2))
            + F.pmod(F.sum("c01"), F.lit(2))
            + F.pmod(F.sum("c10"), F.lit(2))
            + F.pmod(F.sum("c11"), F.lit(2))
        ).alias("n_corners_in"),
        (F.max("vin") == 1).alias("has_vertex"),
        (F.max("ecross") == 1).alias("has_cross"),
    )
    return agg


def region_cover(
    polygons: DataFrame,
    *,
    min_level: int = COVER_MIN_LEVEL,
    max_level: int = COVER_MAX_LEVEL,
) -> DataFrame:
    """The mixed-level cover: (polygon_id, country, level, cell_id,
    coverage in {'full','partial'}). Disjoint per polygon; full cells
    suppress descendants (anti-join on the exploded ancestor list —
    at most max_level-min_level ancestors per cell, all dimension-
    side)."""
    cls = classify_cells(polygons, min_level, max_level)
    cls = cls.withColumn(
        "coverage",
        F.when(
            (F.col("n_corners_in") == 4)
            & ~F.col("has_vertex")
            & ~F.col("has_cross"),
            F.lit("full"),
        ).when(
            (F.col("n_corners_in") > 0) | F.col("has_vertex") | F.col("has_cross"),
            F.lit("partial"),
        ),
    ).where(F.col("coverage").isNotNull())
    full = cls.where(F.col("coverage") == "full").select(
        "polygon_id",
        F.col("level").alias("alevel"),
        F.col("i").alias("ai"),
        F.col("j").alias("aj"),
    )
    emit = cls.where(
        (F.col("coverage") == "full")
        | ((F.col("coverage") == "partial") & (F.col("level") == max_level))
    )
    # ancestor list: (alevel, ai, aj) for alevel in [min_level, level)
    anc = emit.select(
        "polygon_id",
        "country",
        "level",
        "i",
        "j",
        "coverage",
        F.explode(
            # sequence(a, b) with a > b is DESCENDING in Spark, not
            # empty — an unguarded sequence(min_level, level-1) would
            # hand min-level cells themselves as their own "ancestor"
            # and self-suppress every min-level full cell (caught by
            # tests/test_cover_adversarial.py on polygons big enough
            # to produce one)
            F.expr(
                f"transform(if(level > {min_level},"
                f" sequence({min_level}, level - 1), array()),"
                " a -> struct("
                "a AS alevel, "
                "shiftright(i, cast(level - a AS int)) AS ai, "
                "shiftright(j, cast(level - a AS int)) AS aj))"
            )
        ).alias("anc"),
    ).select("polygon_id", "level", "i", "j", "anc.alevel", "anc.ai", "anc.aj")
    blocked = anc.join(
        F.broadcast(full), ["polygon_id", "alevel", "ai", "aj"]
    ).select("polygon_id", "level", "i", "j").distinct()
    kept = emit.join(
        F.broadcast(blocked), ["polygon_id", "level", "i", "j"], "left_anti"
    )
    nlon = F.expr("cast(shiftleft(2, level) AS long)")
    return kept.select(
        "polygon_id",
        "country",
        "level",
        (
            F.col("level").cast("long") * F.lit(LEVEL_STRIDE)
            + F.col("i") * nlon
            + F.col("j")
        ).alias("cell_id"),
        "coverage",
    )


def cover_read(
    points: DataFrame,
    polygons: DataFrame,
    *,
    min_level: int = COVER_MIN_LEVEL,
    max_level: int = COVER_MAX_LEVEL,
    id_col: str = "pt_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    cache_key: tuple | None = None,
) -> DataFrame:
    """Point-in-polygon via the cover: (id_col, polygon_id,
    poly_country), value-identical to tag_points_with_polygons but
    with the exact ray cast confined to boundary-cell rows.

    Fact-side plan: ONE projection computes the row's cell id at
    every cover level (an array + explode, max_level-min_level+1
    entries), ONE broadcast equi-join on cell_id picks up coverage
    (partial cells carry their polygon's 6-edge array in the
    broadcast row), and the exact even-odd test is an IN-ROW integer
    fold over that array — a stateless projection, so the operator is
    completely exchange-free on the fact side and runs unchanged on a
    micro-batch stream. Full-cell matches — the polygon interior, the
    overwhelming share as levels deepen — skip even that fold."""
    from cityfinder_spark.bcast import memo_table

    def _build_cover() -> DataFrame:
        cov = region_cover(polygons, min_level=min_level, max_level=max_level)
        n = "size(ring_lats)"
        edge_arrays = polygons.select(
            "polygon_id",
            F.expr(
                f"transform(sequence(0, {n} - 1), k -> struct("
                f"ring_lats[k] AS y1, ring_lons[k] AS x1, "
                f"ring_lats[(k + 1) % {n}] AS y2, "
                f"ring_lons[(k + 1) % {n}] AS x2))"
            ).alias("edges"),
        )
        # partial cells carry their polygon's edge array so the exact
        # test is an in-row fold — no fact-side exchange, streaming-safe
        return cov.join(edge_arrays, "polygon_id").withColumn(
            "edges", F.when(F.col("coverage") == "partial", F.col("edges"))
        )

    # the cover is a stored-artifact-shaped dimension table (built once
    # per polygon set, reused by every read) — memoize like the other
    # broadcast indexes instead of rebuilding its ~10-stage subtree per
    # query (cache_key=None keeps the uncached behavior)
    cover = memo_table(
        polygons.sparkSession,
        None if cache_key is None else ("region-cover", *cache_key),
        _build_cover,
    )
    lat, lon = F.col(lat_col), F.col(lon_col)
    cells = F.expr(
        f"transform(sequence({min_level}, {max_level}), l -> "
        f"cast(l AS bigint) * {LEVEL_STRIDE}"
        f" + least(greatest(cast(floor(({lat_col} + 90.0) / (180.0 / cast(shiftleft(1, l) AS double))) AS bigint), 0),"
        f" cast(shiftleft(1, l) AS bigint) - 1) * cast(shiftleft(2, l) AS bigint)"
        f" + pmod(cast(floor(({lon_col} + 180.0) / (180.0 / cast(shiftleft(1, l) AS double))) AS bigint),"
        f" cast(shiftleft(2, l) AS bigint)))"
    )
    tagged = (
        points.select(id_col, lat_col, lon_col, F.explode(cells).alias("cell_id"))
        .join(F.broadcast(cover), "cell_id")
    )

    def _edge_crossing(e) -> F.Column:
        """Per-edge crossing indicator — the arithmetic of _crosses
        with the edge fields drawn from the in-row struct."""
        y1, x1, y2, x2 = e["y1"], e["x1"], e["y2"], e["x2"]
        return (
            ((y1 > lat) != (y2 > lat))
            & (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)
        ).cast("int")

    # even-odd parity as an in-row fold over the 6-edge array: integer
    # sum (order-free), then mod 2 — a pure stateless projection, so
    # the whole operator is exchange-free on the fact side and runs
    # UNCHANGED on a micro-batch stream (q_streaming_cover_read)
    parity = F.pmod(
        F.aggregate(F.col("edges"), F.lit(0), lambda acc, e: acc + _edge_crossing(e)),
        F.lit(2),
    )
    return tagged.where(
        (F.col("coverage") == "full") | (parity == 1)
    ).select(id_col, "polygon_id", F.col("country").alias("poly_country"))
