"""Hierarchical spatial cell grid (S2/H3 analog) — the engine's spatial
index key.

Replaces the reference's s2.ShapeIndex cell decomposition
(lib/finder/coordinates/s2.go:17-20,45-46): instead of an in-process
tree, every row (fact image or dimension city) gets a `cell_id` column
and the kNN prune becomes a broadcast equi-join on that key.

Grid at level L: 2**L latitude bands x 2**(L+1) longitude columns —
square cells of 180/2**L degrees per side. cell_id = L*2**54 + i*nlon+j
(level tag keeps mixed-level ids distinct for adaptive cell split).

Three interchangeable implementations, tested for parity:
  * Column expression (JVM, whole-stage codegen) — the hot path;
  * vectorized pandas UDF (Arrow-batched NumPy) — the API the input
    hint mandates for per-row compute, and the fallback when the
    expression form isn't usable;
  * plain NumPy — for tests / driver-side fixtures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from cityfinder_spark.sqlcompat import LEVEL_STRIDE

KM_PER_DEG = 111.19492664455873  # pi/180 * 6371


def grid_dims(level: int) -> tuple[int, int]:
    return 1 << level, 2 << level


def cell_size_deg(level: int) -> float:
    return 180.0 / (1 << level)


# ---------- NumPy ----------

def cell_of_np(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    nlat, nlon = grid_dims(level)
    i = np.clip(np.floor((lat + 90.0) / 180.0 * nlat).astype(np.int64), 0, nlat - 1)
    j = np.floor((lon + 180.0) / 360.0 * nlon).astype(np.int64) % nlon
    return level * LEVEL_STRIDE + i * nlon + j


def decode_cell_np(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell_id -> (level, i, j)."""
    level = cell_id // LEVEL_STRIDE
    rem = cell_id % LEVEL_STRIDE
    nlon = np.left_shift(2, level.astype(np.int64))
    return level, rem // nlon, rem % nlon


def ring_neighbors_np(cell_id: int, k: int) -> np.ndarray:
    """All cell ids within Chebyshev distance k (lon wraps, lat clamps).
    Replaces ClosestEdgeQuery's internal neighbor traversal
    (reference s2.go:57-59)."""
    level = int(cell_id // LEVEL_STRIDE)
    nlat, nlon = grid_dims(level)
    rem = int(cell_id % LEVEL_STRIDE)
    i, j = rem // nlon, rem % nlon
    di, dj = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    ii = (i + di).ravel()
    jj = (j + dj).ravel() % nlon
    keep = (ii >= 0) & (ii < nlat)
    return level * LEVEL_STRIDE + ii[keep] * nlon + jj[keep]


def certainty_radius_np(lat: np.ndarray, k: int, level: int) -> np.ndarray:
    """NumPy twin of certainty_radius_col (same formula, same IEEE ops
    modulo libm ulps — both sides round results before comparisons)."""
    from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM

    h = cell_size_deg(level)
    lat_bound = k * h * KM_PER_DEG
    dlon = np.radians(min(k * h, 90.0))
    lon_bound = EARTH_RADIUS_KM * np.arcsin(
        np.sin(dlon) * np.maximum(0.0, np.cos(np.radians(lat)))
    )
    return np.minimum(lat_bound, np.maximum(lon_bound, 0.0))


# ---------- Spark Column expressions (hot path) ----------

def cell_col(lat: str | Column, lon: str | Column, level: int) -> Column:
    """Same arithmetic as sqlcompat.cell_sql, as a codegen'd Column."""
    nlat, nlon = grid_dims(level)
    latc = F.col(lat) if isinstance(lat, str) else lat
    lonc = F.col(lon) if isinstance(lon, str) else lon
    i = F.least(
        F.greatest(F.floor((latc + 90.0) / 180.0 * nlat).cast("long"), F.lit(0)),
        F.lit(nlat - 1),
    )
    j = F.pmod(F.floor((lonc + 180.0) / 360.0 * nlon).cast("long"), F.lit(nlon))
    return F.lit(level).cast("long") * F.lit(LEVEL_STRIDE) + i * nlon + j


def ring_cells_col(cell: Column, k: int, level: int) -> Column:
    """array<long> of ring-k neighbor cells — pure Column (explodable),
    used on the small broadcast side when building the cover table."""
    nlat, nlon = grid_dims(level)
    base = cell - F.lit(level * LEVEL_STRIDE)
    i = (base / nlon).cast("long")
    j = F.pmod(base, F.lit(nlon))
    offs = F.expr(
        f"flatten(transform(sequence({-k},{k}), di -> "
        f"transform(sequence({-k},{k}), dj -> struct(di, dj))))"
    )
    cells = F.transform(
        offs,
        lambda o: F.when(
            (i + o["di"] >= 0) & (i + o["di"] < nlat),
            F.lit(level * LEVEL_STRIDE)
            + (i + o["di"]) * nlon
            + F.pmod(j + o["dj"], F.lit(nlon)),
        ),
    )
    return F.filter(cells, lambda c: c.isNotNull())


def certainty_radius_col(lat: str | Column, k: int, level: int) -> Column:
    """Lower bound (km) on the distance from a point at latitude `lat`
    to ANY point outside its ring-k neighborhood (SURVEY.md §7.3 —
    the ring-expansion completeness proof). If the best in-ring
    candidate is closer than this, it is the global nearest.

      lat axis: a non-candidate differs by > k bands -> its meridian
        arc from the point is >= k*h degrees (exact).
      lon axis: a non-candidate differs by > k columns, i.e. lies in
        the region |dlon| >= k*w. That region's complement is the open
        lune around the point's meridian, so any non-candidate is
        separated from the point by the lune's boundary half-meridians
        at +-k*w — and the distance from P=(phi,0) to the meridian
        great circle at dlon is the cross-track arc
        R*asin(sin(dlon)*cos(phi)). Using the point's OWN latitude
        (not the ring's extreme band) makes this bound ~5-8x tighter
        at mid-latitudes, collapsing the fallback-escalation fraction.

    Near the poles cos(phi) -> 0 and the bound -> 0: those rows simply
    escalate to the exact fallback (correct, tiny fraction).
    """
    from cityfinder_spark.sqlcompat import EARTH_RADIUS_KM

    h = cell_size_deg(level)
    latc = lat if not isinstance(lat, str) else F.col(lat)
    lat_bound = F.lit(k * h * KM_PER_DEG)
    dlon = np.radians(min(k * h, 90.0))
    lon_bound = F.lit(EARTH_RADIUS_KM) * F.asin(
        F.lit(np.sin(dlon)) * F.greatest(F.lit(0.0), F.cos(F.radians(latc)))
    )
    return F.least(lat_bound, F.greatest(lon_bound, F.lit(0.0)))


# ---------- pandas UDFs (Arrow-vectorized, input-hint mandated API) ----------

def make_cell_udf(level: int):
    """cell_of(lat, lon) -> long as an Arrow-batched pandas UDF."""

    @F.pandas_udf(T.LongType())
    def cell_of(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = cell_of_np(lat.to_numpy(np.float64), lon.to_numpy(np.float64), level)
        return pd.Series(out)

    return cell_of


def make_ring_udf(k: int):
    """ring_neighbors(cell_id) -> array<long> pandas UDF."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def ring_of(cell: pd.Series) -> pd.Series:
        return cell.map(lambda c: ring_neighbors_np(int(c), k).tolist())

    return ring_of


# ---------- Z-order (Morton) spatial storage keys ----------

ZORDER_BITS = 16  # 2^16 bands x 2^16 cols ~ 2.7 m x 600 m cells at the equator

# magic-number bit spread: 16 bits -> even bit positions of 32
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c: Column) -> Column:
    """Interleave-ready spread of a 16-bit int into even bit positions
    (the classic magic-mask chain) — pure codegen shifts/ands, and
    exactly the same five integer steps in the DuckDB oracle."""
    for sh, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def zorder_col(
    lat: str | Column, lon: str | Column, bits: int = ZORDER_BITS
) -> Column:
    """Morton (Z-order) key interleaving the latitude-band and
    longitude-column indices at 2^bits resolution — the SPATIAL
    STORAGE LAYOUT key: sorting a table by this key co-locates spatial
    neighbors into the same parquet row groups, so min/max column
    statistics prune scans for any cell/bbox/radius predicate (the
    Iceberg/Delta z-ordering story, here as a plain codegen column).

    Unlike cell_id (one level's equality key), the z-key is a TOTAL
    ORDER whose prefixes are the whole cell pyramid at once: any
    level-L cell is a contiguous key range, so range predicates
    replace equality joins for storage pruning. bits <= 16 keeps the
    interleaved key in 32 bits (fits long with headroom); the bit
    spread is the branch-free magic-mask chain, identical in Spark
    codegen and the SQL oracle."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    n = 1 << bits
    latc = F.col(lat) if isinstance(lat, str) else lat
    lonc = F.col(lon) if isinstance(lon, str) else lon
    yi = F.least(
        F.greatest(F.floor((latc + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    xi = F.pmod(F.floor((lonc + 180.0) / 360.0 * n).cast("long"), F.lit(n))
    return (
        _spread_bits(xi)
        .bitwiseOR(F.shiftleft(_spread_bits(yi), 1))
        .alias("zorder")
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_col(
    lat: str | Column, lon: str | Column, precision: int = 6
) -> Column:
    """Standard GEOHASH string key (Niemeyer base32) at `precision`
    chars — the interoperable spatial key every geo stack speaks
    (Elasticsearch geohash_grid, Redis GEO, BigQuery ST_GEOHASH),
    complementing the engine-internal z-order key: same
    prefix-is-a-containing-cell property, but as a lexicographic
    STRING, so external systems join/prefix-filter on it directly.

    The textbook bisection is exactly MSB-first fixed-point
    quantization, so the whole key is branch-free codegen: quantize
    lat/lon to `5*precision/2` bits each, interleave with the
    magic-mask spread (longitude takes the high bit of each pair —
    the geohash convention, the mirror of zorder_col's lat-high), and
    map 5-bit groups through the base32 alphabet via element_at.
    Even precisions only (equal lat/lon bits <= 16: 2, 4, or 6
    chars); 6 chars ~= 0.6 km cells. Replayed bit-for-bit in SQL."""
    if precision not in (2, 4, 6):
        raise ValueError("precision must be 2, 4 or 6 (equal-bit splits)")
    half = 5 * precision // 2
    n = 1 << half
    latc = F.col(lat) if isinstance(lat, str) else lat
    lonc = F.col(lon) if isinstance(lon, str) else lon
    yi = F.least(
        F.greatest(F.floor((latc + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    xi = F.pmod(F.floor((lonc + 180.0) / 360.0 * n).cast("long"), F.lit(n))
    z = _spread_bits(yi).bitwiseOR(F.shiftleft(_spread_bits(xi), 1))
    alpha = F.array(*[F.lit(c) for c in GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            alpha,
            (
                F.shiftrightunsigned(z, 5 * (precision - 1 - j))
                .bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for j in range(precision)
    ]
    return F.concat(*chars).alias("geohash")
