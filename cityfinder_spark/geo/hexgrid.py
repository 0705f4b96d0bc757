"""Hexagonal spatial grid (H3 analog) — the second index family the
north rule names ("H3/S2 index"). The square hierarchy in geo/cells.py
is the S2 analog; this module supplies the hex lattice: axial (q, r)
coordinates from lon/lat via exact cube rounding, packed into a
level-tagged 64-bit id compatible with the cell-id convention
(res * 2**54 + ...), plus the ring-neighbor expansion hex joins need.

Why hexagons at all (same reasons H3 exists): every neighbor is
equidistant (6 uniform neighbors vs the square grid's 4+4 at two
distances), so ring-based candidate search and density smoothing have
no diagonal bias. The lattice is FLAT (equirectangular degrees, like
the square grid here) — documented contract stance, identical in the
DuckDB oracle; geodesic corrections happen in the refine step
(haversine), exactly as with the square cells.

Geometry (pointy-top hexes, circumradius `s` degrees):
    q = (sqrt(3)/3 * lon - 1/3 * lat) / s
    r = (2/3 * lat) / s
Cube rounding (Amit Patel's canonical algorithm): round q, r,
y=-q-r to nearest integers with round-half-up (floor(x+0.5) — both
engines share the exact text; no banker's rounding), then repair the
axis with the largest rounding error so q+r+y == 0 holds.

Everything is closed-form double arithmetic in a fixed operand order,
so Spark columns and DuckDB SQL agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

from cityfinder_spark.sqlcompat import LEVEL_STRIDE

# sqrt(3)/3 and the axial basis constants, written once as literals so
# the Spark and DuckDB expressions carry the SAME double.
SQRT3_3 = "0.5773502691896258"
HEX_OFF = 1 << 21  # offset making packed q/r non-negative
HEX_PACK = 1 << 22  # stride for the packed (q, r) pair


def hex_id_sql(lat: str, lon: str, size_deg: float, res_tag: int) -> str:
    """DuckDB/ANSI text computing the hex cell id — the oracle twin of
    hex_id_col. size_deg is rendered with repr() so both engines parse
    the identical literal."""
    s = repr(float(size_deg))
    fq = f"(({SQRT3_3} * ({lon}) - 0.3333333333333333 * ({lat})) / {s})"
    fr = f"((0.6666666666666666 * ({lat})) / {s})"
    fy = f"(-({fq}) - ({fr}))"
    rq = f"cast(floor(({fq}) + 0.5) AS BIGINT)"
    rr = f"cast(floor(({fr}) + 0.5) AS BIGINT)"
    ry = f"cast(floor(({fy}) + 0.5) AS BIGINT)"
    dq = f"abs(({rq}) - ({fq}))"
    dr = f"abs(({rr}) - ({fr}))"
    dy = f"abs(({ry}) - ({fy}))"
    # repair: largest delta recomputed from the other two
    q = (
        f"(CASE WHEN ({dq}) > ({dr}) AND ({dq}) > ({dy})"
        f" THEN -({rr}) - ({ry}) ELSE ({rq}) END)"
    )
    r = (
        f"(CASE WHEN NOT (({dq}) > ({dr}) AND ({dq}) > ({dy}))"
        f" AND ({dr}) > ({dy})"
        f" THEN -({rq}) - ({ry}) ELSE ({rr}) END)"
    )
    return (
        f"(cast({res_tag} AS BIGINT) * {LEVEL_STRIDE}"
        f" + (({q}) + {HEX_OFF}) * {HEX_PACK} + (({r}) + {HEX_OFF}))"
    )


def hex_id_col(
    lat: str | Column, lon: str | Column, size_deg: float, res_tag: int
) -> Column:
    """Codegen'd Column form — same arithmetic text as hex_id_sql, so
    the two agree bit-for-bit (expr() on the shared string keeps the
    operand order literally identical)."""
    latn = lat if isinstance(lat, str) else None
    lonn = lon if isinstance(lon, str) else None
    if latn is None or lonn is None:
        raise ValueError("hex_id_col takes column NAMES (shared SQL text)")
    return F.expr(hex_id_sql(latn, lonn, size_deg, res_tag))


def hex_qr_np(
    lat: np.ndarray, lon: np.ndarray, size_deg: float
) -> tuple[np.ndarray, np.ndarray]:
    """NumPy twin (tests / driver fixtures): same constants, same
    round-half-up, same repair rule."""
    fq = (0.5773502691896258 * lon - 0.3333333333333333 * lat) / size_deg
    fr = (0.6666666666666666 * lat) / size_deg
    fy = -fq - fr
    rq = np.floor(fq + 0.5).astype(np.int64)
    rr = np.floor(fr + 0.5).astype(np.int64)
    ry = np.floor(fy + 0.5).astype(np.int64)
    dq, dr, dy = np.abs(rq - fq), np.abs(rr - fr), np.abs(ry - fy)
    fix_q = (dq > dr) & (dq > dy)
    fix_r = ~fix_q & (dr > dy)
    q = np.where(fix_q, -rr - ry, rq)
    r = np.where(fix_r, -rq - ry, rr)
    return q, r


def hex_pack_np(q: np.ndarray, r: np.ndarray, res_tag: int) -> np.ndarray:
    return res_tag * LEVEL_STRIDE + (q + HEX_OFF) * HEX_PACK + (r + HEX_OFF)


def hex_ring_ids(hex_id: int, k: int) -> np.ndarray:
    """All hex ids within hex-grid distance k (the H3 kRing analog):
    axial disc {(dq, dr): |dq|<=k, |dr|<=k, |dq+dr|<=k} — 1+3k(k+1)
    cells, each a TRUE equidistant neighbor class (no diagonal bias)."""
    res = int(hex_id // LEVEL_STRIDE)
    rem = int(hex_id % LEVEL_STRIDE)
    q = rem // HEX_PACK - HEX_OFF
    r = rem % HEX_PACK - HEX_OFF
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append(
                res * LEVEL_STRIDE
                + (q + dq + HEX_OFF) * HEX_PACK
                + (r + dr + HEX_OFF)
            )
    return np.array(out, dtype=np.int64)


def hex_ring_col(hex_col: Column, k: int) -> Column:
    """array<long> of the axial disc around each row's hex id — pure
    Column (explodable), for ring-blocked hex joins. Mirrors
    hex_ring_ids; disc size 1+3k(k+1)."""
    res = (hex_col / F.lit(LEVEL_STRIDE)).cast("long")
    rem = hex_col - res * LEVEL_STRIDE
    q = (rem / HEX_PACK).cast("long") - HEX_OFF
    r = F.pmod(rem, F.lit(HEX_PACK)) - HEX_OFF
    offs = F.expr(
        f"flatten(transform(sequence({-k},{k}), dq -> "
        f"transform(sequence(greatest({-k}, -dq - {k}), least({k}, -dq + {k})),"
        f" dr -> struct(dq, dr))))"
    )
    return F.transform(
        offs,
        lambda o: res * LEVEL_STRIDE
        + (q + o["dq"] + HEX_OFF) * HEX_PACK
        + (r + o["dr"] + HEX_OFF),
    )
