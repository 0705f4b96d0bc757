"""Density-tile rendering (operators/tiles.py): pixel-count math,
integer intensity scaling, and the real-PNG encode/decode loop."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cityfinder_spark.codecs.fakeimage import decode_real
from cityfinder_spark.operators.tiles import (
    decode_tile_pixels,
    density_pixels,
    render_density_tiles,
    render_tiles_checked,
)

LEVEL = 6
P = 16


def _pts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["lat", "lon"])
    )


def test_density_pixels_grain_and_counts(spark):
    # three points in one fine pixel, one point in a different pixel
    # of the same tile (tile size at level 6 = 2.8125 deg; pixel =
    # 0.17578125 deg)
    rows = [
        (10.01, 20.01),
        (10.01, 20.01),
        (10.015, 20.015),  # same pixel as above (same 0.1757-deg band)
        (10.01, 21.0),  # same tile, different pixel column
    ]
    pix = density_pixels(_pts(spark, rows), level=LEVEL).collect()
    counts = sorted(r.n_points for r in pix)
    assert counts == [1, 3]
    tiles = {r.tile_id for r in pix}
    assert len(tiles) == 1
    for r in pix:
        assert 0 <= r.px < P and 0 <= r.py < P


def test_render_intensity_scaling_and_png_roundtrip(spark):
    # counts 1 / 3 in one tile -> intensity floor(1*255/3)=85 and 255
    rows = [(10.01, 20.01)] * 3 + [(10.01, 21.0)]
    pix = density_pixels(_pts(spark, rows), level=LEVEL)
    tiles = render_density_tiles(pix).collect()
    assert len(tiles) == 1
    t = tiles[0]
    assert (t.w, t.h) == (P, P)
    assert t.max_n == 3 and t.n_occupied == 2
    raster = decode_real(bytes(t.png))[:, :, 0]
    assert raster.shape == (P, P)
    assert sorted(raster[raster > 0].tolist()) == [85, 255]
    # lit-pixel count equals occupied-count rows
    assert int((raster > 0).sum()) == 2


def test_intensity_clamps_to_one(spark):
    # 1 point vs a 300-point pixel: floor(255/300) = 0 -> clamped to 1
    rows = [(50.3, -60.2)] * 300 + [(50.5, -60.2)]
    pix = density_pixels(_pts(spark, rows), level=LEVEL)
    decoded = decode_tile_pixels(render_density_tiles(pix)).collect()
    intens = sorted(r.intensity for r in decoded)
    assert intens == [1, 255]


def test_checked_loop_matches_numpy_oracle(spark):
    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 400).round(3)
    lon = rng.uniform(-179, 179, 400).round(3)
    # cluster half the points to force multi-count pixels
    lat[:200] = 33.3 + rng.uniform(0, 0.3, 200).round(4)
    lon[:200] = 44.4 + rng.uniform(0, 0.3, 200).round(4)
    rows = list(zip(lat.tolist(), lon.tolist()))
    out = render_tiles_checked(
        _pts(spark, rows), level=LEVEL, grid_levels=4
    ).collect()

    # NumPy replay of the fine-cell -> tile/px/py -> intensity math
    from cityfinder_spark.geo.cells import cell_of_np
    from cityfinder_spark.sqlcompat import LEVEL_STRIDE

    fine = LEVEL + 4
    nlon_f = 2 << fine
    cf = cell_of_np(np.array(lat), np.array(lon), fine)
    rem = cf - fine * LEVEL_STRIDE
    i_f, j_f = rem // nlon_f, rem % nlon_f
    tile = LEVEL * LEVEL_STRIDE + (i_f // P) * (2 << LEVEL) + (j_f // P)
    key = {}
    for t, x, y in zip(tile, j_f % P, i_f % P):
        key[(int(t), int(x), int(y))] = key.get((int(t), int(x), int(y)), 0) + 1
    mx = {}
    for (t, _, _), n in key.items():
        mx[t] = max(mx.get(t, 0), n)
    expect = {
        k: (n, max(1, (n * 255) // mx[k[0]])) for k, n in key.items()
    }
    got = {
        (r.tile_id, r.px, r.py): (r.n_points, r.intensity) for r in out
    }
    assert got == expect
