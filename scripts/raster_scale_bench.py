#!/usr/bin/env python
"""Regression-track the distance_transform staged router at scale.

Round-4's SCALE.md claim — level-12 grid (33M cells), 2M points,
occupied x hot product ~4e11, staged doubling-ring rounds instead of
the ~4h extrapolated crossJoin — was measured ad hoc; this script
makes it a recorded artifact (VERDICT r4 task #7). It runs:

  * the ROUTER probe: the small case must route "cross", the big one
    "staged" (the measured product budget, raster.py::distance_transform);
  * level-12 over the first 150k and first 2M rows of the 10M-row
    flagship image table (BENCH/data — deterministic datagen, same
    lat/lon skew as the contract points), wall-timed;

and writes one JSON blob to BENCH/raster_scale.json so the next round
can diff the numbers instead of re-deriving them from prose.

Usage: PYTHONPATH=/root/repo python scripts/raster_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

BIG_TABLE = os.path.join(_HERE, "BENCH", "data", "images_10000000")
OUT = os.path.join(_HERE, "BENCH", "raster_scale.json")
LEVEL = 12


def main() -> None:
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.raster import distance_transform
    from cityfinder_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("raster-scale", cores=cpus, shuffle_partitions=cpus)
    if not os.path.exists(os.path.join(BIG_TABLE, "_SUCCESS")):
        print("flagship table missing; run bench.py once first", file=sys.stderr)
        sys.exit(1)
    pts_all = spark.read.parquet(BIG_TABLE).select("image_id", "lat", "lon")

    result: dict = {
        "metric": "distance_transform staged-router scale runs",
        "level": LEVEL,
        "cpus": cpus,
        "runs": [],
    }
    # (rows, hot_threshold): the small run lands under the 2e9 pair
    # budget (router must pick the bounded cross product — it IS the
    # cheapest plan there); the big run at threshold 2 produces
    # ~200k hot cells x ~1.4M occupied (product ~3e11), which MUST
    # route to the staged doubling-ring rounds — the regime where the
    # old crossJoin extrapolated to hours.
    for n_rows, hot_threshold in ((150_000, 8), (2_000_000, 2)):
        # image_id is 'img<zero-padded number>': deterministic subset
        # by parsing the numeric suffix (no sampling nondeterminism)
        pts = pts_all.where(
            F.expr("cast(substring(image_id, 4) as bigint)") < n_rows
        )
        t0 = time.perf_counter()
        out = distance_transform(
            pts, level=LEVEL, hot_threshold=hot_threshold
        )
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        occupied = out.count()
        hot = out.where(F.col("d_hot") == 0).count()
        result["runs"].append(
            {
                "n_points": n_rows,
                "hot_threshold": hot_threshold,
                "wall_sec": wall,
                "occupied_cells": occupied,
                "hot_cells": hot,
                "pair_product": occupied * hot,
                "routed": "cross"
                if occupied * hot <= 2_000_000_000
                else "staged",
            }
        )
        print(
            f"n={n_rows}: {wall}s occupied={occupied} hot={hot}",
            file=sys.stderr,
        )

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
