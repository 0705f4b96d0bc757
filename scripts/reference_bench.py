#!/usr/bin/env python
"""Reproduce the reference's own benchmark query set end-to-end.

The reference benchmark (cmd/benchmark/main.go:18-35) runs 12 fixed
world-coordinate queries against the S2 finder built from the
GeoNames dump and writes results.csv
(City,Finder,Time,Memory,Nearest City,Latitude,Longitude,
 Expected Latitude,Expected Longitude — saveResultsToCSV,
 main.go:108-143; S9 of SURVEY §2.1).

This replays the identical query set through the CityFinder facade
over the reference's committed 1,000-row testdata sample
(testdata/allCountries.txt — the full dump is an external download,
out of sandbox scope) and writes BENCH/results.csv in the same
column format, plus the per-city summary table (A2 analog).

    python scripts/reference_bench.py [--out BENCH/results.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# cmd/benchmark/main.go:18-35 — verbatim query set
TEST_LOCATIONS = [
    (40.7128, -74.0060, "New York"),
    (34.0522, -118.2437, "Los Angeles"),
    (41.8781, -87.6298, "Chicago"),
    (51.5074, -0.1278, "London"),
    (48.8566, 2.3522, "Paris"),
    (35.6895, 139.6917, "Tokyo"),
    (55.7558, 37.6176, "Moscow"),
    (-33.8688, 151.2093, "Sydney"),
    (39.9042, 116.4074, "Beijing"),
    (19.4326, -99.1332, "Mexico City"),
    (55.7963, 49.1088, "Kazan"),
    (54.5378, 52.7985, "Bugulma"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "results.csv"))
    ap.add_argument(
        "--data", default="/root/reference/testdata/allCountries.txt"
    )
    args = ap.parse_args()

    from cityfinder_spark.finder import CityFinder
    from cityfinder_spark.session import get_spark
    from cityfinder_spark.sources.geonames import load_geonames_cities

    spark = get_spark("reference_bench", cores=8, shuffle_partitions=8)
    t0 = time.perf_counter()
    finder = CityFinder(load_geonames_cities(spark, args.data))
    build_s = time.perf_counter() - t0

    # warmup (JVM codegen + Python workers), like the reference's warm
    # in-process index
    finder.find_nearest_city(0.0, 0.0)

    rows = []
    for lat, lon, label in TEST_LOCATIONS:
        t0 = time.perf_counter()
        got = finder.find_nearest_city(lat, lon)
        dur_us = (time.perf_counter() - t0) * 1e6
        rows.append(
            {
                "City": label,
                "Finder": "SparkCell",
                "Time": round(dur_us, 1),  # microseconds (per-query)
                "Memory": 0,  # JVM-managed; no per-query alloc metric
                "Nearest City": got["Name"] if got else "",
                "Latitude": f"{got['Latitude']:.6f}" if got else "",
                "Longitude": f"{got['Longitude']:.6f}" if got else "",
                "Expected Latitude": f"{lat:.6f}",
                "Expected Longitude": f"{lon:.6f}",
            }
        )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    # the engine-native form: all 12 queries as ONE DataFrame join —
    # per-query latency above is dominated by the driver round-trip
    # (collect per call); the engine's metric is join throughput
    # (bench.py / BENCH/BASELINE.md).
    pts = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo, _) in enumerate(TEST_LOCATIONS)],
        "pt_id long, lat double, lon double",
    )
    t0 = time.perf_counter()
    batched = {r["pt_id"]: r["name"] for r in finder.nearest_city_df(pts).collect()}
    batch_s = time.perf_counter() - t0
    assert [batched[i] for i in range(12)] == [r["Nearest City"] for r in rows]

    print(f"index build: {build_s:.2f}s over {finder.cities.count()} cities")
    print(f"{'City':<14} {'Nearest':<28} {'us/query':>9}")
    for r in rows:
        print(f"{r['City']:<14} {r['Nearest City']:<28} {r['Time']:>9}")
    print(f"batched DataFrame form: 12 queries in {batch_s*1e3:.0f}ms total")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
