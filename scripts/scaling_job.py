#!/usr/bin/env python
"""The scaling-benchmark job: nearest-city kNN join over the
image+caption table (input-hint shape), payload riding through.

Run via spark-submit so the master/parallelism comes from the
submitter (north rule: same job, two cluster sizes):

    spark-submit --master local[8]  --py-files BENCH/cityfinder_spark.zip \
        scripts/scaling_job.py --input BENCH/data/images --runs 2

Reads the pre-generated input parquet (identical bytes for every
parallelism level), joins each row to its nearest city (full arrow
operator: cell assign -> candidate argmin -> certainty -> exact
refinement), materializes the ASSIGNMENT table (image_id, city,
dist_km) with a noop sink, and prints one JSON line
{cores, rows, times:[...]}.

The job projects (image_id, lat, lon) — the 100 TB plan: Parquet
column pruning never reads the image bytes, and the kNN result is an
assignment table keyed by image_id (SURVEY §7.3 "keep bytes out of
every shuffle; re-attach by image_id"). Payload-invariant
verification (PSNR/caption, bytes decoded per row) is a separate
operator measured in bench.py (image_pipeline). Pass --payload to
instead drag the bytes through the join stage (correct but
memory-bandwidth-bound: the JVM buffers every payload row while UDF
results are in flight).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--payload", action="store_true")
    args = ap.parse_args()

    from cityfinder_spark.session import pin_blas_threads

    pin_blas_threads()
    spark = (
        SparkSession.builder.appName("scaling_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism

    from cityfinder_spark import sqlcompat as sc
    from cityfinder_spark.operators.nearest import choose_level
    from cityfinder_spark.operators.nearest_arrow import (
        build_city_index,
        nearest_city_join_arrow,
    )

    for t in ("customer", "nation"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    cities = spark.sql(sc.cities_from_customer_sql())
    n_cities = cities.count()

    imgs = spark.read.parquet(args.input).withColumnRenamed("image_id", "pt_id")
    if not args.payload:
        imgs = imgs.select("pt_id", "lat", "lon")
    rows = imgs.count()

    # build-once index, reused across runs — the Spark analog of the
    # reference's gob-cached ShapeIndex (initializer.go:198-213);
    # build time reported separately.
    t0 = time.perf_counter()
    index = build_city_index(cities, choose_level(n_cities), ring=1)
    index_build_sec = round(time.perf_counter() - t0, 3)

    def run_once() -> float:
        t0 = time.perf_counter()
        nearest_city_join_arrow(imgs, cities, city_index=index).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    run_once()  # warmup: JIT, python workers, broadcast
    times = [round(run_once(), 3) for _ in range(args.runs)]
    print(
        json.dumps(
            {
                "cores": cores,
                "rows": rows,
                "times": times,
                "index_build_sec": index_build_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
