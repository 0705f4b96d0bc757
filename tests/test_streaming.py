"""Structured Streaming: the same operators run on readStream and
match their batch twins; custom stateful operator via
applyInPandasWithState. Driven with trigger(availableNow=True) over
the driver's events parquet (copied into a stream source dir)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cityfinder_spark.streaming.stateful import running_user_totals
from cityfinder_spark.streaming.windows import (
    props_extract,
    sessionize,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_src")
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def _read_stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _run_to_memory(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(spark, name, cols):
    return sorted(
        tuple(r) for r in spark.table(name).select(*cols).collect()
    )


def test_windowed_counts_stream_equals_batch(spark, events_stream_dir):
    batch = windowed_event_counts(spark.read.parquet(f"{SF}/events.parquet"))
    want = sorted(tuple(r) for r in batch.collect())
    stream = windowed_event_counts(
        _read_stream(spark, events_stream_dir), watermark="10 minutes"
    )
    _run_to_memory(stream, "t_win", "complete")
    got = _rows(spark, "t_win", batch.columns)
    assert got == want and len(got) > 0


def test_sessionize_stream_equals_batch(spark, events_stream_dir):
    batch = sessionize(spark.read.parquet(f"{SF}/events.parquet"))
    want = sorted(tuple(r) for r in batch.collect())
    stream = sessionize(
        _read_stream(spark, events_stream_dir), watermark="10 minutes"
    )
    _run_to_memory(stream, "t_sess", "complete")
    got = _rows(spark, "t_sess", batch.columns)
    assert got == want and len(got) > 0


def test_props_extract_stream_equals_batch(spark, events_stream_dir):
    batch = props_extract(spark.read.parquet(f"{SF}/events.parquet"))
    want = sorted(tuple(r) for r in batch.collect())
    stream = props_extract(_read_stream(spark, events_stream_dir))
    _run_to_memory(stream, "t_props", "complete")
    got = _rows(spark, "t_props", batch.columns)
    assert got == want and len(got) > 0


def test_stateful_running_totals(spark, events_stream_dir):
    """One availableNow pass -> the per-user state equals the batch
    aggregate (update-mode emission of the single micro-batch)."""
    stream = running_user_totals(_read_stream(spark, events_stream_dir))
    _run_to_memory(stream, "t_state", "update")
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in spark.table("t_state").collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_nearest_city_enrichment(spark, tmp_path):
    """The flagship kNN operator runs unchanged on a STREAM of
    geotagged rows (scalar pandas UDF + broadcast joins are all
    streaming-compatible): enrich each streamed image row with its
    nearest city; availableNow result equals the batch result."""
    import shutil

    from cityfinder_spark.datagen.images import images_table
    from cityfinder_spark.operators.nearest import nearest_city_join
    from cityfinder_spark import contract as C

    src = tmp_path / "imgs"
    images_table(spark, 300).select("image_id", "lat", "lon").write.parquet(str(src))
    cities = C._cities(spark, SF)

    batch_in = spark.read.parquet(str(src)).withColumnRenamed("image_id", "pt_id")
    want = sorted(
        tuple(r)
        for r in nearest_city_join(batch_in, cities, n_cities=150).collect()
    )

    schema = spark.read.parquet(str(src)).schema
    stream_in = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .withColumnRenamed("image_id", "pt_id")
    )
    enriched = nearest_city_join(stream_in, cities, n_cities=150)
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_geo_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("t_geo_stream").collect())
    assert got == want and len(got) == 300
