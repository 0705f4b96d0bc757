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


def test_streaming_dedup_exact_multi_batch_equals_batch(spark, tmp_path):
    """Cross-batch ingestion dedup: the documents table split into 3
    id-ordered files, streamed one file per micro-batch. Every row's
    (canonical_id, is_dup) must equal the batch dedup_exact result —
    the first-seen key state survives across micro-batches."""
    import os

    import pandas as pd

    from cityfinder_spark.operators.dedup import dedup_exact
    from cityfinder_spark.streaming.stateful import streaming_dedup_exact

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    src = tmp_path / "docs_src"
    src.mkdir()
    # id-range splits: each key's global-min id is in the first file
    # containing the key, so streaming first-seen == batch min
    for i, chunk in enumerate([pdf.iloc[:150], pdf.iloc[150:350], pdf.iloc[350:]]):
        p = str(src / f"{i:02d}.parquet")
        chunk.to_parquet(p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))  # force file order

    key = "substr(text, 1, 80)"
    want = sorted(
        tuple(r) for r in dedup_exact(docs, key_expr=key).collect()
    )

    schema = spark.read.parquet(str(src)).schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_dedup_exact(stream_in, key_expr=key)
        .writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress is not None and len(q.recentProgress) >= 3  # really multi-batch
    got = sorted(tuple(r) for r in spark.table("t_stream_dedup").collect())
    assert got == want and len(got) == 500


def test_streaming_dedup_out_of_order_divergence(spark, tmp_path):
    """The documented caveat, pinned as behavior (SURVEY §2.5): when a
    key's global-min id arrives in a LATER micro-batch than the key's
    first occurrence, the streaming canonical is the FIRST ARRIVAL's
    batch-minimum id — deterministic first-occurrence semantics — and
    explicitly NOT the batch dedup_exact global min."""
    import os

    import pandas as pd

    from cityfinder_spark.operators.dedup import dedup_exact
    from cityfinder_spark.streaming.stateful import streaming_dedup_exact

    rows = pd.DataFrame(
        {
            "doc_id": [5, 7, 1, 9],
            "text": ["same text", "same text", "same text", "other"],
        }
    )
    src = tmp_path / "ooo_src"
    src.mkdir()
    # batch 0 carries ids {5,7}; the global-min id 1 arrives in batch 1
    for i, chunk in enumerate([rows.iloc[:2], rows.iloc[2:]]):
        p = str(src / f"{i:02d}.parquet")
        chunk.to_parquet(p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    docs = spark.read.parquet(str(src)).select("doc_id", "text")
    batch = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_exact(docs, key_expr="text").collect()
    }
    assert batch[5] == 1  # batch semantics: global min

    schema = spark.read.parquet(str(src)).schema
    stream_in = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_dedup_exact(stream_in, key_expr="text")
        .writeStream.format("memory")
        .queryName("t_stream_dedup_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_dup"])
        for r in spark.table("t_stream_dedup_ooo").collect()
    }
    # first arrival's batch-min (5) is the canonical forever after
    assert got[5] == (5, False) and got[7] == (5, True)
    assert got[1] == (5, True)  # the late global min is a DUP of 5
    assert got[9] == (9, False)
    assert got[5][0] != batch[5]  # the divergence, pinned explicitly


def test_stateful_checkpoint_recovery(spark, tmp_path):
    """Kill-and-resume: run the stateful query over batch A with a
    checkpoint dir, STOP, add batch B to the source, start a FRESH
    query on the same checkpoint. The resumed query must (a) skip the
    already-committed A files (source offset recovery) and (b) resume
    the per-user state store, so users in B emit totals spanning A+B."""
    import glob as _glob

    events = spark.read.parquet(f"{SF}/events.parquet")
    # event_id split: most users appear in BOTH halves, so B's
    # emissions can only be right if A's state survived the restart
    med = events.approxQuantile("event_id", [0.5], 0.0)[0]
    part_a = events.where(F.col("event_id") <= med)
    part_b = events.where(F.col("event_id") > med)
    src = tmp_path / "src"
    src.mkdir()
    cp = str(tmp_path / "cp")

    def add_batch(df, name):
        out = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(out))
        (f,) = _glob.glob(f"{out}/part-*.parquet")
        shutil.copy(f, src / f"{name}.parquet")

    def run(qname):
        # memory sink refuses checkpoint recovery; foreachBatch is the
        # fault-tolerant sink shape (same as a real table write)
        rows = []

        def sink(batch_df, _epoch):
            rows.extend(batch_df.collect())

        stream = running_user_totals(_read_stream(spark, str(src)))
        q = (
            stream.writeStream.foreachBatch(sink)
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
            for r in rows
        }

    add_batch(part_a, "a")
    got_a = run("t_rec1")
    want_a = _totals(part_a)
    assert got_a == want_a and len(got_a) > 0

    add_batch(part_b, "b")
    got_b = run("t_rec2")
    b_users = {r["user_id"] for r in part_b.select("user_id").distinct().collect()}
    # (a) offsets recovered: only users touched by batch B re-emit —
    # the A file was not reprocessed
    assert set(got_b) == b_users and len(got_b) > 0
    # (b) state recovered: B emissions carry the FULL per-user history
    # (A + B), which is impossible without the restored state store
    want_full = _totals(events)
    assert got_b == {u: want_full[u] for u in b_users}
    overlap = set(got_a) & b_users
    assert overlap, "split produced disjoint users; state not exercised"


def _totals(df):
    return {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }


def test_streaming_corpus_search(spark, tmp_path):
    """Asymmetric similarity search runs unchanged on a STREAM of query
    vectors (broadcast corpus index + mapInPandas are streaming-
    compatible): availableNow result equals the batch result — the
    streaming shape of dedup-new-crawl-against-corpus."""
    from pyspark.sql import functions as F

    from cityfinder_spark.operators.similarity import lsh_search

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where("vec_id % 5 = 0").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    base = emb.where("vec_id % 5 <> 0")
    src = tmp_path / "queries"
    queries.write.parquet(str(src))

    want = sorted(tuple(r) for r in lsh_search(queries, base, k=5).collect())

    schema = spark.read.parquet(str(src)).schema
    stream_q = spark.readStream.schema(schema).parquet(str(src))
    out = lsh_search(stream_q, base, k=5)
    q = (
        out.writeStream.format("memory")
        .queryName("t_corpus_search")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("t_corpus_search").collect())
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


def test_streaming_cell_counts_cross_batch(spark, tmp_path):
    """A cell whose points SPAN micro-batches must accumulate across
    the boundary: final per-cell maxima equal the batch groupBy."""
    from pyspark.sql import functions as F

    from cityfinder_spark.geo.cells import cell_col
    from cityfinder_spark.streaming.windows import streaming_cell_counts

    # batch 1: 3 points in cell A, 1 in cell B; batch 2: 2 more in A
    b1 = [(1, 10.1, 10.1), (2, 10.2, 10.2), (3, 10.15, 10.15), (4, -40.0, 100.0)]
    b2 = [(5, 10.18, 10.18), (6, 10.12, 10.12)]
    src = tmp_path / "pts_src"
    schema = "pt_id long, lat double, lon double"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming_cell_counts(stream, level=6)
        .writeStream.format("memory")
        .queryName("cells_gate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # really multi-batch
    got = {
        r.cell_id: r.n
        for r in spark.table("cells_gate")
        .groupBy("cell_id").agg(F.max("n_points").alias("n"))
        .collect()
    }
    allpts = spark.createDataFrame(b1 + b2, schema)
    want = {
        r.cell_id: r.n
        for r in allpts.select(cell_col("lat", "lon", 6).alias("cell_id"))
        .groupBy("cell_id").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert max(want.values()) == 5  # the spanning cell really spanned


def test_streaming_late_data_gate_really_drops(spark):
    """The late-data contract key must exercise genuine watermark
    drops: the summed emissions cover well under the full input (the
    md5-scrambled arrival makes ~half the rows provably late), and
    every emitted window is a real (non-sentinel) one."""
    from pyspark.sql import functions as F

    from cityfinder_spark.contract import q_streaming_late_data

    out = q_streaming_late_data(spark, SF)
    total_kept = out.agg(F.sum("n_events")).first()[0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert 0 < total_kept < 0.75 * n_events  # real drops, not a no-op
    assert out.where(F.col("event_type") == "sentinel").count() == 0


def test_stream_stream_interval_join_cross_batch(spark, tmp_path):
    """Stream-stream watermarked interval join: a view buffered in
    batch-1 join state must match a click arriving in batch 2; the
    emission set equals the batch interval join."""
    from cityfinder_spark.streaming.joins import view_click_interval_join

    vschema = "event_id long, user_id long, ts timestamp"
    views_b1 = [(101, 1, "2024-01-01 00:00:00"), (102, 2, "2024-01-01 00:05:00")]
    views_b2 = [(103, 1, "2024-01-01 01:00:00")]
    clicks_b1 = [(201, 2, "2024-01-01 00:07:00")]
    clicks_b2 = [(202, 1, "2024-01-01 00:08:00"), (203, 1, "2024-01-01 01:05:00")]

    def _write(rows, path):
        df = spark.createDataFrame(
            [(i, u, t) for i, u, t in rows], "event_id long, user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.parquet(path)

    for name, rows in (
        ("v/f1", views_b1), ("v/f2", views_b2),
        ("c/f1", clicks_b1), ("c/f2", clicks_b2),
    ):
        _write(rows, str(tmp_path / name))

    def _stream(sub):
        return (
            spark.readStream.schema(vschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / sub / "*"))
        )

    joined = view_click_interval_join(
        _stream("v"), _stream("c"), attr_minutes=10, delay="1 hour"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2  # really multi-batch

    got = sorted(
        tuple(r)
        for r in spark.table("ssjoin_gate")
        .select("click_id", "view_id", "user_id", "lag_us")
        .collect()
    )
    vb = spark.createDataFrame(
        [(i, u, t) for i, u, t in views_b1 + views_b2],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cb = spark.createDataFrame(
        [(i, u, t) for i, u, t in clicks_b1 + clicks_b2],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(
        tuple(r)
        for r in view_click_interval_join(vb, cb, attr_minutes=10)
        .select("click_id", "view_id", "user_id", "lag_us")
        .collect()
    )
    assert got == want
    # the decisive pair: view 101 arrived in batch 1, click 202 in
    # batch 2 — only possible if view state crossed the boundary
    assert (202, 101, 1, 8 * 60 * 1_000_000) in got
    assert len(got) == 3


def test_decayed_engagement_integer_halving(spark):
    """Hand case: events at T, T-1h, T-2h, T-25h score
    1e6 + 5e5 + 25e4 + (1e6 >> 20) micro-units; the shift caps at 20
    and the rollup is an exact integer."""
    import datetime as dt

    import pandas as pd

    from cityfinder_spark.streaming.windows import decayed_engagement

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (7, t0),
        (7, t0 - dt.timedelta(hours=1)),
        (7, t0 - dt.timedelta(hours=2)),
        (7, t0 - dt.timedelta(hours=25)),
        (9, t0 - dt.timedelta(minutes=30)),
    ]
    ev = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts"]))
    out = {
        r["user_id"]: (r["n_events"], r["decay_micro"], r["score"])
        for r in decayed_engagement(ev).collect()
    }
    exp7 = 1_000_000 + 500_000 + 250_000 + (1_000_000 >> 20)
    assert out[7] == (4, exp7, exp7 / 1e6)
    assert out[9] == (1, 1_000_000, 1.0)


def test_stream_stream_left_outer_eviction_mechanics(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs emit immediately;
    an unmatched click NULL-emits exactly when the final watermark
    (min of both sides' max event time, minus delay — availableNow
    runs a terminal no-data batch) passes its timestamp; an unmatched
    click ABOVE that watermark stays buffered and must NOT emit."""
    import glob
    import os
    import shutil

    from cityfinder_spark.streaming.joins import view_click_interval_join

    vschema = "event_id long, user_id long, ts timestamp"
    views = [
        [(101, 1, "2024-01-01 00:00:00")],
        [(103, 1, "2024-01-01 10:00:00")],
    ]
    clicks = [
        [(201, 1, "2024-01-01 00:05:00"), (202, 9, "2024-01-01 00:30:00")],
        [(203, 9, "2024-01-01 09:59:00"), (204, 1, "2024-01-01 10:05:00")],
    ]
    # final watermark = min(10:00, 10:05) - 1h = 09:00 -> c202 (00:30)
    # evicts and null-emits; c203 (09:59) is above it and must not.

    def _stage(kind, files):
        src = str(tmp_path / f"{kind}_src")
        os.makedirs(src)
        for i, rows in enumerate(files):
            stage = str(tmp_path / f"{kind}_stage_{i}")
            spark.createDataFrame(
                rows, "event_id long, user_id long, ts string"
            ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
                1
            ).write.mode("overwrite").parquet(stage)
            (f,) = glob.glob(os.path.join(stage, "part-*.parquet"))
            dst = os.path.join(src, f"{i:02d}.parquet")
            shutil.copy(f, dst)
            os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        return (
            spark.readStream.schema(vschema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    joined = view_click_interval_join(
        _stage("v", views), _stage("c", clicks),
        attr_minutes=10, delay="1 hour", how="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin_outer_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 2
    got = sorted(
        tuple(r)
        for r in spark.table("ssjoin_outer_gate")
        .select("click_id", "view_id", "user_id", "lag_us")
        .collect()
    )
    assert got == [
        (201, 101, 1, 5 * 60 * 1_000_000),
        (202, None, 9, None),
        (204, 103, 1, 5 * 60 * 1_000_000),
    ]
    with pytest.raises(ValueError, match="join type"):
        view_click_interval_join(
            _stage("v2", views), _stage("c2", clicks), how="fullOuter"
        )
