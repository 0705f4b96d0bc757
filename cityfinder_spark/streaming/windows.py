"""Event-stream operators over the `events` table.

The reference has no streaming engine (its HTTP server is stateless
request/response, SURVEY §2.5), so these operators are part of the
engine's training-pipeline/ops surface, built on Structured
Streaming's unified API: each transformation is written once and runs
on BOTH a batch DataFrame (spark.read) and a streaming DataFrame
(spark.readStream + watermark). Tests drive the streaming side with
trigger(availableNow=True) and assert equality with the batch twin;
the driver's DuckDB oracles check the batch side.

Scale notes: tumbling/session windows shuffle once on the group key;
watermarks bound state. Timestamps are emitted as epoch seconds
(bigint) so cross-engine comparison never depends on session
timezones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Output: (window_start: long epoch sec, event_type, n_events,
    sum_value). Pass watermark (e.g. "10 minutes") for streaming input
    so late state is bounded and windows finalize.
    """
    # parquet written by other engines is often TIMESTAMP_NTZ; event
    # time + watermarks need TIMESTAMP (session tz is UTC -> no-op).
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = src.withWatermark("ts", watermark) if watermark else src
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per user: a session closes after `gap` of
    inactivity (F.session_window — Spark's native stateful session
    operator; the DuckDB oracle is the classic gaps-and-islands SQL).

    Output: (user_id, session_start epoch sec, n_events, sum_value).
    """
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = src.withWatermark("ts", watermark) if watermark else src
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def props_extract(events: DataFrame) -> DataFrame:
    """Semi-structured projection: pull props.k (JSON) as an int and
    bucket events by it. Output: (k_bucket, event_type, n_events)."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .where(F.col("k").isNotNull())
        .groupBy((F.col("k") % 10).alias("k_bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def streaming_cell_counts(points: DataFrame, level: int) -> DataFrame:
    """Streaming per-cell point counts: the hot-cell/skew monitor as a
    live stream (geotagged rows arrive in micro-batches; per-cell
    running totals update across batches). State = one count per
    distinct cell — bounded by the grid size (2**level x 2**(level+1)),
    never by the stream length, so no watermark is needed; this is the
    cell-keyed analog of running_user_totals. Use `update` output mode
    and take each cell's last (max-count) emission for the final
    totals."""
    from cityfinder_spark.geo.cells import cell_col

    return (
        points.select(cell_col("lat", "lon", level).alias("cell_id"))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


DECAY_MAX_SHIFT = 20  # terms below 2^-20 (~1e-6 of a fresh event) floor to 0


def decayed_engagement(
    events: DataFrame,
    half_life_hours: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exponential-decay engagement score per user — the recency-
    weighted activity metric behind feed ranking / churn features:
    at the user's LAST event time T, each event contributes
    2^-(age_hours / half_life), i.e. half-life decay.

    Integer-exact by construction (no exp(), no FP sums): the age is
    quantized to whole half-life buckets (floor of the exact integer
    microsecond difference), each term is the integer
    1e6 >> min(bucket, 20) — a micro-unit weight, exact because
    halving is a right shift — and the per-user rollup is an integer
    sum, order-free at any parallelism. The only float is the final
    /1e6 presentation division. This is the lm_score stance applied
    to time decay: quantize per row, sum integers, divide once.

    Output: (user_id, n_events, last_ts, decay_micro, score).
    One user-keyed exchange: the max-ts window and the rollup share
    the same partitioning (Catalyst reuses the exchange)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col)
    bucket_us = 3_600_000_000 * int(half_life_hours)
    aged = events.select(
        user_col,
        F.col(ts_col),
        us.alias("__us"),
        F.max(us).over(w).alias("__last"),
    ).withColumn(
        "__sh",
        F.least(
            # explicit floor: Spark's long cast truncates but
            # DuckDB's rounds — floor(double) is identical in both
            F.floor(
                (F.col("__last") - F.col("__us")) / F.lit(float(bucket_us))
            ).cast("int"),
            F.lit(DECAY_MAX_SHIFT),
        ),
    ).withColumn(
        "__term", F.expr("cast(shiftright(1000000, __sh) as long)")
    )
    return (
        aged.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("last_ts"),
            F.sum("__term").alias("decay_micro"),
        )
        .select(
            user_col,
            "n_events",
            "last_ts",
            "decay_micro",
            (F.col("decay_micro") / F.lit(1_000_000.0)).alias("score"),
        )
    )
