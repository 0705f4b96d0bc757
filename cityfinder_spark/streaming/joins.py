"""Stream-stream interval join: click->view attribution as a live join.

The reference has no streaming engine (SURVEY §2.5); this supplies the
one Structured Streaming primitive the rest of the streaming surface
doesn't exercise — a watermarked STREAM-STREAM join, where BOTH sides
arrive in micro-batches and matches can span batch boundaries (a view
buffered in join state from batch k matches a click arriving in batch
k+1). This is the attribution shape ("every click joined to the views
it followed within W minutes") that at 100 TB cannot be a batch
re-join of the full history.

Scale design:
  - Both sides carry event-time watermarks and the join condition has
    a closed time range (view_ts <= click_ts <= view_ts + W), so Spark
    can evict join state: a buffered view dies when the watermark
    passes view_ts + W, a buffered click when it passes click_ts.
    State is bounded by (delay + W) x arrival rate, never by stream
    length.
  - The equi-key (user_id) hash-partitions both sides once; the
    interval predicate evaluates within the co-partitioned state store
    — one exchange per side, no theta join.
  - Inner-join emissions are exactly the matched pairs regardless of
    how rows land in micro-batches (no finalization wait in append
    mode for inner joins), so the emission SET equals the batch
    interval join whenever no row is dropped as late — which ordered
    (or watermark-delay-bounded disordered) arrival guarantees. The
    late-drop semantics themselves are gated separately by
    `streaming_late_data`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def view_click_interval_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    attr_minutes: int = 10,
    delay: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join every click to ALL same-user views in the preceding
    `attr_minutes` (view_ts <= click_ts <= view_ts + attr_minutes).

    views:  (event_id, user_id, ts)   clicks: (event_id, user_id, ts)
    Output: (click_id, view_id, user_id, lag_us) — lag in exact integer
    microseconds (no FP anywhere, so the row set value-hashes).

    Works identically on batch and streaming inputs; on streaming
    inputs both watermarks + the closed time range make join state
    evictable (see module docstring). `delay` trades reordering
    tolerance for state size; correctness of emitted pairs does not
    depend on batch boundaries.

    how="leftOuter" is the production attribution shape: every click
    row emits — matched pairs immediately, UNMATCHED clicks as
    (click_id, NULL view_id, NULL lag) once the watermark proves no
    matching view can still arrive (a click is evictable when the
    global watermark passes click_ts, since any joinable view has
    view_ts <= click_ts). Under trigger(availableNow) the engine runs
    a final no-data micro-batch after the last file, so the emitted
    null set is exactly the unmatched clicks with
    click_ts < min(max view_ts, max click_ts) - delay — closed-form,
    which is what the streaming_stream_join_outer oracle replays.
    Clicks above that final watermark remain buffered at shutdown and
    do not emit (the documented streaming-outer-join semantics: their
    attribution window is still open).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type {how!r}")
    # parquet written by other engines is often TIMESTAMP_NTZ; event
    # time + watermarks need TIMESTAMP (session tz is UTC -> no-op,
    # and lag is a difference so any fixed offset cancels).
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").cast("timestamp").alias("view_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", delay)
    if c.isStreaming:
        c = c.withWatermark("click_ts", delay)
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {int(attr_minutes)} MINUTES")
        )
    )
    return c.join(v, cond, how).select(
        "click_id",
        "view_id",
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )
