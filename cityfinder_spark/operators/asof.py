"""As-of join (temporal point lookup): for every left row, the single
most recent right row with the same key and ts <= left.ts.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do); the naive
translations are both wrong at scale — a ranked theta-join explodes to
O(|L| x |R|) per key, and per-key collect loops aren't distributed.
The scale-correct plan is the classic UNION + ORDERED WINDOW sweep:

  1. tag both sides and union them — right rows carry their payload as
     a struct, left rows carry NULL;
  2. one keyed exchange: window over (key) ordered by
     (ts, side, tie) with rows unboundedPreceding..current;
     `last(payload, ignorenulls=True)` picks, for every left row, the
     payload of the greatest (ts, tie) right row at-or-before it —
     the as-of match — in a single sorted scan per key;
  3. filter back to left rows and unpack the struct.

Cost: ONE shuffle of |L| + |R| rows keyed on the join key, then a
linear scan — the same shape (and skew profile) as sessionization.
Dense keys skew the window partition; the mitigation at 10^12 rows is
range-bucketing the time axis first (join key -> (key, ts_bucket) with
per-bucket boundary carry-in), which composes with this operator
unchanged. No per-row Python anywhere; the window is codegen'd.

Determinism: ties are total-ordered — equal-ts right rows resolve to
the max `tie_col`; `strict` flips inclusive (ts <= left.ts) to strict
(ts < left.ts) by ordering left rows BEFORE right rows at equal ts.

Reference tie-in: generalizes the reference's "latest record wins"
postal dedup (lib/initializer/initializer.go postal last-write-wins)
from whole-table to per-timestamp semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    tie_col: str = "event_id",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    prefix: str = "r_",
    strict: bool = False,
) -> DataFrame:
    """left rows + `prefix`-renamed `right_cols` of the as-of match
    (NULL columns when no right row precedes). Ties on ts resolve to
    the max tie_col; strict=True excludes equal-ts right rows."""
    keys = list(key_cols)
    pay = F.struct(*[F.col(c) for c in right_cols]).alias("__pay")
    # side tag orders right rows before left at equal ts (inclusive
    # as-of); strict flips it
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    r = right.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.col(tie_col).cast("long").alias("__tie"),
        pay,
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.lit(None).cast(r.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_left = F.col("__side") == l_tag
    return (
        r.unionByName(l)
        .withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
        .where(is_left)
        .select(
            *[F.col(f"__l_{c}").alias(c) for c in left.columns],
            *[F.col("__m")[c].alias(f"{prefix}{c}") for c in right_cols],
        )
    )
