"""Driver-side build-once memoization for broadcast index payloads.

The reference builds each in-memory index once and serves every query
from it (gob cache: build-if-missing, else load —
lib/initializer/initializer.go:198-213).  The Spark analog has TWO
costs worth amortizing across operator invocations in one session:

  1. the driver-side build (a collect/agg Spark job per call), and
  2. the broadcast itself — a NEW sc.broadcast per call gets a new
     broadcast id, so every Python worker re-fetches and re-unpickles
     the payload even though the bytes are identical (workers memoize
     broadcast values BY ID across tasks when spark.python.worker.reuse
     is on, which it is by default).

`memo_broadcast` caches (value, Broadcast) per logical key for the
lifetime of the SparkContext: repeated queries against the same static
dimension reuse one broadcast id, so steady-state query cost is the
kernel alone.  Entries are invalidated automatically when the context
changes (keyed by applicationId — a fresh test session never sees a
stale broadcast).  Callers own key correctness: a stale key for
changed dimension data returns the stale index, exactly like the
reference's gob file does (initializer.go:198-213 reuses the file
without checksumming the source).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import SparkSession

# key -> (applicationId, value, Broadcast)
_CACHE: dict[tuple, tuple[str, Any, Any]] = {}


def memo_broadcast(
    spark: SparkSession, key: tuple | None, build: Callable[[], Any]
) -> tuple[Any, Any]:
    """(value, Broadcast) for `key`, building + broadcasting at most
    once per SparkContext.  key=None disables memoization (fresh build
    and broadcast every call)."""
    sc = spark.sparkContext
    if key is None:
        value = build()
        return value, sc.broadcast(value)
    app = sc.applicationId
    ent = _CACHE.get(key)
    if ent is not None and ent[0] == app:
        return ent[1], ent[2]
    value = build()
    bc = sc.broadcast(value)
    _CACHE[key] = (app, value, bc)
    return value, bc


def memo_table(
    spark: SparkSession, key: tuple | None, build: Callable[[], Any]
) -> Any:
    """Persisted-DataFrame memo: build once per SparkContext per key,
    `.persist(MEMORY_AND_DISK)` so repeated queries against the same
    generated/derived table read the cache instead of recomputing the
    generator — the stand-in for a stored (Iceberg) table being read
    rather than re-ingested per query.  key=None disables memoization."""
    from pyspark import StorageLevel

    if key is None:
        return build()
    app = spark.sparkContext.applicationId
    ent = _CACHE.get(("__table__", *key))
    if ent is not None and ent[0] == app:
        return ent[1]
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _CACHE[("__table__", *key)] = (app, df, None)
    return df


def memo_value(
    spark: SparkSession, key: tuple | None, build: Callable[[], Any]
) -> Any:
    """Plain-value memo (no broadcast, no persist): build once per
    SparkContext per key. Used for cheap-but-job-triggering facts about
    a static dimension (e.g. its row count for strategy selection)."""
    if key is None:
        return build()
    app = spark.sparkContext.applicationId
    ent = _CACHE.get(("__value__", *key))
    if ent is not None and ent[0] == app:
        return ent[1]
    value = build()
    _CACHE[("__value__", *key)] = (app, value, None)
    return value


def clear() -> None:
    """Drop all cached entries (tests / dimension reload), including
    the kNN operator's index/tile caches so a dimension reload can
    never serve stale spatial state."""
    for _, ent in list(_CACHE.items()):
        df = ent[1]
        if hasattr(df, "unpersist"):
            try:
                df.unpersist()
            except Exception:
                pass
        # drop the Broadcast blocks too — without this, repeated
        # dimension reloads within one application leak broadcast
        # storage for the app's lifetime
        bc = ent[2]
        if bc is not None and hasattr(bc, "unpersist"):
            try:
                bc.unpersist()
            except Exception:
                pass
    _CACHE.clear()
    try:
        from cityfinder_spark.operators import nearest_arrow as _na

        _na._INDEX_CACHE.clear()
        _na._TILE_CACHE.clear()
        _na._TILE_DF_CACHE.clear()
    except Exception:
        pass
