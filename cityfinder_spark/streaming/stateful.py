"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's arbitrary-stateful path (the API the input
hint's "vectorized pandas/Arrow UDFs" maps to for custom streaming
state): a per-user running aggregate that survives across micro-
batches. With trigger(availableNow=True) over a static directory the
final emission equals the batch groupBy — which is how the test pins
correctness.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, max_value double"
STATE_SCHEMA = "n long, s double, m double"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, m = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        v = pdf["value"]
        n += int(v.count())
        s += float(v.sum())
        m = max(m, float(v.max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value": round(s, 2), "max_value": m}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over a stream of events.
    Each micro-batch emits the updated totals for users seen in it."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_OUTPUT_SCHEMA = "doc_id long, canonical_id long, is_dup boolean"
DEDUP_STATE_SCHEMA = "canon long"


def _dedup_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    canon = state.get[0] if state.exists else int(pdf["doc_id"].min())
    state.update((canon,))
    yield pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "canonical_id": canon,
            "is_dup": pdf["doc_id"] != canon,
        }
    )


def streaming_dedup_exact(
    docs: DataFrame,
    key_expr: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of operators.dedup.dedup_exact: every streamed
    row gets (doc_id, canonical_id, is_dup) where the canonical is the
    FIRST-SEEN minimum id for its dedup key — state is one long per
    distinct key, surviving across micro-batches (the cross-batch
    ingestion-dedup shape a training pipeline needs: drop re-crawled
    duplicates without re-reading the corpus).

    Equals the batch operator exactly when ids arrive in nondecreasing
    order (normal ingestion); under arbitrary arrival order the
    canonical is the first arrival's batch-minimum id — streaming
    first-occurrence semantics, deterministic given the batch
    sequence. The group key is xxhash64(key), NOT the raw key, so the
    state store holds (64-bit hash -> long) and never scales with
    corpus bytes; a hash collision (~2^-64 per pair) would merge two
    distinct keys — the standard dedup-at-scale tradeoff.
    """
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.xxhash64(F.expr(key_expr)).alias("__key"),
        )
        .groupBy("__key")
        .applyInPandasWithState(
            _dedup_update,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
