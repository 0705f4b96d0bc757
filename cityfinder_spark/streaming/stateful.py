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
from pyspark.sql import DataFrame
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
