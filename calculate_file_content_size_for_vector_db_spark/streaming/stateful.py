"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md section 7.4 / guide 'Stateful').

``running_user_totals`` maintains per-user running (count, sum) state
across micro-batches and emits the updated totals for every user seen
in each batch — the building block for per-entity counters, rate
limits, and sessionized feature accumulation at stream scale. State is
one small row per user; with a timeout configured the state store
stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([(user_id, n, round(total, 6))], columns=["user_id", "n_events", "total_value"])


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running count/sum, one output row per user
    per micro-batch. ``events`` must be a streaming DataFrame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
