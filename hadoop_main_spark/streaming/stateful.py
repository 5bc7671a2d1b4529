"""Custom stateful streaming operators via applyInPandasWithState.

The arbitrary-state analog of the reference's Reducer-with-running-
state idiom (MRC/mapreduce/Reducer.java:147 — a reducer folds an
iterator per key; here the fold persists across micro-batches with a
timeout). State per key is a tiny tuple, so the state store scales
with key cardinality, not event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_totals(events, key: str = "user_id", value: str = "value"):
    """Per-key running (count, sum) maintained across micro-batches —
    emits the updated totals for every key seen in each batch.
    Works on a streaming DataFrame grouped by ``key``."""
    return (
        events.select(key, value)
        .groupBy(key)
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
