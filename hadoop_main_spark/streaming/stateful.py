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


def _update_running_for(key_name: str):
    """Kernel factory closed over the OUTPUT key column name — the
    key/value parameters of running_totals are real (review-r4b: a
    hard-coded pdf["value"] / "user_id" output crashed any non-default
    call); the value column is canonicalized to __value upstream."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (k,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["__value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_name: [k], "n_events": [n], "total_value": [total]}
        )

    return _update


def running_totals(events, key: str = "user_id", value: str = "value"):
    """Per-key running (count, sum) maintained across micro-batches —
    emits the updated totals for every key seen in each batch.
    Works on a streaming DataFrame grouped by ``key``; the output key
    column keeps the input name and type."""
    from pyspark.sql import functions as F

    out_schema = StructType(
        [
            StructField(key, events.schema[key].dataType),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    return (
        events.select(F.col(key), F.col(value).alias("__value"))
        .groupBy(key)
        .applyInPandasWithState(
            _update_running_for(key),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
