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
    BooleanType,
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


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("sess_start", LongType()),
        StructField("last_ts", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_update_for(key_name: str, gap_us: int):
    """Kernel factory for :func:`gap_sessions` — per-key gap-based
    sessionization with the open session carried in state across
    micro-batches. Emits every session CLOSED by this batch
    (closed=true, final) plus one snapshot of the still-open session
    (closed=false, superseded by a later emission of the same
    (key, session_start)). Vectorized: boundaries via numpy diff,
    no per-event Python loop."""
    import numpy as np

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (k,) = key
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not len(pdf):  # NoTimeout never delivers empty groups; belt+braces
            return
        # event-time order within the batch (tiebreak on event id for
        # determinism; ties cannot open a boundary since their gap is 0)
        pdf = pdf.sort_values(["__ts_us", "__tb"], kind="mergesort")
        ts = pdf["__ts_us"].to_numpy(dtype="int64")
        carry = state.get if state.exists else None
        boundary = np.empty(len(ts), dtype=bool)
        boundary[0] = carry is None or ts[0] - carry[1] > gap_us
        boundary[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(boundary)  # 0 = continues the carried session
        rows_start, rows_end, rows_n, rows_closed = [], [], [], []
        if carry is not None and boundary[0]:
            # the carried session closes untouched by this batch
            rows_start.append(carry[0])
            rows_end.append(carry[1])
            rows_n.append(carry[2])
            rows_closed.append(True)
        last_sid = int(sid[-1])
        for g in range(0 if (carry is not None and not boundary[0]) else 1,
                       last_sid + 1):
            mask = sid == g
            g_ts = ts[mask]
            if g == 0:  # extends the carried session
                g_start, g_n = carry[0], carry[2] + len(g_ts)
            else:
                g_start, g_n = int(g_ts[0]), len(g_ts)
            g_end = int(g_ts[-1])
            if g == last_sid:
                state.update((int(g_start), g_end, int(g_n)))
                rows_start.append(g_start)
                rows_end.append(g_end)
                rows_n.append(g_n)
                rows_closed.append(False)
            else:
                rows_start.append(g_start)
                rows_end.append(g_end)
                rows_n.append(g_n)
                rows_closed.append(True)
        yield pd.DataFrame(
            {
                key_name: [k] * len(rows_start),
                "session_start": pd.Series(rows_start, dtype="int64"),
                "session_end": pd.Series(rows_end, dtype="int64"),
                "n_events": pd.Series(rows_n, dtype="int64"),
                "closed": pd.Series(rows_closed, dtype="bool"),
            }
        )

    return _update


def gap_sessions(
    events,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    gap_us: int = 1_800_000_000,
):
    """Gap-based sessionization as a CUSTOM stateful streaming
    operator (applyInPandasWithState) — the arbitrary-state analog of
    operators/sessions.sessionize, for when the session payload can't
    be expressed through F.session_window. The open session per key
    lives in the state store as a (start, last_ts, n) triple, so
    state scales with key cardinality, not history.

    Emission contract (update mode): sessions closed by a batch are
    final; the still-open session emits a snapshot per batch, so the
    FINAL session set is reconstructed downstream as, per
    (key, session_start), the emission with the greatest n_events
    (closed beats open on the tie — a gap-closing batch re-emits the
    same numbers with closed=true). Requires the replay to feed each
    key's events in event-time order ACROSS batches (the time-split
    replay contract; within a batch any order works — the kernel
    sorts). Output: (key, session_start, session_end, n_events,
    closed), timestamps in epoch microseconds."""
    from pyspark.sql import functions as F

    out_schema = StructType(
        [
            StructField(key, events.schema[key].dataType),
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
            StructField("closed", BooleanType()),
        ]
    )
    return (
        events.select(
            F.col(key),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(tiebreak).cast("long").alias("__tb"),
        )
        .groupBy(key)
        .applyInPandasWithState(
            _session_update_for(key, gap_us),
            outputStructType=out_schema,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


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
