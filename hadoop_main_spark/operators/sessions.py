"""Gap-based sessionization (batch form).

The reference has no session concept (SURVEY §2.12 — batch only);
this is a capability extension on the same DataFrame surface. The
streaming twin (``streaming/windows.py:sessionize``) uses
``F.session_window`` under a watermark; this batch form uses the
classic lag→boundary→cumulative-sum construction so the session ids
are deterministic and SQL-reproducible (windows partitioned by the
entity key — one shuffle, no global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_us: int = 1_800_000_000,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based per-key session ids: a new session starts when
    the gap to the previous row (by ``ts``, tie-broken on
    ``order_tiebreak``) exceeds ``gap_us`` microseconds."""
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    t_us = F.unix_micros(F.col(ts))
    prev = F.lag(t_us).over(w)
    boundary = F.when(prev.isNull() | (t_us - prev > gap_us), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Per-key session summary: session count, event count, and the
    largest single-session event count."""
    s = sessionize(df, key, ts, order_tiebreak, gap_us)
    per_session = s.groupBy(key, "session_id").agg(F.count("*").alias("n"))
    return per_session.groupBy(key).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("longest_session_events"),
    )
