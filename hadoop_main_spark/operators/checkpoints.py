"""Shared localCheckpoint lifecycle helpers for iterative operators.

Every driver-looped algorithm here (connected components, BPE
training, k-means) localCheckpoint()s its per-iteration frontier so
lineage stays flat; without explicit release each superseded
frontier's blocks stay pinned for the whole session (one RDD per
iteration per query). These helpers release a SPECIFIC DataFrame's
checkpointed RDD — never a before/after diff of the session-global
persistent-RDD map, which would misattribute (and later unpersist)
blocks persisted by concurrent jobs in the same SparkSession (the
round-4 connected-components fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ckpt_rdd_id(df: DataFrame) -> int:
    """The id of THIS DataFrame's checkpointed RDD, read off its
    LogicalRDD plan node."""
    return int(df._jdf.queryExecution().analyzed().rdd().id())


def unpersist_rdd(df_or_session, rid: int) -> None:
    """Free a superseded frontier's localCheckpoint blocks by RDD id
    (no-op if already gone). Accepts any DataFrame or SparkSession to
    reach the JVM context."""
    spark = df_or_session if not isinstance(df_or_session, DataFrame) else df_or_session.sparkSession
    m = spark.sparkContext._jsc.getPersistentRDDs()
    if m.containsKey(rid):
        m.get(rid).unpersist()
