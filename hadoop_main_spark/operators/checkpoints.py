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


#: tag -> (application id, rdd id) of the LIVE lazy checkpoint under
#: that tag. The app id scopes entries to ONE SparkContext: RDD ids
#: restart at 0 per context, so a stale id from a stopped session
#: would otherwise unpersist an unrelated RDD in the next one.
_live_by_tag: dict[str, tuple[str, int]] = {}


def supersede_checkpoint(tag: str, df: DataFrame) -> DataFrame:
    """Register a LAZY localCheckpoint under a stable tag, releasing
    whatever the PREVIOUS registration under the same tag pinned.

    Query builders that lazy-checkpoint a shared derivation (pmi's
    vocabulary table, the graph queries' edge/node tables) cannot
    release it themselves — the caller executes the returned plan
    later — so without this, every build()+action pins another
    vocabulary-sized RDD until spark.stop() (bench runs each query
    3x). Supersede-on-rebuild bounds the pin to ONE live checkpoint
    per tag. Contract: a superseded build's DataFrame must not be
    executed again — localCheckpoint truncates lineage on
    materialization, so its blocks are gone for good (every consumer
    here rebuilds from the registry before executing, which is what
    triggers the supersede in the first place).
    """
    rid = ckpt_rdd_id(df)
    app = df.sparkSession.sparkContext.applicationId
    old = _live_by_tag.get(tag)
    if old is not None and old[0] == app and old[1] != rid:
        unpersist_rdd(df, old[1])
    _live_by_tag[tag] = (app, rid)
    return df
