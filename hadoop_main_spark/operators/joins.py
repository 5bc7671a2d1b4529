"""Join library.

Re-expresses the reference's three join families
(SURVEY.md §2.7) on the DataFrame surface:

- CompositeInputFormat map-side merge join over co-sorted inputs
  (MRC/mapreduce/lib/join/CompositeInputFormat.java:93-:95, ops
  inner/outer/override) → n-ary chained joins; Spark picks
  sort-merge or broadcast physically, AQE re-plans at runtime.
- datajoin reduce-side tagged join
  (hadoop-tools/.../DataJoinReducerBase.java:174) → plain shuffle join.
- DistributedCache map-side hash join
  (MRC/filecache/DistributedCache.java:135) → broadcast hash join.

At 100 TB the two scale levers are: broadcast every dimension-sized
side (`broadcast_join`), and pre-bucket fact tables on the join key
(`hadoop_main_spark.sources.bucketed`) so repeated joins skip the
shuffle entirely — the exact precondition CompositeInputFormat
imposes, but persisted once instead of per-job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def composite_join(
    dfs: Sequence[DataFrame],
    key: str,
    op: str = "inner",
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """N-ary equi-join in the CompositeInputFormat expression style.

    ``op``:
      - ``inner``: key must appear in every source.
      - ``outer``: full outer — key from any source, missing sides null.
      - ``override``: one value column per source; the value from the
        RIGHTMOST source containing the key wins (reference:
        MRC/mapreduce/lib/join/OverrideRecordReader.java:1).

    For inner/outer each source's non-key columns must be uniquely
    named (as TupleWritable positions are). For override every source
    must share one value column name, given by ``value_cols[0]`` or
    defaulting to the first non-key column of the first source.
    """
    if len(dfs) < 2:
        raise ValueError("composite_join needs >= 2 sources")
    if op in ("inner", "outer"):
        how = "inner" if op == "inner" else "full_outer"
        out = dfs[0]
        for right in dfs[1:]:
            out = out.join(right, on=key, how=how)
        return out
    if op == "override":
        vcol = (value_cols or [next(c for c in dfs[0].columns if c != key)])[0]
        renamed = [
            df.select(F.col(key), F.col(vcol).alias(f"__v{i}")) for i, df in enumerate(dfs)
        ]
        out = renamed[0]
        for right in renamed[1:]:
            out = out.join(right, on=key, how="full_outer")
        # rightmost source that has the key wins
        prefer = [F.col(f"__v{i}") for i in range(len(dfs) - 1, -1, -1)]
        return out.select(F.col(key), F.coalesce(*prefer).alias(vcol))
    raise ValueError(f"unknown composite join op: {op}")


def tagged_join(
    sources: dict[str, DataFrame], key: str, value_col: str, how: str = "inner"
) -> DataFrame:
    """Reduce-side tagged join: tag each source, group by key, emit the
    per-key cross product of tag combinations.

    Reference: DataJoinMapperBase tags records
    (hadoop-tools/.../DataJoinMapperBase.java:1) and
    DataJoinReducerBase.joinAndCollect crosses them (:174-:199).
    For two sources this is exactly a shuffle join of the tagged
    relations — so that is what we emit (Catalyst then picks the
    physical strategy; no manual regrouping).
    """
    tags = list(sources)
    if len(tags) != 2:
        raise ValueError("tagged_join currently joins exactly 2 tagged sources")
    a, b = tags
    left = sources[a].select(F.col(key), F.col(value_col).alias(f"{a}_{value_col}"))
    right = sources[b].select(F.col(key), F.col(value_col).alias(f"{b}_{value_col}"))
    return left.join(right, on=key, how=how)


def broadcast_join(
    fact: DataFrame, dim: DataFrame, key: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Map-side hash join: replicate the small side to every task.

    Reference: DistributedCache file replication
    (MRC/filecache/DistributedCache.java:135) + user-built in-memory
    hashmap. Spark's broadcast hash join is the engine-level version.
    """
    return fact.join(broadcast(dim), on=key, how=how)


def semi_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """EXISTS-style join — absent in the reference (SURVEY §2.7),
    free capability gain."""
    return left.join(right, on=key, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """NOT EXISTS-style join — absent in the reference."""
    return left.join(right, on=key, how="left_anti")
