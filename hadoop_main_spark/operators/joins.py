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
        if value_cols:
            vcol = value_cols[0]
        else:
            cands = [c for c in dfs[0].columns if c != key]
            if not cands:
                raise ValueError(
                    "override join needs a value column; dfs[0] has only the key"
                )
            vcol = cands[0]
        # wrap each source's value in a PRESENCE struct: coalescing the
        # raw values would let a NULL value fall through to an earlier
        # source, but OverrideRecordReader semantics are 'rightmost
        # source CONTAINING THE KEY wins' — even when its value is NULL
        renamed = [
            df.select(F.col(key), F.struct(F.col(vcol).alias("v")).alias(f"__s{i}"))
            for i, df in enumerate(dfs)
        ]
        out = renamed[0]
        for right in renamed[1:]:
            out = out.join(right, on=key, how="full_outer")
        prefer = [F.col(f"__s{i}") for i in range(len(dfs) - 1, -1, -1)]
        return out.select(F.col(key), F.coalesce(*prefer).getField("v").alias(vcol))
    raise ValueError(f"unknown composite join op: {op}")


def tagged_join(
    sources: dict[str, DataFrame],
    key: str,
    value_col: str,
    how: str = "inner",
    max_values_per_group: int | None = None,
) -> DataFrame:
    """N-ary reduce-side tagged join: tag each source, group by key,
    emit the per-key cross product across sources.

    Reference: DataJoinMapperBase tags records
    (hadoop-tools/.../DataJoinMapperBase.java:1);
    DataJoinReducerBase.reduce regroups values by tag and
    joinAndCollect recursively crosses one value list per tag
    (DataJoinReducerBase.java:129-:141, :174-:227). The subclass
    ``combine`` hook decides inner (emit only when every source has
    the key) vs outer (cross whatever tags are present, absent
    sources null) — which is exactly a chain of inner / full-outer
    shuffle joins on the key, so that is what we emit and Catalyst
    picks the physical strategy (no manual regrouping).

    ``max_values_per_group`` mirrors
    ``mapred.datajoin.maxNumOfValuesPerGroup``
    (DataJoinReducerBase.regroup:103): the cap counts the key's TOTAL
    values across all sources and SKIPS the excess — the first ``max``
    values are kept and the key still produces joined output from
    them (an empty post-cap tag behaves like an absent source). The
    reference keeps shuffle-arrival order, which is nondeterministic;
    here the kept values are the first ``max`` in (source order,
    value order), so the result is stable under any partitioning.
    """
    tags = list(sources)
    if len(tags) < 2:
        raise ValueError("tagged_join needs >= 2 tagged sources")
    how = {"outer": "full_outer", "full": "full_outer"}.get(how, how)
    tagged = [
        sources[tag].select(F.col(key), F.col(value_col).alias(f"{tag}_{value_col}"))
        for tag in tags
    ]
    if max_values_per_group is not None:
        from functools import reduce as _reduce

        from pyspark.sql import Window

        # per-(key, tag) value counts → each tag's allowance is the cap
        # minus the values already consumed by earlier tags
        counts = _reduce(
            DataFrame.unionByName,
            [
                d.select(F.col(key), F.lit(i).alias("__tag"))
                for i, d in enumerate(tagged)
            ],
        ).groupBy(key, "__tag").agg(F.count(F.lit(1)).alias("__n"))
        w_prior = (
            Window.partitionBy(key)
            .orderBy("__tag")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        allow = counts.withColumn(
            "__prior", F.coalesce(F.sum("__n").over(w_prior), F.lit(0))
        ).select(
            key,
            "__tag",
            F.greatest(
                F.lit(max_values_per_group) - F.col("__prior"), F.lit(0)
            ).alias("__allow"),
        )
        capped = []
        for i, (tag, d) in enumerate(zip(tags, tagged)):
            vcol = f"{tag}_{value_col}"
            w = Window.partitionBy(key).orderBy(vcol)
            # NULL-SAFE allowance join: groupBy/Window above both keep
            # a NULL-key group, but a plain equi-join here would drop
            # it — enabling the cap must not change WHICH rows exist
            al = allow.filter(F.col("__tag") == i).select(
                F.col(key).alias("__ak"), "__allow"
            )
            capped.append(
                d.withColumn("__rn", F.row_number().over(w))
                .join(al, F.col(key).eqNullSafe(F.col("__ak")))
                .filter(F.col("__rn") <= F.col("__allow"))
                .select(F.col(key), F.col(vcol))
            )
        tagged = capped
    out = tagged[0]
    for right in tagged[1:]:
        out = out.join(right, on=key, how=how)
    return out


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
) -> DataFrame:
    """As-of join: for each left row, the columns of the latest right
    row with the same key and ``right_ts <= left_ts`` (left outer).

    Absent in the reference (SURVEY §2.7 'free in Spark' family) and in
    Spark's builtin join types. Implemented WITHOUT a per-key pandas
    merge (which would concentrate hot keys): tag-union both sides,
    then a single window pass per key ordered by time carries the
    right side's values forward (`last(..., ignorenulls)`); one shuffle
    on the key, linear work, skew behavior identical to a groupBy on
    the same key.

    ``right`` must be unique per (on, right_ts); pre-aggregate if not.

    SQL-ASOF NULL semantics (review-r4b): a right row with a NULL
    timestamp or NULL key can never satisfy ``right_ts <= left_ts AND
    key = key`` and is dropped from the match side (it would otherwise
    sort FIRST in the carry-forward window and match everything);
    left rows with NULL key/ts still come out, unmatched.
    """
    from pyspark.sql import Window

    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    vcols = list(value_cols) or [c for c in right.columns if c not in (on, right_ts)]
    # the right side's value columns ride in ONE struct: carrying each
    # column independently with last(ignorenulls) would skip a
    # legitimately-NULL value and mix columns from DIFFERENT right
    # rows ("frankenstein" output) — the struct is null only for
    # left-side rows, so last(ignorenulls) lands exactly on the
    # latest right ROW, preserving its internal NULLs
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in vcols]).alias("__rv"),
    )
    # a left column sharing a value column's name is REPLACED by the
    # as-of right value (documented; previously guarded by nulling)
    l_tag = left
    for c in vcols:
        if c in l_tag.columns:
            l_tag = l_tag.drop(c)
    l_tag = (
        l_tag.withColumn("__t", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .withColumn("__rv", F.lit(None).cast(dict(r_tag.dtypes)["__rv"]))
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(l_tag.dtypes)[c]))
    u = l_tag.select(*r_tag.columns).unionByName(r_tag.select(*r_tag.columns))
    # right rows sort before left rows at equal timestamps → inclusive <=
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__c", F.last("__rv", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[c for c in u.columns if c not in ("__rv", "__side", "__t")],
            *[F.col("__c").getField(c).alias(c) for c in vcols],
        )
    )


def range_count_join(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    id_col: str = "event_id",
    window_us: int = 3_600_000_000,
) -> DataFrame:
    """Count same-key rows in (ts, ts + window] per row — an interval
    self-join (equi on the key + range predicate). Spark plans
    equi+range as a sort-merge join with the range as a
    post-condition; the equi component keeps the shuffle bounded by
    the key cardinality.

    CONTRACT: rows with ZERO followers are absent from the output
    (inner-join shape, pinned by the range_join oracle) — left-join
    the result back to the input and coalesce to 0 if every row must
    appear.
    """
    # distinct column names on the two sides: a self-join condition
    # written as a[key] == b[key] relies on Spark's plan-id
    # disambiguation (and logs a trivially-true-predicate warning)
    a = df.select(F.col(key), F.col(ts).alias("__ats"), F.col(id_col).alias("__aid"))
    b = df.select(F.col(key).alias("__bkey"), F.col(ts).alias("__bts"))
    au, bu = F.unix_micros("__ats"), F.unix_micros("__bts")
    pairs = a.join(
        b,
        (F.col(key) == F.col("__bkey")) & (bu > au) & (bu <= au + F.lit(window_us)),
    )
    return (
        pairs.groupBy(key, "__aid")
        .agg(F.count("*").alias("n_follow"))
        .withColumnRenamed("__aid", id_col)
    )
