"""Distributed sketches on the portable hash64.

The reference's UniqValueCount (MRC/mapreduce/lib/aggregate/
UniqValueCount.java:35) caps distinct tracking with an arbitrary
subset; its modern large-scale counterpart is a mergeable sketch.
KMV (k-minimum-values) is implemented here because, unlike HLL
register implementations, it is *bit-reproducible across engines*:
the k smallest hash64 values of a column are a deterministic set, so
the estimate — (k-1) * 2^60 / kth_min — is oracle-verifiable exactly.

Scale shape: per-partition top-k (Spark plans orderBy+limit as
TakeOrderedAndProject — partial top-k map-side, k-row merge on the
driver stage), so the full data is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64

HASH_SPACE = float(2**60)


def kmv_distinct(df: DataFrame, col: Column | str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate of ``col``.

    Returns one row: (k_used, kth_min, est_distinct). For fewer than
    ``k`` distinct hashes the estimate is the exact distinct count.
    """
    h = hash64(col)
    mins = df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    agg = mins.agg(
        F.count("*").alias("k_used"), F.max("h").alias("kth_min")
    )
    return agg.select(
        "k_used",
        "kth_min",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("double")
        )
        .otherwise(
            (F.col("k_used") - 1).cast("double") * F.lit(HASH_SPACE) / F.col("kth_min").cast("double")
        )
        .alias("est_distinct"),
    )


CM_DEPTH = 4
CM_WIDTH = 256


def count_min_table(df: DataFrame, col: Column | str, depth: int = CM_DEPTH, width: int = CM_WIDTH) -> DataFrame:
    """Count-min sketch as a DataFrame: (row, bucket, cnt) — depth
    hash rows, width buckets each. Built with one explode(depth) +
    grouped count; rows merge across partitions/streams by addition
    (the mergeability that makes sketches work at 100 TB). Integer
    counters + hash64 buckets → bit-reproducible in SQL."""
    c = F.col(col) if isinstance(col, str) else col
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    (hash64(c, salt=f"cm{j}") % width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("rb")
    )
    return rows.groupBy("rb.row", "rb.bucket").agg(F.count("*").alias("cnt"))


def count_min_estimate(
    df: DataFrame,
    col: Column | str,
    items: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each row of ``items``: estimate =
    min over hash rows of the item's bucket counter (an upper bound
    on the true count; exact when no collisions). The sketch table is
    small (depth × width) and broadcasts."""
    sketch = count_min_table(df, col, depth, width)
    it = items.select(F.col(item_col).alias("item"))
    probes = it.select(
        "item",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    (hash64("item", salt=f"cm{j}") % width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("rb"),
    ).select("item", "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna(0, ["cnt"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est_count"))
    )
