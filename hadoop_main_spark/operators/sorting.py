"""Sort semantics: global total order, secondary sort, `sort -k` specs.

Reference mechanisms re-expressed (SURVEY.md §2.5):
- TotalOrderPartitioner + InputSampler (MRC/mapreduce/lib/partition/
  TotalOrderPartitioner.java:50, InputSampler.java:314): Spark's
  `orderBy` range-partitions with automatic sampling — the same
  sample→split-points→binary-search design, built in.
- Secondary sort (EX/SecondarySort.java: FirstPartitioner:133,
  FirstGroupingComparator:145): partition by the primary key, order
  values by the secondary key within each group → a Window, or
  repartition+sortWithinPartitions when a streaming-style pass is
  wanted.
- KeyFieldBasedComparator `sort -k` specs (MRC/mapreduce/lib/
  partition/KeyFieldBasedComparator.java:53): compiled to typed sort
  expressions.

Scale note: `orderBy` is the one unavoidable full-shuffle; its skew
behavior is exactly the reference's (2008 run saw 2.6× reduce skew,
EX/terasort/package.html:109) — AQE handles moderate skew, and the
write path should `sortWithinPartitions` instead when only per-file
order matters.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def total_order_sort(df: DataFrame, *cols: str | Column, ranked: str | None = None) -> DataFrame:
    """Globally sort (TeraSort / EX/Sort.java:98 equivalent).

    If ``ranked`` is given, also emit a 1-based global rank column —
    this makes total order verifiable under order-insensitive
    comparison (the driver hashes sorted rows).
    """
    if ranked:
        return global_rank(df, *cols, rank_col=ranked)
    return df.orderBy(*cols)


def global_rank(
    df: DataFrame,
    *cols: str | Column,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global 1-based rank: the TotalOrderPartitioner pattern.

    An unpartitioned ``Window.orderBy`` funnels the whole dataset
    through ONE task — fatal at scale. Instead: range-repartition on
    the sort keys (Spark samples split points, exactly
    MRC/mapreduce/lib/partition/InputSampler.java:314 →
    TotalOrderPartitioner.java:50), rank within each partition, and
    add per-partition offsets computed from a partition-count table
    that is tiny (one row per partition) and broadcast back. Output
    rows are also globally sorted across partition index.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    # monotonically_increasing_id encodes (partition id << 33) + the
    # row's position in physical partition order — which IS the sort
    # order after sortWithinPartitions. Decoding it gives per-partition
    # ranks with NO window and NO second full-data exchange (a window
    # partitioned on pid would re-shuffle everything by pid). Holds for
    # < 2^33 rows per partition.
    mid = F.monotonically_increasing_id()
    with_mid = ordered.withColumn("__pid", F.shiftright(mid, 33)).withColumn(
        "__rn", mid.bitwiseAND(F.lit((1 << 33) - 1))
    )
    counts = with_mid.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        with_mid.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__rn") + 1)
        .drop("__pid", "__rn", "__off")
    )


def secondary_sort(
    df: DataFrame,
    group_key: str | Sequence[str],
    order_key: str | Sequence[str],
    rank_col: str = "rank",
) -> DataFrame:
    """Per-group ordering surfaced as an explicit rank column.

    Reference: EX/SecondarySort.java — partition on key part 1, sort
    composite (part1, part2), group on part 1; the reducer sees
    values ascending. The Window form keeps everything declarative.
    """
    gk = [group_key] if isinstance(group_key, str) else list(group_key)
    ok = [order_key] if isinstance(order_key, str) else list(order_key)
    w = Window.partitionBy(*gk).orderBy(*ok)
    return df.withColumn(rank_col, F.row_number().over(w))


def sorted_groups(
    df: DataFrame, group_key: str | Sequence[str], order_key: str | Sequence[str]
) -> DataFrame:
    """Alternative physical shape: cluster by group key and sort within
    partitions — the exact MapReduce reduce-input layout, useful when a
    downstream mapPartitions wants streaming per-group order."""
    gk = [group_key] if isinstance(group_key, str) else list(group_key)
    ok = [order_key] if isinstance(order_key, str) else list(order_key)
    return df.repartition(*[F.col(c) for c in gk]).sortWithinPartitions(*gk, *ok)


# --- `sort -k` key-field spec compiler --------------------------------------


@dataclass(frozen=True)
class KeySpec:
    """One `-k` style field spec: 1-based field index range with
    optional 1-based char offsets within the start/end fields, plus
    flags (n = numeric, r = reverse) — KeyFieldBasedComparator.java:53
    semantics: ``-k2.3,3.2nr`` compares from char 3 of field 2 through
    char 2 of field 3, numerically, descending. ``end_char`` is
    inclusive; 0/None means "to end of field"."""

    start: int
    end: int | None = None
    numeric: bool = False
    reverse: bool = False
    start_char: int = 1
    end_char: int | None = None


_SPEC_RE = re.compile(r"^-k(\d+)(?:\.(\d+))?(?:,(\d+)(?:\.(\d+))?)?([nr]*)$")


def parse_sort_spec(spec: str) -> list[KeySpec]:
    """Parse e.g. ``"-k2,2nr -k1"`` or ``"-k2.3,2.5n"``
    (space-separated -k options, optional .char offsets)."""
    out: list[KeySpec] = []
    for piece in spec.split():
        m = _SPEC_RE.match(piece)
        if not m:
            raise ValueError(f"bad sort spec piece: {piece}")
        start = int(m.group(1))
        start_char = int(m.group(2)) if m.group(2) else 1
        end = int(m.group(3)) if m.group(3) else None
        end_char = int(m.group(4)) if m.group(4) else None
        flags = m.group(5)
        out.append(KeySpec(start, end, "n" in flags, "r" in flags, start_char, end_char))
    return out


def compile_sort_spec(spec: str, line: Column | str, sep: str = "\t") -> list[Column]:
    """Compile a `sort -k` spec into Spark sort expressions over a
    delimited text column."""
    c = F.col(line) if isinstance(line, str) else line
    arr = F.split(c, F.lit(sep).cast("string"))
    cols: list[Column] = []
    for ks in parse_sort_spec(spec):
        end = ks.end or ks.start
        for idx in range(ks.start, end + 1):
            field = F.element_at(arr, idx)
            # char-offset addressing applies to the range's edge fields
            if idx == ks.start and ks.start_char > 1:
                field = F.substring(field, ks.start_char, 2_000_000_000)
            if idx == end and ks.end_char:
                # end_char counts from the field start (inclusive);
                # when start==end the start offset was already stripped
                keep = ks.end_char - (ks.start_char - 1 if idx == ks.start else 0)
                field = F.substring(field, 1, max(keep, 0))
            if ks.numeric:
                field = field.try_cast("double")
            cols.append(field.desc() if ks.reverse else field.asc())
    return cols


def sort_by_spec(df: DataFrame, col: str, spec: str, sep: str = "\t") -> DataFrame:
    return df.orderBy(*compile_sort_spec(spec, col, sep))
