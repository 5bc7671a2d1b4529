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


def _sort_specs(df: DataFrame, cols: Sequence[str | Column]) -> list[tuple[Column, bool]]:
    """Normalize sort arguments to (value column, ascending) pairs.

    ``F.desc(x)``-style Columns wrap an internal SortOrder node; the
    child expression and direction are recovered from it so split-point
    comparisons can honor per-column direction.
    """
    from pyspark.sql.classic.column import Column as _CCol

    jvm = df.sparkSession._jvm
    specs: list[tuple[Column, bool]] = []
    for c in cols:
        if isinstance(c, str):
            specs.append((F.col(c), True))
            continue
        node = c._jc.node()
        if node.getClass().getSimpleName() == "SortOrder":
            child = _CCol(jvm.org.apache.spark.sql.Column(node.child()))
            asc = "Descending" not in node.sortDirection().getClass().getSimpleName()
            specs.append((child, asc))
        else:
            specs.append((c, True))
    return specs


def _split_points(
    df: DataFrame, specs: list[tuple[Column, bool]], n: int, seed: int = 9371
) -> list[tuple]:
    """Sample the sort keys ONCE (fixed seed) and pick n-1 split
    points on the driver — TotalOrderPartitioner's sampled split file
    (MRC/mapreduce/lib/partition/InputSampler.java:314). Returns
    boundary tuples in sort order, deduplicated."""
    keys = df.select([c.alias(f"__k{i}") for i, (c, _) in enumerate(specs)])
    total = keys.count()
    if total == 0 or n <= 1:
        return []
    target = max(n * 60, 1000)
    fraction = min(1.0, target / total * 1.2)
    rows = [
        tuple(r)
        for r in keys.sample(False, fraction, seed).collect()
        if None not in tuple(r)
    ]
    if not rows:
        return []
    for i in reversed(range(len(specs))):
        rows.sort(key=lambda r, i=i: r[i], reverse=not specs[i][1])
    m = len(rows)
    bounds: list[tuple] = []
    seen: set[tuple] = set()
    for j in range(1, n):
        b = rows[min((j * m) // n, m - 1)]
        if b not in seen:
            seen.add(b)
            bounds.append(b)
    return bounds


def _at_or_after(specs: list[tuple[Column, bool]], bound: tuple) -> Column:
    """Lexicographic 'row sorts at-or-after bound' honoring per-column
    direction. Assumes non-null sort keys (nulls fall into bucket 0)."""
    cond: Column | None = None
    for i in reversed(range(len(specs))):
        col, asc = specs[i]
        lit = F.lit(bound[i])
        after = (col > lit) if asc else (col < lit)
        if cond is None:
            cond = after | (col == lit)
        else:
            cond = after | ((col == lit) & cond)
    assert cond is not None
    return cond


def global_rank(
    df: DataFrame,
    *cols: str | Column,
    rank_col: str = "rank",
    num_partitions: int | None = None,
    split_points: list[tuple] | None = None,
) -> DataFrame:
    """Scalable global 1-based rank: the TotalOrderPartitioner pattern.

    An unpartitioned ``Window.orderBy`` funnels the whole dataset
    through ONE task — fatal at scale. Instead, the sort keys are
    sampled once with a FIXED seed and n-1 split points are collected
    to the driver (exactly TotalOrderPartitioner.java:50's split
    file + InputSampler.java:314), every row is assigned a bucket id
    by comparing against the literal split points, and the rank is
    bucket-local row_number + a per-bucket offset from a tiny
    (one row per bucket) broadcast table.

    Assigning buckets from driver-held literals — instead of
    ``repartitionByRange`` — matters for correctness, not just style:
    Spark's RangePartitioner seeds its reservoir sample with the
    RDD id, so the two plan branches (counts and ranks) can compute
    DIFFERENT partition boundaries for the same data and the offsets
    silently misalign. Literal split points are consistent across any
    number of recomputations by construction.

    ``split_points`` skips the sampling passes when the caller knows
    the key distribution (e.g. TeraGen's uniform keys) — the
    pre-built partition file TotalOrderPartitioner accepts.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    specs = _sort_specs(df, cols)
    bounds = split_points if split_points is not None else _split_points(df, specs, n)
    pid: Column = F.lit(0)
    for b in bounds:
        pid = pid + F.when(_at_or_after(specs, b), 1).otherwise(0)
    with_pid = df.withColumn("__pid", pid)
    w_rn = Window.partitionBy("__pid").orderBy(*cols)
    with_rn = with_pid.withColumn("__rn", F.row_number().over(w_rn))
    counts = with_pid.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        with_rn.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__rn"))
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
