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


def total_order_sort(
    df: DataFrame,
    *cols: str | Column,
    ranked: str | None = None,
    ordered: bool = False,
) -> DataFrame:
    """Globally sort (TeraSort / EX/Sort.java:98 equivalent).

    If ``ranked`` is given, a 1-based global rank column is emitted
    and — deliberately — row order is NOT materialized: the rank
    column IS the total order (this is what makes the result
    verifiable under order-insensitive comparison; the driver hashes
    sorted rows), and skipping the final sort avoids one extra
    exchange. Pass ``ordered=True`` to additionally sort the output
    by the rank (e.g. before writing order-sensitive files).
    """
    if ranked:
        out = global_rank(df, *cols, rank_col=ranked)
        return out.orderBy(ranked) if ordered else out
    return df.orderBy(*cols)


def _sort_specs(df: DataFrame, cols: Sequence) -> list[tuple[Column, bool]]:
    """Normalize sort arguments to (value column, ascending) pairs.

    Accepted forms: a column name (ascending), an explicit
    ``(column, ascending)`` tuple — the stable public form — or a
    ``F.desc(x)``-style Column wrapping an internal SortOrder node,
    from which child expression and direction are recovered. The
    introspection depends on classic-mode PySpark internals, so when
    it is unavailable (e.g. Spark Connect) a plain Column is treated
    as ascending and SortOrder-wrapped Columns raise with a pointer
    to the tuple form rather than silently mis-sorting.
    """
    specs: list[tuple[Column, bool]] = []
    for c in cols:
        if isinstance(c, str):
            specs.append((F.col(c), True))
            continue
        if isinstance(c, tuple):
            col, asc = c
            specs.append((F.col(col) if isinstance(col, str) else col, bool(asc)))
            continue
        try:
            from pyspark.sql.classic.column import Column as _CCol

            jvm = df.sparkSession._jvm
            node = c._jc.node()
            is_sort_order = node.getClass().getSimpleName() == "SortOrder"
        except Exception as exc:  # Connect / future-version fallback
            # only explicit direction/null-order tokens (uppercase, as
            # SortOrder reprs print them) — a plain column NAMED
            # 'description' must not trip this
            if re.search(r"\b(ASC|DESC)\b|\bNULLS (FIRST|LAST)\b", repr(c)):
                raise ValueError(
                    "cannot introspect sort direction on this Spark backend; "
                    "pass (column, ascending) tuples instead of F.desc(...)"
                ) from exc
            specs.append((c, True))
            continue
        if is_sort_order:
            child = _CCol(jvm.org.apache.spark.sql.Column(node.child()))
            asc = "Descending" not in node.sortDirection().getClass().getSimpleName()
            # specs carry only (col, asc): a NON-default null ordering
            # (asc_nulls_last / desc_nulls_first) would be silently
            # dropped — every consumer (window order, encoder
            # indicator byte, fold) assumes the default — so refuse
            # loudly instead of mis-ranking nulls
            null_ord = node.nullOrdering().getClass().getSimpleName()
            default = "NullsFirst" if asc else "NullsLast"
            if not null_ord.startswith(default):
                raise ValueError(
                    f"non-default null ordering ({null_ord.rstrip('$')}) is not "
                    "supported by the range-bucketed sort machinery; use the "
                    "default (asc=nulls first, desc=nulls last) or pre-filter "
                    "nulls"
                )
            specs.append((child, asc))
        else:
            specs.append((c, True))
    return specs


def _order_cols(specs: list[tuple[Column, bool]]) -> list[Column]:
    return [c.asc() if asc else c.desc() for c, asc in specs]


def _key_frame(df: DataFrame, specs: list[tuple[Column, bool]]) -> DataFrame:
    """Project the sort-key expressions to fixed internal names — the
    shared projection behind sampling (_split_points) and the bucket
    encoder's dtype probe (was triplicated; review-r4 cleanup)."""
    return df.select([c.alias(f"__k{i}") for i, (c, _) in enumerate(specs)])


def _key_dtypes(df: DataFrame, specs: list[tuple[Column, bool]]) -> list[str]:
    return [f.dataType.simpleString() for f in _key_frame(df, specs).schema.fields]


def _split_points(
    df: DataFrame, specs: list[tuple[Column, bool]], n: int, seed: int = 9371
) -> list[tuple]:
    """Pick n-1 split points from ONE cheap pass over the sort keys:
    K keys from the head of each input partition — InputSampler's
    SplitSampler (MRC/mapreduce/lib/partition/InputSampler.java:115),
    the reference's default TeraSort sampler. Each task stops pulling
    Arrow batches once K rows are taken, so the pass reads a bounded
    prefix of each partition rather than scanning (no count() pass).
    Within that prefix the K rows are SPREAD across Arrow batches
    with an even stride (IntervalSampler-flavored,
    InputSampler.java:163) so inputs whose row order correlates with
    the sort key (e.g. internally-sorted files) don't sample only
    their per-partition minima. If the spread sample still comes back
    degenerate (fewer distinct keys than requested buckets — the
    clustered-minima signature), ONE seeded per-partition reservoir
    pass over the keys (RandomSampler parity, InputSampler.java:58)
    replaces it; that fallback scans the key columns only.
    Deterministic by construction (stride sampling has no RNG; the
    reservoir is seeded). Returns boundary tuples in sort order,
    deduplicated."""
    if n <= 1:
        return []
    keys = _key_frame(df, specs)
    nparts = max(keys.rdd.getNumPartitions(), 1)
    target = max(n * 60, 1000)
    k = max(-(-target // nparts), 20)

    def first_k(batches):
        import pandas as pd

        # strided k-sample from EACH of the first ≤8 Arrow batches,
        # then a strided downselect to k — a single-batch partition
        # still yields the full k (a fixed per-batch cap of k/8 under-
        # sampled 8× whenever partitions materialize as one batch),
        # while multi-batch partitions spread their k across ≥8
        # batches' key ranges; the read stays a bounded prefix
        buf = []
        for bi, pdf in enumerate(batches):
            if bi >= 8:
                break  # early-exit: the columnar read stops here
            want = min(k, len(pdf))
            if want == 0:
                continue
            step = max(len(pdf) // want, 1)
            buf.append(pdf.iloc[::step].iloc[:want])
        if buf:
            cat = pd.concat(buf, ignore_index=True)
            step = max(len(cat) // k, 1)
            yield cat.iloc[::step].iloc[:k]

    def reservoir_k(batches):
        import numpy as np
        import pandas as pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        rng = np.random.RandomState((seed ^ (pid * 0x9E3779B1)) & 0x7FFFFFFF)
        buf = None
        for pdf in batches:
            # uniform k-sample == keep the k smallest of iid uniforms;
            # RNG consumption tracks row order only, so deterministic
            pdf = pdf.assign(__r=rng.random_sample(len(pdf)))
            buf = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            if len(buf) > k:
                buf = buf.nsmallest(k, "__r")
        if buf is not None:
            yield buf.drop(columns="__r")

    # null policy (review-r4b): the searchsorted path encodes null
    # BOUND components exactly (indicator byte), so when every key
    # dtype is encodable only LEADING-null rows are dropped — an
    # all-null tiebreak column must not discard every sample and
    # funnel the dataset into one bucket. The fold path needs fully
    # non-null bounds (literal comparisons), so it keeps the strict
    # filter.
    dts = [f.dataType.simpleString() for f in keys.schema.fields]
    fast = all(_encodable(d) for d in dts)

    def _keep(t: tuple) -> bool:
        return (t[0] is not None) if fast else (None not in t)

    rows = [
        tuple(r)
        for r in keys.mapInPandas(first_k, keys.schema).collect()
        if _keep(tuple(r))
    ]
    if rows and len(set(rows)) < min(n, len(rows)):
        sampled = [
            tuple(r)
            for r in keys.mapInPandas(reservoir_k, keys.schema).collect()
            if _keep(tuple(r))
        ]
        if len(set(sampled)) > len(set(rows)):
            rows = sampled
    if not rows:
        return []

    def _skey(v):
        # Python-side total order matching Spark's ascending order:
        # NULL first, values, NaN last (NaN breaks list.sort — all
        # comparisons false — degrading bound selection; review-r4b)
        if v is None:
            return (0, 0)
        if isinstance(v, float) and v != v:
            return (2, 0)
        return (1, v)

    for i in reversed(range(len(specs))):
        rows.sort(key=lambda r, i=i: _skey(r[i]), reverse=not specs[i][1])
    m = len(rows)
    bounds: list[tuple] = []
    seen: set[tuple] = set()
    for j in range(1, n):
        b = rows[min((j * m) // n, m - 1)]
        if b not in seen:
            seen.add(b)
            bounds.append(b)
    return bounds


def _at_or_after(specs: list[tuple[Column, bool]], bound: Sequence) -> Column:
    """Lexicographic 'row sorts at-or-after bound' honoring per-column
    direction; ``bound`` holds per-column literals or Columns. Assumes
    non-null sort keys: in the FOLD path a null key column makes the
    comparison null → treated false → the row converges to bucket 0,
    which matches Spark's nulls-first default for ASC keys only (the
    searchsorted path encodes nulls exactly for both directions via
    its indicator byte; the fold path only runs for exotic key types,
    where the approximation is documented here)."""
    cond: Column | None = None
    for i in reversed(range(len(specs))):
        col, asc = specs[i]
        lit = bound[i] if isinstance(bound[i], Column) else F.lit(bound[i])
        after = (col > lit) if asc else (col < lit)
        if cond is None:
            cond = after | (col == lit)
        else:
            cond = after | ((col == lit) & cond)
    assert cond is not None
    return cond


#: fixed byte width for variable-length (string/binary) key encodings;
#: truncation only coarsens ties (see _enc_block), never misorders
_ENC_STR_WIDTH = 16

_ENCODABLE_EXACT = frozenset(
    {"tinyint", "smallint", "int", "bigint", "float", "double",
     "string", "binary", "boolean", "date"}
)


def _encodable(dtype: str) -> bool:
    """Whether _enc_block supports this Spark simpleString dtype.
    Exact names for primitives — a prefix test on 'int' would also
    match 'interval day to second' and crash instead of falling back
    to the fold path — plus the parameterized decimal/timestamp
    families."""
    return (
        dtype in _ENCODABLE_EXACT
        or dtype.startswith("decimal")
        or dtype.startswith("timestamp")
    )


def _enc_block(values, dtype: str, asc: bool, null_mask=None):
    """Order-preserving fixed-width byte encoding of one key column:
    an (n, 1+w) uint8 block — a leading null-indicator byte (0 null,
    1 non-null) followed by w value bytes — whose row-wise
    lexicographic order matches the column's Spark sort order.
    Descending columns are bitwise complemented (complement is
    order-reversing on fixed width), which also flips the indicator:
    nulls sort FIRST on asc and LAST on desc, exactly Spark's default
    null ordering. Non-null float NaN encodes as the all-ones max
    pattern — above +Inf — matching Spark's "NaN is larger than any
    other numeric value" ordering.

    ``null_mask`` is an explicit boolean null mask. It is REQUIRED
    for float/double columns whenever SQL NULLs are possible: Arrow
    conversion collapses NULL and NaN into NaN, so pd.isna cannot
    tell them apart (the caller passes F.isnull alongside the key).
    For other dtypes pd.isna on the raw values is used when the mask
    is omitted.

    The value encoding may be COARSER than the true order (strings
    truncate to _ENC_STR_WIDTH bytes; huge ints / decimals round
    through float64, clipped to the int64 range), which is safe for
    bucket assignment: any monotone function of the sort key yields
    correct global ranks — coarsening only merges adjacent buckets."""
    import numpy as np
    import pandas as pd

    s = pd.Series(list(values)) if not isinstance(values, pd.Series) else values
    isnull = (
        np.asarray(null_mask, dtype=bool)
        if null_mask is not None
        else pd.isna(s).to_numpy()
    )
    flip = np.uint64(1) << np.uint64(63)
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        a = s.fillna(0).to_numpy()
        if a.dtype.kind in "iu":
            a = a.astype(np.int64)
        else:
            # nulls force a float64 round-trip; clip before the int64
            # view so values near ±2^63 can't wrap (monotone coarsening)
            f = np.asarray(a, np.float64)
            a = np.clip(f, -9.223372036854776e18, 9.223372036854775e18).astype(np.int64)
        a = np.where(isnull, 0, a)
        block = ((a.view(np.uint64) ^ flip).astype(">u8")).view(np.uint8).reshape(-1, 8)
    elif dtype in ("float", "double") or dtype.startswith("decimal"):
        v = pd.to_numeric(s, errors="coerce").to_numpy(np.float64)
        nan = np.isnan(v) & ~isnull  # true NaN values, not SQL NULLs
        v = np.where(np.isnan(v), 0.0, v)
        # Spark normalizes -0.0 == 0.0 in sort order (SPARK-26021);
        # the raw bit patterns differ, which would split the tie
        # across buckets and misorder its id tiebreak
        v = np.where(v == 0.0, 0.0, v)
        bits = v.view(np.uint64)
        u = np.where(bits >> np.uint64(63), ~bits, bits | flip)
        u = np.where(nan, np.uint64(0xFFFFFFFFFFFFFFFF), u)  # NaN > +Inf
        u = np.where(isnull, np.uint64(0), u)
        block = u.astype(">u8").view(np.uint8).reshape(-1, 8)
    elif dtype == "boolean":
        block = s.fillna(False).to_numpy(np.uint8).reshape(-1, 1)
    elif dtype == "date" or dtype.startswith("timestamp"):
        # convert at datetime64[us] resolution (±290k years) — NOT via
        # pandas' ns path, whose range is only 1677-2262: out-of-range
        # values would coerce to NaT → encode as epoch 0, a
        # NON-monotone corruption (a 1500-01-01 key would bucket after
        # 1969-01-01), violating the monotone-coarsening safety rule
        vals = s.to_numpy()
        if vals.dtype.kind == "M":
            nat = np.isnat(vals)
            a = vals.astype("datetime64[us]").astype(np.int64)
        else:
            a = np.zeros(len(s), dtype=np.int64)
            nat = np.zeros(len(s), dtype=bool)
            for i, x in enumerate(vals):
                if x is None or pd.isna(x):
                    nat[i] = True
                    continue
                if getattr(x, "tzinfo", None) is not None:
                    x = x.replace(tzinfo=None)
                a[i] = np.datetime64(x, "us").astype(np.int64)
        a = np.where(nat | isnull, 0, a)
        block = ((a.view(np.uint64) ^ flip).astype(">u8")).view(np.uint8).reshape(-1, 8)
    elif dtype in ("string", "binary"):
        w = _ENC_STR_WIDTH
        raw = [
            b"" if x is None or (isinstance(x, float) and pd.isna(x))
            else (x.encode("utf-8") if isinstance(x, str) else bytes(x))
            for x in s.tolist()
        ]
        block = np.array(raw, dtype=f"S{w}").view(np.uint8).reshape(-1, w)
    else:  # pragma: no cover - guarded by the _encodable() check
        raise TypeError(f"unencodable sort key type: {dtype}")
    ind = np.where(isnull, 0, 1).astype(np.uint8).reshape(-1, 1)
    block = np.hstack([ind, np.ascontiguousarray(block)])
    return block if asc else (np.uint8(255) - block)


def _bucket_id(
    specs: list[tuple[Column, bool]], bounds: list[tuple], dtypes: list[str] | None = None
) -> Column:
    """Bucket id = number of split points the row sorts at-or-after.

    Fast path (all key types byte-encodable): an Arrow-vectorized
    pandas UDF encodes the key columns into one fixed-width byte key
    and runs ``np.searchsorted`` against the driver-encoded, sorted
    bound array — O(log P) C-level comparisons per row with O(1) plan
    size. This is TotalOrderPartitioner's byte-wise trie / binary
    search (MRC/mapreduce/lib/partition/TotalOrderPartitioner.java:178
    BinarySearchNode) re-expressed over Arrow batches; a per-row
    Catalyst CASE chain is O(P) expressions (codegen blowup at
    thousands of partitions) and an HOF fold is interpreted per row —
    both measured slower at 600k rows than the Arrow round-trip.

    Fallback (exotic key types): a fold over ceil(log2(P+1)) binary-
    search steps carrying (lo, hi) and probing a literal sorted
    array<struct> with element_at — same O(log P) comparisons, no
    Python."""
    if dtypes is not None and len(bounds) > 0 and all(_encodable(d) for d in dtypes):
        return _bucket_id_searchsorted(specs, bounds, dtypes)
    return _bucket_id_fold(specs, bounds)


def _bucket_id_searchsorted(
    specs: list[tuple[Column, bool]], bounds: list[tuple], dtypes: list[str]
) -> Column:
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    ascs = [asc for _, asc in specs]
    ncols = len(specs)
    bblocks = [
        _enc_block(
            [b[i] for b in bounds],
            dtypes[i],
            ascs[i],
            null_mask=[b[i] is None for b in bounds],
        )
        for i in range(ncols)
    ]
    width = sum(blk.shape[1] for blk in bblocks)
    benc = np.frombuffer(np.hstack(bblocks).tobytes(), dtype=f"S{width}")
    benc = np.sort(benc)  # already sorted by construction; safeguard
    # float/double keys need an explicit SQL-NULL mask: Arrow collapses
    # NULL and NaN into NaN, and Spark orders NaN ABOVE all doubles but
    # NULL first/last — so a companion isnull column rides along
    float_idx = [i for i, d in enumerate(dtypes) if d in ("float", "double")]

    def _pid(*cols):
        import numpy as np
        import pandas as pd

        masks = {
            fi: cols[ncols + j].to_numpy(dtype=bool)
            for j, fi in enumerate(float_idx)
        }
        blocks = [
            _enc_block(cols[i], dtypes[i], ascs[i], null_mask=masks.get(i))
            for i in range(ncols)
        ]
        keys = np.frombuffer(
            (np.hstack(blocks) if ncols > 1 else blocks[0]).tobytes(), dtype=f"S{width}"
        )
        out = np.searchsorted(benc, keys, side="right").astype(np.int32)
        return pd.Series(out)

    in_cols = [c for c, _ in specs] + [
        F.isnull(specs[i][0]) for i in float_idx
    ]
    # coalesce: non-nullable result, so joins don't push an
    # isnotnull(__pid) into one plan branch only (breaks exchange reuse)
    return F.coalesce(pandas_udf(_pid, "int")(*in_cols), F.lit(0))


def _bound_lit(v) -> Column:
    """Literal builder that also handles STRUCT bound components —
    F.lit(Row) raises UNSUPPORTED_FEATURE.LITERAL_TYPE, which crashed
    ranking on any struct sort key (review-r4b)."""
    from pyspark.sql import Row as _Row

    if isinstance(v, _Row):
        return F.struct(
            *[_bound_lit(x).alias(n) for n, x in zip(v.__fields__, list(v))]
        )
    return F.lit(v)


def _bucket_id_fold(specs: list[tuple[Column, bool]], bounds: list[tuple]) -> Column:
    p = len(bounds)
    if p == 0:
        return F.lit(0)
    ncols = len(specs)
    arr = F.array(
        *[
            F.struct(*[_bound_lit(b[i]).alias(f"k{i}") for i in range(ncols)])
            for b in bounds
        ]
    )

    def step(acc: Column, _: Column) -> Column:
        lo, hi = acc.getField("lo"), acc.getField("hi")
        mid = ((lo + hi + F.lit(1)) / F.lit(2)).cast("int")
        probe = F.element_at(arr, mid)  # mid >= lo+1 >= 1 whenever evaluated
        ge = _at_or_after(specs, [probe.getField(f"k{i}") for i in range(ncols)])
        new_lo = F.when(lo < hi, F.when(ge, mid).otherwise(lo)).otherwise(lo)
        new_hi = F.when(lo < hi, F.when(ge, hi).otherwise(mid - 1)).otherwise(hi)
        return F.struct(new_lo.alias("lo"), new_hi.alias("hi"))

    # bit_length(P) >= ceil(log2(P+1)) iterations guarantee lo == hi.
    # coalesce makes the result non-nullable (it never IS null — null
    # keys converge to bucket 0) so a downstream join does not push an
    # isnotnull(__pid) filter into one branch only, which would break
    # exchange-reuse between the rank and count branches
    return F.coalesce(
        F.aggregate(
            F.array_repeat(F.lit(0), max(1, p.bit_length())),
            F.struct(F.lit(0).alias("lo"), F.lit(p).alias("hi")),
            step,
            lambda acc: acc.getField("lo"),
        ),
        F.lit(0),
    )


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

    ``split_points`` skips the sampling pass when the caller knows
    the key distribution (e.g. TeraGen's uniform keys) — the
    pre-built partition file TotalOrderPartitioner accepts.

    Cost shape: ONE cheap first-K-per-partition sampling read (unless
    ``split_points`` is given) plus ONE full scan — the per-bucket
    counts are derived as max(row_number) of the ranked branch, so
    both plan branches share the identical Exchange(hash __pid) and
    Spark's ReuseExchange materializes the shuffle once.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    specs = _sort_specs(df, cols)
    order = _order_cols(specs)
    bounds = split_points if split_points is not None else _split_points(df, specs, n)
    with_pid = df.withColumn("__pid", _bucket_id(specs, bounds, _key_dtypes(df, specs)))
    w_rn = Window.partitionBy("__pid").orderBy(*order)
    with_rn = with_pid.withColumn("__rn", F.row_number().over(w_rn))
    # counts from the RANKED branch (not a second aggregation of the
    # input): the groupBy shuffles on __pid just like the window, so
    # the exchange below is reused and the input is scanned ONCE
    counts = with_rn.groupBy("__pid").agg(F.max("__rn").alias("__cnt"))
    # exclusive prefix sum over ≤ n rows: single-partition here is
    # intentional (tiny frame). The pmod(__pid, 1) partition key is a
    # non-foldable constant 0 — a plain lit(0) is constant-folded out
    # of the spec and WindowExec then logs a scary (but false) "no
    # partition defined, all data to a single partition" warning
    w_off = (
        Window.partitionBy(F.pmod(F.col("__pid"), F.lit(1)))
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).cast("long").alias("__off"),
    )
    return (
        with_rn.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__off") + F.col("__rn"))
        .drop("__pid", "__rn", "__off")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "prefix",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group running sum in order, scalable to FEW HUGE groups.

    ``Window.partitionBy(group)`` funnels an entire group through one
    task — fatal when groups are few and large (the 100 TB shape of
    sequence packing: ~20 sources × billions of docs). Instead the
    rows are range-bucketed on (group, order) with driver-held literal
    split points (global_rank's TotalOrderPartitioner machinery), the
    running sum is computed per (group, bucket), and per-bucket
    offsets — a tiny groups×buckets frame — are broadcast back.

    Cost shape: one cheap first-K-per-partition sampling pass plus ONE
    full scan (the per-bucket totals aggregate the window branch on
    the same (group, bucket) partitioning, so the exchange is reused).

    Order keys must be unique within a group for a deterministic
    result — the same contract as row_number.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    gcols = list(group_cols)
    ocols = list(order_cols)
    specs = _sort_specs(df, [*gcols, *ocols])
    bounds = _split_points(df, specs, n)
    with_pid = df.withColumn("__pid", _bucket_id(specs, bounds, _key_dtypes(df, specs)))
    # INCLUSIVE running sum in the window; the exclusive variant is
    # derived by subtracting the row's own value afterwards. Both the
    # output branch and the totals branch then consume the SAME Window
    # node (totals = value of the running sum at the bucket's last
    # row, via max_by) — if totals aggregated the raw value instead,
    # column pruning would drop the Window from that branch and the
    # two exchanges would no longer canonicalize equal (no reuse,
    # second scan)
    w_local = (
        Window.partitionBy(*gcols, "__pid")
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_pid.withColumn(
        "__incl", F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
    )
    totals = local.groupBy(*gcols, "__pid").agg(
        F.max_by("__incl", F.struct(*ocols)).alias("__tot")
    )
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *gcols,
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    val = F.coalesce(F.col(value_col), F.lit(0)) if exclusive else F.lit(0)
    # NULL-SAFE group-key equality: a plain string-list join compiles
    # to EqualTo, where null == null is false — every row whose group
    # key is NULL would silently vanish (the keyed-Window form this
    # function replaces keeps null groups; groupBy aggregates them)
    off = offsets.select(
        *[F.col(g).alias(f"__og_{i}") for i, g in enumerate(gcols)],
        F.col("__pid").alias("__opid"),
        "__off",
    )
    cond = F.col("__pid") == F.col("__opid")
    for i, g in enumerate(gcols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__og_{i}"))
    return (
        local.join(F.broadcast(off), cond)
        .withColumn(out_col, F.col("__off") + F.col("__incl") - val)
        .drop(
            "__pid", "__incl", "__off", "__opid",
            *[f"__og_{i}" for i in range(len(gcols))],
        )
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
    delimited text column.

    A bare ``-kN`` (no ``,M`` end) keys on field N THROUGH THE END OF
    THE LINE — KeyFieldBasedComparator / GNU sort semantics (pos2
    omitted → key extends to end of line), compiled as the
    sep-joined tail; with ``n`` the leading number of that tail is
    compared. ``sep`` is a LITERAL separator (regex-escaped before
    split — '|' must not become regex alternation)."""
    c = F.col(line) if isinstance(line, str) else line
    arr = F.split(c, re.escape(sep))
    cols: list[Column] = []
    for ks in parse_sort_spec(spec):
        if ks.end is not None and ks.end < ks.start:
            # GNU sort rejects an inverted range; silently emitting
            # zero sort keys left data unsorted (review-r4b)
            raise ValueError(f"invalid sort spec: end field {ks.end} < start {ks.start}")
        if ks.end is None:
            # open-ended: one key = fields start.. joined by sep
            tail = F.array_join(
                F.slice(arr, ks.start, F.greatest(F.size(arr) - ks.start + 1, F.lit(0))),
                sep,
            )
            if ks.start_char > 1:
                tail = F.substring(tail, ks.start_char, 2_000_000_000)
            if ks.numeric:
                # GNU sort -n: the LEADING number of the key; anything
                # without one (or an empty key) compares as 0
                tail = F.coalesce(
                    F.regexp_extract(tail, r"^[-+]?[0-9]*\.?[0-9]+", 0).try_cast(
                        "double"
                    ),
                    F.lit(0.0),
                )
            cols.append(tail.desc() if ks.reverse else tail.asc())
            continue
        end = ks.end
        for idx in range(ks.start, end + 1):
            # try_element_at + '' : a line with fewer fields than the
            # spec references is a MISSING (empty) key in GNU sort /
            # KeyFieldBasedComparator — under ANSI mode element_at
            # raised INVALID_ARRAY_INDEX and killed the job on the
            # first ragged line (review-r4b)
            field = F.coalesce(F.try_element_at(arr, F.lit(idx)), F.lit(""))
            # char-offset addressing applies to the range's edge fields
            if idx == ks.start and ks.start_char > 1:
                field = F.substring(field, ks.start_char, 2_000_000_000)
            if idx == end and ks.end_char:
                # end_char counts from the field start (inclusive);
                # when start==end the start offset was already stripped
                keep = ks.end_char - (ks.start_char - 1 if idx == ks.start else 0)
                field = F.substring(field, 1, max(keep, 0))
            if ks.numeric:
                # leading-number parse, exactly like the open-ended
                # branch — a bare try_cast ordered '3abc' (NULL) below
                # '-2' while '-kNn' ordered it between (review-r4b)
                field = F.coalesce(
                    F.regexp_extract(field, r"^[-+]?[0-9]*\.?[0-9]+", 0).try_cast(
                        "double"
                    ),
                    F.lit(0.0),
                )
            cols.append(field.desc() if ks.reverse else field.asc())
    return cols


def sort_by_spec(df: DataFrame, col: str, spec: str, sep: str = "\t") -> DataFrame:
    return df.orderBy(*compile_sort_spec(spec, col, sep))
