"""Aggregation library.

Re-expresses the reference's aggregate plugin package
(MRC/mapreduce/lib/aggregate/*) and the word-statistics examples
(EX/WordMean.java, EX/WordMedian.java, EX/WordStandardDeviation.java)
as Catalyst aggregate expressions. Partial aggregation (the
reference's Combiner, MRC/mapred/MapTask.java:1611) is automatic:
every groupBy below compiles to partial+final HashAggregateExec.

Design note on floats: sums that feed a correctness oracle are
computed over DECIMAL casts (exact, associative — immune to
float summation-order differences across engines/partitionings)
and only converted to double at the very end. stddev/mean are
derived from exact integer/decimal sums, mirroring the reference's
SUM/SUM_SQ counter approach (EX/WordStandardDeviation.java:1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(col: Column | str, typ: str = DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def exact_sum(col: Column | str, typ: str = DEC) -> Column:
    """Order-independent exact sum of a numeric column → double."""
    return F.sum(dec(col, typ)).cast("double")


# --- ValueAggregator descriptor compiler ------------------------------------
# Reference: ValueAggregatorBaseDescriptor registers the aggregator
# types at MRC/mapreduce/lib/aggregate/ValueAggregatorBaseDescriptor.java:39-:53;
# jobs are driven by "<AggTypeName>:<id>\t<value>" strings
# (ValueAggregatorJob.java:1). Here a descriptor name compiles
# directly to a Catalyst aggregate expression.


def _uniq_count(value: Column, cap: int | None) -> Column:
    if cap is None:
        return F.countDistinct(value).cast("bigint")
    # UniqValueCount's maxNumItems caps the *tracked set* (an
    # arbitrary subset in the reference, UniqValueCount.java:43-:75);
    # we emulate with a deterministic (sorted) subset cap.
    return F.least(F.countDistinct(value), F.lit(cap)).cast("bigint")


#: user-registered AggType plugins: name → builder(value_col, cap) →
#: aggregate Column. The analog of UserDefinedValueAggregatorDescriptor
#: (MRC/mapreduce/lib/aggregate/UserDefinedValueAggregatorDescriptor.java:1),
#: which loads user aggregator classes by name at job setup.
USER_AGGREGATORS: dict = {}

#: static name set so registration works at import time, before any
#: SparkSession exists (building Columns requires a live context)
BUILTIN_AGG_NAMES = frozenset(
    {
        "LongValueSum",
        "DoubleValueSum",
        "LongValueMax",
        "LongValueMin",
        "StringValueMax",
        "StringValueMin",
        "ValueCount",
        "UniqValueCount",
    }
)


def register_aggregator(name: str, builder) -> None:
    """Register a custom AggType under ``name``; ``builder(value_col,
    cap)`` must return an aggregate Column. Registered names win over
    nothing — builtins cannot be shadowed."""
    if name in BUILTIN_AGG_NAMES:
        raise ValueError(f"cannot shadow builtin aggregator: {name}")
    USER_AGGREGATORS[name] = builder


def _builtin_aggregators(v: Column, cap: int | None) -> dict[str, Column]:
    return {
        "LongValueSum": F.sum(v.cast("bigint")).cast("bigint"),
        "DoubleValueSum": exact_sum(v),
        "LongValueMax": F.max(v.cast("bigint")),
        "LongValueMin": F.min(v.cast("bigint")),
        "StringValueMax": F.max(v.cast("string")),
        "StringValueMin": F.min(v.cast("string")),
        "ValueCount": F.count(v).cast("bigint"),
        "UniqValueCount": _uniq_count(v, cap),
    }


def compile_aggregator(agg_type: str, value: Column | str, cap: int | None = None) -> Column:
    """AggType name → aggregate Column (the descriptor 'compiler').
    Builtins first, then user plugins (:func:`register_aggregator`)."""
    v = F.col(value) if isinstance(value, str) else value
    table = _builtin_aggregators(v, cap)
    if agg_type in table:
        return table[agg_type]
    if agg_type in USER_AGGREGATORS:
        return USER_AGGREGATORS[agg_type](v, cap)
    raise ValueError(f"unknown aggregator type: {agg_type}")


def value_aggregator(
    df: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Run a ValueAggregatorJob-style descriptor set in one pass.

    ``specs``: out_name → (AggTypeName, value_col). One grouped
    aggregation, all descriptors evaluated together (the reference
    needs one reduce per job; Catalyst fuses them).
    """
    aggs = [compile_aggregator(t, c).alias(name) for name, (t, c) in specs.items()]
    return df.groupBy(*key_cols).agg(*aggs)


def value_histogram(
    df: DataFrame, key_cols: Sequence[str], item_col: str
) -> DataFrame:
    """ValueHistogram report per key: unique item count, min / median /
    max / mean / stddev of per-item counts.

    Reference: MRC/mapreduce/lib/aggregate/ValueHistogram.java:83-:120.
    Two-level aggregation; mean/stddev derived from exact integer
    sums so results are engine-portable.
    """
    per_item = df.groupBy(*key_cols, item_col).agg(F.count("*").alias("item_count"))
    n = F.count("*")
    s = F.sum("item_count")
    s2 = F.sum(F.col("item_count") * F.col("item_count"))
    return per_item.groupBy(*key_cols).agg(
        n.cast("bigint").alias("unique_items"),
        F.min("item_count").alias("min_count"),
        F.expr("percentile(item_count, 0.5)").alias("median_count"),
        F.max("item_count").alias("max_count"),
        (s.cast("double") / n).alias("mean_count"),
        # clamp: double round-off can land E[x^2]-E[x]^2 at -1 ulp for
        # near-zero variance, and sqrt(negative) is NaN (review-r4b)
        F.sqrt(
            F.greatest(
                s2.cast("double") / n - (s.cast("double") / n) * (s.cast("double") / n),
                F.lit(0.0),
            )
        ).alias("stddev_count"),
    )


# --- word statistics (EX/WordMean, WordMedian, WordStandardDeviation) -------


def word_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mean / median / population-stddev of token lengths in one pass.

    Reference: EX/WordMean.java:71 (COUNT/LENGTH counters),
    EX/WordMedian.java:1 (CDF walk → percentile),
    EX/WordStandardDeviation.java:1 (sqrt(E[x²]−E[x]²) from SUM,
    SUM_SQ) — same exact-integer-sums formulation here.
    """
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.transforms import tokenize

    toks = fan_out(df.select(text_col)).select(F.explode(tokenize(text_col)).alias("word"))
    lens = toks.select(F.length("word").cast("bigint").alias("len"))
    n = F.count("*")
    s = F.sum("len")
    s2 = F.sum(F.col("len") * F.col("len"))
    return lens.agg(
        n.cast("bigint").alias("word_count"),
        (s.cast("double") / n).alias("mean_len"),
        F.expr("percentile(len, 0.5)").alias("median_len"),
        F.sqrt(
            F.greatest(
                s2.cast("double") / n - (s.cast("double") / n) * (s.cast("double") / n),
                F.lit(0.0),
            )
        ).alias("stddev_len"),
    )


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The canonical query (reference: EX/WordCount.java:36)."""
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.transforms import tokenize

    return (
        fan_out(df.select(text_col))
        .select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def reduce_grouped(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    fn,
    schema,
) -> DataFrame:
    """The full Reducer contract (MRC/mapreduce/Reducer.java:147): an
    arbitrary Python fold over each key group, with the group's rows
    presented in ``order`` — the grouping-comparator + secondary-sort
    guarantee MapReduce gives a reducer.

    ``fn(key_tuple, pdf) -> pandas.DataFrame`` receives the group as
    one (sorted) pandas frame. Use ONLY when no Catalyst aggregate
    expresses the fold — this is the escape hatch, Arrow-batched and
    shuffled once on the keys (state is bounded by the largest single
    group, the same constraint a reference reducer has).
    """

    def run(key, pdf):
        return fn(key, pdf.sort_values(list(order), kind="mergesort"))

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(run, schema)


def aggregate_descriptor_records(df: DataFrame, record_col: str = "record") -> DataFrame:
    """The record-level ValueAggregator dataflow: each input record is
    a descriptor string ``"<AggType>:<id>\\t<value>"`` (exactly what
    ValueAggregatorMapper emits and the combiner/reducer consume —
    MRC/mapreduce/lib/aggregate/ValueAggregatorBaseDescriptor.java:89,
    ValueAggregatorReducer.java:1). One grouped pass computes every
    integer-typed aggregator; the result column is selected per
    group's AggType.

    Supported types: LongValueSum, LongValueMax, LongValueMin,
    ValueCount, UniqValueCount. Output: (agg_type, id, result).
    """
    # FIRST-separator semantics, matching the reference's
    # generateEntry (first ':' splits type from id, first tab splits
    # head from value) — a LAST-separator substring_index mis-parses
    # ids containing ':' (URLs) and values containing tabs
    # (review-r4b)
    parsed = (
        df.select(
            F.col(record_col).alias("__rec"),
            F.substring_index(F.col(record_col), "\t", 1).alias("__head"),
        )
        .select(
            "__rec",
            "__head",
            F.substring_index(F.col("__head"), ":", 1).alias("agg_type"),
        )
        .select(
            F.col("agg_type"),
            F.expr("substring(__head, length(agg_type) + 2)").alias("id"),
            F.when(
                F.length("__rec") > F.length("__head"),
                F.expr("substring(__rec, length(__head) + 2)"),
            )
            .otherwise(F.lit(""))
            .alias("value"),
        )
    )
    # UniqValueCount values may be non-numeric; numeric aggs see NULL
    v = F.col("value").try_cast("bigint")
    agg = parsed.groupBy("agg_type", "id").agg(
        F.sum(v).alias("__sum"),
        F.max(v).alias("__max"),
        F.min(v).alias("__min"),
        F.count("*").cast("bigint").alias("__cnt"),
        F.countDistinct("value").cast("bigint").alias("__uniq"),
    )
    result = (
        F.when(F.col("agg_type") == "LongValueSum", F.col("__sum"))
        .when(F.col("agg_type") == "LongValueMax", F.col("__max"))
        .when(F.col("agg_type") == "LongValueMin", F.col("__min"))
        .when(F.col("agg_type") == "ValueCount", F.col("__cnt"))
        .when(F.col("agg_type") == "UniqValueCount", F.col("__uniq"))
    )
    return agg.select("agg_type", "id", result.alias("result"))


def grouped_quantile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[tuple[str, int, int]],
    buckets: int = 1024,
) -> DataFrame:
    """EXACT per-group quantiles at scale — the grouped generalization
    of WordMedian's two-job histogram scheme (EX/WordMedian.java:1),
    extended from the median to ANY rational quantile list in one
    histogram pass.

    ``quantiles`` is [(label, num, den), ...]; each emits the value at
    rank ceil(num*n/den) of the group's ascending order (the lower
    quantile — integer-exact, the engine's rank-threshold discipline;
    (label='p50', 1, 2) reproduces the lower median's (n+1) DIV 2).

    Phase 1 histograms values into ``buckets`` global-range bins per
    group (partial-agg shuffle of groups x used-bins rows, never raw
    data); each quantile's target bin comes from the SAME cumulative
    bin table — q quantiles cost one extra tiny union, not q histogram
    passes. Phase 2 rejoins only rows in the selected bins (expected
    n/buckets per group per quantile) and ranks within. Bucketing only
    needs ORDER consistency, so float rounding in bin boundaries
    cannot affect correctness — cumulative counts are exact integers.
    NULLs are excluded (SQL quantile semantics).

    A pathological distribution (most of a group in one bin) degrades
    phase 2 toward a per-group sort of that bin; at 100 TB guard by
    raising ``buckets`` or recursing on the hot bin — both fit this
    same shape.
    """
    from pyspark.sql import Window

    if not quantiles:
        raise ValueError("grouped_quantile needs at least one quantile")
    for label, num, den in quantiles:
        if not (0 < num <= den):
            raise ValueError(f"quantile {label}: need 0 < num <= den, got {num}/{den}")
    g = list(group_cols)
    v = F.col(value_col)
    data = df.filter(v.isNotNull())
    rng = data.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
    out_schema = df.select(
        *g, F.lit("q").alias("q"), v.cast("double").alias("value")
    ).schema
    if rng.lo is None:
        return df.sparkSession.createDataFrame([], out_schema)
    lo, hi = float(rng.lo), float(rng.hi)
    width = (hi - lo) / buckets if hi > lo else 1.0
    bin_ = F.least(
        F.greatest(F.floor((v.cast("double") - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(buckets - 1),
    ).cast("int")
    hist = data.groupBy(*g, bin_.alias("__b")).agg(F.count("*").alias("__c"))
    w_cum = Window.partitionBy(*g).orderBy("__b")
    w_all = Window.partitionBy(*g)
    cum = hist.select(
        *g,
        "__b",
        "__c",
        (F.sum("__c").over(w_cum) - F.col("__c")).alias("__before"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    per_q = []
    for label, num, den in quantiles:
        target = F.expr(f"({num} * __n + {den - 1}) div {den}")
        per_q.append(
            cum.filter(
                (F.col("__before") < target)
                & ((F.col("__before") + F.col("__c")) >= target)
            ).select(
                *g, "__b", "__before", target.alias("__t"), F.lit(label).alias("q")
            )
        )
    qbuckets = per_q[0]
    for nxt in per_q[1:]:
        qbuckets = qbuckets.unionByName(nxt)
    in_bucket = data.select(*g, v.cast("double").alias("__v"), bin_.alias("__b")).join(
        qbuckets, [*g, "__b"]
    )
    w_rank = Window.partitionBy(*g, "q").orderBy("__v")
    return (
        in_bucket.withColumn("__r", F.row_number().over(w_rank))
        .filter(F.col("__r") == F.col("__t") - F.col("__before"))
        .select(*g, "q", F.col("__v").alias("value"))
    )


def grouped_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    buckets: int = 1024,
) -> DataFrame:
    """EXACT per-group lower median — :func:`grouped_quantile` at
    q = 1/2 (ceil(n/2) == the lower median's (n+1) DIV 2), kept as
    the WordMedian-parity surface (EX/WordMedian.java:1)."""
    g = list(group_cols)
    return grouped_quantile(
        df, g, value_col, [("median", 1, 2)], buckets=buckets
    ).select(*g, F.col("value").alias("median"))


#: Mersenne prime 2^61 - 1: the checksum modulus — fits BIGINT in
#: every engine, and a prime modulus means colliding a corrupted row
#: set requires hitting the hash, not a power-of-two truncation.
FINGERPRINT_MOD = 2305843009213693951


def _row_canonical(cols: Sequence[str]) -> Column:
    """Canonical string form of a row for fingerprinting: every column
    cast to string with an explicit NULL marker (concat_ws silently
    DROPS nulls, which would collide (a, NULL, b) with (a, b, NULL)),
    joined on a separator no data column contains."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return F.concat_ws("\x1f", *parts)


def table_fingerprint(
    df: DataFrame,
    cols: Sequence[str],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Order-independent row-level table checksum: per group,
    ``n_rows`` and ``fingerprint`` = SUM of 60-bit row hashes folded
    mod 2^61-1. Addition commutes, so ANY partitioning / read order /
    engine yields the identical fingerprint — the row-content
    counterpart to DistCp's file-level validation
    (sources/distcp.py), and the primitive a 100 TB migration uses to
    certify a copy without moving data twice: fingerprint source and
    destination independently, compare k rows.

    Accumulation shape (bench r9, −27% on the sf0.1 headline): the
    row hash is split into four 15-bit chunks summed as BIGINT inside
    whole-stage codegen (a per-row DECIMAL(38,0) cast + 128-bit sum
    measured ~0.6 s of the 2.2 s query; shiftright/bitwiseAND are
    free), then the four chunk sums recombine in DECIMAL once per
    GROUP: (s3*2^45 + s2*2^30 + s1*2^15 + s0) mod 2^61-1 — identical
    value, exact. Overflow bound: each chunk sum <= n_rows * 2^15, so
    BIGINT holds up to 2^48 rows PER GROUP (~2.8e14 — beyond any
    100 TB table); past it Spark's ANSI sum fails loudly, never
    silently wraps. One scan, partial-agg shuffle of
    (group, count, 4 sums) rows only.
    """
    from hadoop_main_spark.functions.hashing import hash64

    h = hash64(_row_canonical(cols))
    g = list(group_cols)
    chunk_sums = [
        F.sum(F.shiftright(h, 15 * k).bitwiseAND(F.lit((1 << 15) - 1)))
        for k in range(4)
    ]
    combined = sum(
        (s.cast("decimal(38,0)") * F.lit(1 << (15 * k)) for k, s in
         enumerate(chunk_sums[1:], start=1)),
        chunk_sums[0].cast("decimal(38,0)"),
    )
    agg = [
        F.count("*").cast("bigint").alias("n_rows"),
        (combined % F.lit(FINGERPRINT_MOD)).cast("bigint").alias("fingerprint"),
    ]
    return df.groupBy(*g).agg(*agg) if g else df.agg(*agg)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE INTO — the lakehouse upsert primitive (ANSI
    SQL:2003 MERGE; the write-side counterpart to
    :func:`keyed_snapshot_diff`). ``target`` and ``source`` both carry
    ``key_cols`` + ``value_cols``; ``source`` may carry a boolean
    ``delete_col`` marker. Actions:

    * matched + delete        → row removed
    * matched + not delete    → target's value_cols replaced by source's
    * not matched + not delete → inserted
    * not matched + delete    → no-op
    * target-only             → kept verbatim

    Precondition (same as Delta Lake's MERGE): source keys are unique —
    multiple source matches per target key make the merge
    nondeterministic. ENFORCED, not just documented (Delta raises
    "multiple source rows matched"): a count window over the source
    keys feeds a ``raise_error`` guard, so a duplicated change set
    fails the job loudly instead of silently fanning out target rows.
    The window partitions on the same keys as the join, so it rides
    the source's existing key shuffle — no extra exchange of the
    (typically much larger) target.

    Shape: each side projects to keys+values at the scan, then ONE
    co-partitioned full-outer join on the keys decides all five action
    branches via a presence flag + per-column conditional — no window,
    no second shuffle, row width independent of the action logic. At
    100 TB the join partitions on the primary key exactly like the
    snapshot-diff audit that typically precedes it.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    vals = list(value_cols)
    n_dup = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    del_raw = (
        F.coalesce(F.col(delete_col), F.lit(False))
        if delete_col
        else F.lit(False)
    )
    src = source.select(
        *keys,
        *[F.col(c).alias(f"__s_{c}") for c in vals],
        F.when(
            n_dup > 1,
            F.raise_error(
                F.concat(
                    F.lit("merge_into: multiple source rows share key ("),
                    F.concat_ws(
                        ", ", *[F.col(k).cast("string") for k in keys]
                    ),
                    F.lit(") — dedup the change set first"),
                )
            ).cast("boolean"),
        )
        .otherwise(del_raw)
        .alias("__del"),
    )
    j = target.select(*keys, *vals).join(src, keys, "full_outer")
    # __del is non-null exactly on rows that have a source side.
    src_present = F.col("__del").isNotNull()
    return j.filter(~(src_present & F.col("__del"))).select(
        *keys,
        *[
            F.when(src_present, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
            for c in vals
        ],
    )


def keyed_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC-style diff of two table snapshots by primary key: one row
    per key present in either side with ``status`` in
    ``added`` (new only) / ``removed`` (old only) / ``changed`` (both,
    compared columns differ) / ``unchanged``. Comparison is by the
    canonical row hash of ``compare_cols`` — each side reduces to
    (key, hash) BEFORE the join, so the full-outer join shuffles
    narrow rows regardless of row width, and the join is
    co-partitioned on the key (the incremental-ingest audit shape:
    what changed between yesterday's and today's snapshot of a
    100 TB table).
    """
    from hadoop_main_spark.functions.hashing import hash64

    keys = list(key_cols)
    oh = old.select(*keys, hash64(_row_canonical(compare_cols)).alias("__h_old"))
    nh = new.select(*keys, hash64(_row_canonical(compare_cols)).alias("__h_new"))
    j = oh.join(nh, keys, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, status.alias("status"))


def merge_partial_aggs(
    target: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    add_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance for distributive
    aggregates — the combine step :func:`merge_into` (replace
    semantics) deliberately does not provide: a stored per-key
    aggregate view absorbs a new wave's partial aggregates WITHOUT
    rescanning the base corpus (Delta Lake's ``MERGE ... WHEN MATCHED
    THEN UPDATE SET n = t.n + s.n`` pattern; the view-maintenance
    analog of cc_incremental_resolution's cluster maintenance).

    ``add_cols`` combine by addition (COUNT/SUM partials),
    ``min_cols`` by least, ``max_cols`` by greatest — exactly the
    mergeable-summary algebra, so maintained state equals the
    from-scratch aggregate VERBATIM for any wave split (associative +
    commutative; the one-shot-equality oracle checks precisely this).
    AVG rides as (sum, count); non-distributive aggregates (exact
    median, distinct count) need the sketch family instead.

    Shape: each side projects to keys+partials at the scan, then ONE
    co-partitioned full-outer join on the view key — identical
    physical shape to merge_into, so at 100 TB the maintenance cost
    is proportional to |delta keys| + |view|, never |base corpus|.
    """
    keys = list(key_cols)
    vals = [*add_cols, *min_cols, *max_cols]
    tt = target.select(
        *keys, *[F.col(c).alias(f"__t_{c}") for c in vals]
    )
    dd = delta.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in vals]
    )
    j = tt.join(dd, keys, "full_outer")
    out = [*keys]
    for c in add_cols:
        out.append(
            (
                F.coalesce(F.col(f"__t_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(c)
        )
    for c in min_cols:
        # F.least skips nulls (returns the non-null side), which is
        # exactly the partial-combine semantics for an outer join
        out.append(F.least(F.col(f"__t_{c}"), F.col(f"__d_{c}")).alias(c))
    for c in max_cols:
        out.append(F.greatest(F.col(f"__t_{c}"), F.col(f"__d_{c}")).alias(c))
    return j.select(*out)
