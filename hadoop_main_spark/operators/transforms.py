"""Per-record transforms (projection / filter / flatMap family).

Spark-first re-expressions of the reference's mapper library
(reference: MRC/mapreduce/lib/map/*.java, lib/fieldsel/*.java,
EX/WordCount.java:36, EX/Grep.java:68). Every operator here is a
pure Column/DataFrame expression — narrow transformations that fuse
into one whole-stage-codegen span, the Catalyst equivalent of the
reference's ChainMapper (MRC/mapreduce/lib/chain/ChainMapper.java:84)
where chained maps run in a single task with no materialization.
"""

from __future__ import annotations

import re

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\s+"


def tokenize(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Split free text into a token array, dropping empty tokens.

    Reference: TokenCounterMapper (MRC/mapreduce/lib/map/
    TokenCounterMapper.java:1) — StringTokenizer on whitespace.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != "")


def explode_tokens(
    df: DataFrame, col: str, out: str = "token", pattern: str = TOKEN_PATTERN
) -> DataFrame:
    """text column → one row per token (mapper-as-UDTF shape)."""
    return df.select(F.explode(tokenize(col, pattern)).alias(out))


def regex_matches(df: DataFrame, col: str, pattern: str, out: str = "match") -> DataFrame:
    """One row per regex match in ``col`` — the map half of Grep
    (reference: MRC/mapreduce/lib/map/RegexMapper.java:1). The
    pattern is passed as a literal Column, never interpolated into
    SQL text (string interpolation eats backslash classes like \\d
    and breaks on quotes)."""
    return df.select(
        F.explode(
            F.regexp_extract_all(F.col(col), F.lit(pattern), F.lit(0))
        ).alias(out)
    )


def grep(df: DataFrame, col: str, pattern: str, k: int | None = None) -> DataFrame:
    """Full Grep query: extract matches → count → sort desc.

    Reference: EX/Grep.java:68-:91 (two chained MR jobs; here a
    single multi-stage plan with map-side partial aggregation).
    Ties broken by match text so top-k is deterministic.
    """
    counted = regex_matches(df, col, pattern).groupBy("match").agg(
        F.count("*").alias("cnt")
    )
    ranked = counted.orderBy(F.desc("cnt"), F.asc("match"))
    return ranked.limit(k) if k is not None else ranked


def inverse(df: DataFrame, key: str = "key", value: str = "value") -> DataFrame:
    """Swap key and value columns (reference: MRC/mapreduce/lib/map/
    InverseMapper.java:1)."""
    others = [c for c in df.columns if c not in (key, value)]
    return df.select(F.col(value).alias(key), F.col(key).alias(value), *others)


def identity(df: DataFrame) -> DataFrame:
    """Reference: MRC/mapred/lib/IdentityMapper.java:1 — a no-op."""
    return df


def chain(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Compose transforms in one task, no shuffle between them.

    Reference: ChainMapper/ChainReducer (MRC/mapreduce/lib/chain/
    Chain.java:1). In Spark narrow stages fuse automatically; this
    helper just makes the [M+ RM*] pipeline shape explicit.
    """
    for stage in stages:
        df = stage(df)
    return df


def kv_split(
    df: DataFrame, col: str = "line", sep: str = "\t", key: str = "key", value: str = "value"
) -> DataFrame:
    """Split a text line into (key, value) on the FIRST separator.

    Reference: KeyValueLineRecordReader (MRC/mapreduce/lib/input/
    KeyValueLineRecordReader.java:1): missing separator → whole line
    is the key and the value is empty.
    """
    # F.split takes a REGEX: escape the separator so sep='|' or '.'
    # splits on the literal character, not on everything
    parts = F.split(F.col(col), re.escape(sep), 2)
    return df.select(
        parts.getItem(0).alias(key),
        F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("")).alias(value),
    )


# --- field selection (Unix-cut style) --------------------------------------


def parse_field_spec(spec: str) -> list[tuple[int, int | None]]:
    """Parse a FieldSelectionHelper spec: pieces separated by ``,``,
    each ``n`` | ``a-b`` | ``a-`` | ``-b`` (0-based, inclusive; open
    end means "through the last field").

    Reference: MRC/mapreduce/lib/fieldsel/FieldSelectionHelper.java:1.
    Returns [(start, end_or_None_exclusive_open)] ranges.
    """
    ranges: list[tuple[int, int | None]] = []
    for piece in spec.split(","):
        piece = piece.strip()
        if not piece:
            continue
        if "-" not in piece:
            i = int(piece)
            ranges.append((i, i + 1))
        else:
            a, _, b = piece.partition("-")
            start = int(a) if a else 0
            end = int(b) + 1 if b else None
            ranges.append((start, end))
    return ranges


def field_select_expr(col: Column | str, spec: str, sep: str = "\t") -> Column:
    """Select/reorder separator-delimited fields per ``spec``,
    re-joined with ``sep`` — the FieldSelectionMapper value side
    (reference: MRC/mapreduce/lib/fieldsel/FieldSelectionMapper.java:1).
    """
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    # F.split takes a REGEX — escape the separator (the kv_split rule;
    # a raw '|' or '.' would split on every character, review-r4b)
    arr = F.split(c, _re.escape(sep))
    pieces: list[Column] = []
    for start, end in parse_field_spec(spec):
        if end is None:
            # open-ended: fields start.. (slice is 1-based)
            pieces.append(F.slice(arr, start + 1, F.greatest(F.size(arr) - start, F.lit(0))))
        else:
            pieces.append(F.slice(arr, start + 1, end - start))
    joined = pieces[0] if len(pieces) == 1 else F.concat(*pieces)
    return F.array_join(joined, sep)


def field_selection(
    df: DataFrame,
    col: str,
    key_spec: str,
    value_spec: str,
    sep: str = "\t",
    key: str = "key",
    value: str = "value",
) -> DataFrame:
    """Full FieldSelectionMapper: line → (selected key fields,
    selected value fields)."""
    return df.select(
        field_select_expr(col, key_spec, sep).alias(key),
        field_select_expr(col, value_spec, sep).alias(value),
    )


def weighted_systematic_sample(
    df,
    weight_col: str,
    k: int,
    order_col: str = "doc_id",
):
    """EXACT-integer probability-proportional-to-size SYSTEMATIC
    sample (Madow '49 — the classic PPS design): rows ordered by
    ``order_col`` accumulate integer weights; row i is selected iff
    the cumulative weight crosses one of the k equally spaced
    thresholds, i.e. floor(cw_i * k / total) > floor(cw_{i-1} * k /
    total), and ``n_picks`` = the number of thresholds it crosses —
    a row holding more than total/k weight is drawn with
    MULTIPLICITY (the textbook PPS-systematic behavior), and
    sum(n_picks) == k exactly. Inclusion probability is proportional
    to weight — the data-mixing primitive quota-based corpus
    subsampling needs, and unlike Efraimidis-Spirakis key sampling
    it is EXACT INTEGER arithmetic end to end, so an external engine
    replays it bit-identically (float keys differ in the last ulp
    across engines and flip selections).

    Scale shape: the cumulative weight comes from the two-phase
    grouped_prefix_sum (range-bucketed, driver-held split points —
    never an unpartitioned window over the corpus); the total rides
    a broadcast one-row cross join. Overflow bound: cw * k must fit
    int64 — ANSI mode raises loudly past it (weights in chars: safe
    to ~10^17 total corpus chars at k=100).

    Returns the selected rows with ``pick`` (the highest threshold
    index the row crossed, 1-based) and ``n_picks`` (its draw
    multiplicity).
    """
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators.sorting import grouped_prefix_sum

    if k < 1:
        raise ValueError("weighted_systematic_sample needs k >= 1")
    d = df.withColumn("__g", F.lit(0))
    c = grouped_prefix_sum(
        d, ["__g"], [order_col], weight_col, out_col="__cw", exclusive=False
    ).drop("__g")
    tot = df.agg(F.sum(weight_col).cast("bigint").alias("__tot"))
    c = c.crossJoin(F.broadcast(tot))
    hi = F.floor(F.col("__cw") * k / F.col("__tot"))
    lo = F.floor((F.col("__cw") - F.col(weight_col)) * k / F.col("__tot"))
    return (
        c.filter(hi > lo)
        .withColumn("pick", hi.cast("bigint"))
        .withColumn("n_picks", (hi - lo).cast("bigint"))
        .drop("__cw", "__tot")
    )
