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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64

HASH_SPACE = float(2**60)


def kmv_estimate_col(k_used: Column | str, kth_min: Column | str, k: int) -> Column:
    """The KMV estimator as a Column — (k-1) * 2^60 / kth_min, or the
    exact count below ``k`` — shared by kmv_distinct and the
    set-algebra query so the formula exists ONCE (its SQL twin embeds
    the same HASH_SPACE literal)."""
    ku = F.col(k_used) if isinstance(k_used, str) else k_used
    km = F.col(kth_min) if isinstance(kth_min, str) else kth_min
    return F.when(ku < k, ku.cast("double")).otherwise(
        (ku - 1).cast("double") * F.lit(HASH_SPACE) / km.cast("double")
    )


def kmv_distinct(df: DataFrame, col: Column | str, k: int = 256) -> DataFrame:
    """KMV distinct-count estimate of ``col``.

    Returns one row: (k_used, kth_min, est_distinct). For fewer than
    ``k`` distinct hashes the estimate is the exact distinct count.
    """
    # NULL values hash to NULL; drop them BEFORE the top-k or the
    # ascending order puts NULL first, burning a min slot that F.max
    # then skips — k_used and kth_min would come from different row
    # sets (review-r4b). COUNT(DISTINCT col) ignores NULLs; so do we.
    h = hash64(col)
    mins = df.select(h.alias("h")).where(F.col("h").isNotNull()).distinct().orderBy("h").limit(k)
    agg = mins.agg(
        F.count("*").alias("k_used"), F.max("h").alias("kth_min")
    )
    return agg.select(
        "k_used",
        "kth_min",
        kmv_estimate_col("k_used", "kth_min", k).alias("est_distinct"),
    )


# --- HyperLogLog ------------------------------------------------------------

HLL_M = 256  # 2^8 buckets
#: hash64 is uniform in [0, 2^60); the low 8 bits pick the bucket and
#: the remaining 52 bits feed the rank, so ranks live in [1, 53]
#: (rank 53 = all 52 payload bits zero).
HLL_MAX_RANK = 53
#: alpha_256 * m^2 * 2^53 — the estimate numerator, precomputed in
#: Python and embedded as the SAME double literal in Spark and the
#: SQL oracle (repr round-trips, so both engines divide the identical
#: numerator by the identical integer denominator).
HLL_NUMER = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M * float(2**53)


def hll_registers(df: DataFrame, col: Column | str, group_cols: Sequence[str] = ()) -> DataFrame:
    """HyperLogLog registers of ``col`` (optionally per group).

    Returns (group..., bucket, reg): bucket = hash64 & 255, reg = max
    over rows of the rank (1 + leading-zero count of the 52 payload
    bits, computed portably as 53 - length(bin(payload))). Registers
    are the mergeable state: max-combining register tables from any
    partitioning, shard, or stream batch yields the global sketch —
    the property that makes HLL the 100 TB distinct-counter.
    """
    # NULL inputs would create a (bucket=NULL, reg=NULL) register row
    # that inflates n_buckets_used while contributing nothing to the
    # harmonic sum (review-r4b) — distinct counting ignores NULLs
    h = hash64(col)
    w = F.shiftright(h, 8)
    rank = F.when(w == 0, F.lit(HLL_MAX_RANK)).otherwise(
        F.lit(HLL_MAX_RANK) - F.length(F.bin(w))
    )
    rows = df.select(
        *group_cols, h.bitwiseAND(F.lit(HLL_M - 1)).alias("bucket"), rank.alias("rank")
    ).where(F.col("bucket").isNotNull())
    return rows.groupBy(*group_cols, "bucket").agg(F.max("rank").alias("reg"))


def hll_estimate(registers: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Distinct-count estimate from an HLL register table.

    est = alpha_m * m^2 / Σ_buckets 2^-reg, with absent buckets
    contributing 2^-0. The harmonic sum is computed exactly as the
    integer Σ 2^(53-reg) (max 256 * 2^53 < 2^62), so the only float
    op is one double division — bit-reproducible in any engine.
    Returns (group..., n_buckets_used, est_distinct).
    """
    # SQL expr: the Python shiftleft() wrapper only takes a literal
    # shift amount, the SQL function takes a column
    pow_term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_MAX_RANK} - reg AS INT))")
    s = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_buckets_used"),
        F.sum(pow_term).alias("__s_present"),
    )
    denom = F.col("__s_present") + (F.lit(HLL_M) - F.col("n_buckets_used")) * F.lit(
        2**HLL_MAX_RANK
    )
    return s.select(
        *group_cols,
        "n_buckets_used",
        (F.lit(HLL_NUMER) / denom.cast("double")).alias("est_distinct"),
    )


def hll_merge(registers: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge register tables by bucket-wise max (drop or re-key the
    group columns first to control what is merged)."""
    return registers.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


# --- Bloom filter -----------------------------------------------------------

BLOOM_M = 65536  # bits
BLOOM_K = 4  # hash functions


def bloom_bits(
    df: DataFrame, col: Column | str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Bloom filter as a DataFrame of set bit positions (j, bit) —
    the distributed form of the reference's BloomMapFile membership
    filter (IO/BloomMapFile.java). Bit positions derive from the
    portable hash64 with per-hash salts, so the sketch (and every
    probe verdict) is reproducible in SQL. Mergeable by union-distinct;
    the materialized sketch is at most k*m rows regardless of input
    size, so it always broadcasts."""
    c = F.col(col) if isinstance(col, str) else col
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    (hash64(c, salt=f"bloom{j}") % m).alias("bit"),
                )
                for j in range(k)
            ])
        ).alias("jb")
    )
    return rows.select("jb.j", "jb.bit").distinct()


def bloom_probe(
    bits: DataFrame,
    probes: DataFrame,
    col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe the sketch: a probe is 'maybe present' iff all k of its
    bit positions are set (no false negatives; false-positive rate
    ~(1 - e^(-kn/m))^k). The bits table broadcasts; the probe side
    never shuffles."""
    pos = probes.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    (hash64(col, salt=f"bloom{j}") % m).alias("bit"),
                )
                for j in range(k)
            ])
        ).alias("jb"),
    ).select(col, "jb.j", "jb.bit")
    hits = (
        pos.join(F.broadcast(bits), ["j", "bit"], "left_semi")
        .groupBy(col)
        # countDistinct, not count: duplicate probe VALUES would double
        # their hit rows and break `hits == k` (a false negative)
        .agg(F.countDistinct("j").alias("__hits"))
    )
    return probes.join(hits, col, "left").select(
        col, (F.coalesce("__hits", F.lit(0)) == k).alias("bloom_maybe")
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


def count_min_probe(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point-query an EXISTING sketch table (e.g. one accumulated by
    the streaming sink) for each row of ``items``: estimate = min over
    hash rows of the item's bucket counter. The sketch is depth x
    width rows and broadcasts.

    Geometry comes FROM the sketch when it carries depth/width columns
    (the streaming sink records them; reading it costs one tiny
    driver job over the <= depth*width-row sketch at plan time —
    intentional, validation over laziness): probing with a different width
    than the sketch was built with hashes items into the wrong bucket
    space and the min silently UNDER-estimates — the one failure mode
    count-min excludes — so an explicit mismatching depth/width raises
    instead. Bare (row, bucket, cnt) sketches fall back to the given
    or default geometry."""
    rec = (
        sketch.select("depth", "width").first()
        if "depth" in sketch.columns and "width" in sketch.columns
        else None
    )
    if rec is not None:
        for name, given, recorded in (("depth", depth, rec.depth), ("width", width, rec.width)):
            if given is not None and given != recorded:
                raise ValueError(
                    f"sketch records {name}={recorded} but probe was "
                    f"called with {name}={given}"
                )
        depth, width = rec.depth, rec.width
        sketch = sketch.select("row", "bucket", "cnt")
    depth = CM_DEPTH if depth is None else depth
    width = CM_WIDTH if width is None else width
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


def count_min_estimate(
    df: DataFrame,
    col: Column | str,
    items: DataFrame,
    item_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """Build the sketch from ``df`` and point-query it (see
    :func:`count_min_probe` for probing a persisted/streamed sketch).
    Estimate is an upper bound on the true count; exact when no
    collisions."""
    return count_min_probe(count_min_table(df, col, depth, width), items, item_col, depth, width)
