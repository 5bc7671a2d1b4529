"""Synthetic data generators as sources (SURVEY.md §2.1).

TeraGen / RandomWriter / RandomTextWriter re-expressed as
``spark.range(n)`` + deterministic column expressions: seedable,
partition-parallel, no data movement. The reference's TeraGen is a
128-bit LCG (EX/terasort/Random16.java:1) producing 100-byte
records (layout EX/terasort/TeraGen.java:55-:62); we keep the
layout and determinism but derive bytes from hash64 — byte-identity
with the 2008 fixtures is out of scope (SURVEY §7 'bit-exact
TeraGen' note), sortability and distribution are what matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64

#: TeraGen's printable key alphabet is ' ' .. '~' (95 symbols).
_KEY_CHARS = 95
_KEY_LEN = 10


def teragen(spark: SparkSession, rows: int, seed: int = 0, partitions: int | None = None) -> DataFrame:
    """100-byte sort records: 10-char printable key, 2-char constant,
    32-hex rowid, 48-char filler — uniform keys, deterministic given
    (rows, seed). Columns: (key string, rowid string, filler string)."""
    rng = spark.range(0, rows, 1, partitions or spark.sparkContext.defaultParallelism)
    h = hash64(F.col("id").cast("string"), salt=f"teragen-{seed}")
    # one md5 per row: slice its 32 hex chars into ten 3-hex (12-bit)
    # groups, each mapped onto the 95-symbol alphabet (bias 4096/95 ≈
    # 1%, irrelevant for sort distribution)
    hx = F.md5(F.concat(F.col("id").cast("string"), F.lit(f"§tg-{seed}")))
    key_chars = [
        F.chr(
            F.conv(F.substring(hx, 1 + 3 * i, 3), 16, 10).cast("bigint") % _KEY_CHARS + 32
        )
        for i in range(_KEY_LEN)
    ]
    rowid = F.lpad(F.conv(F.col("id").cast("string"), 10, 16), 32, "0")
    filler = F.rpad(F.upper(F.substring(F.md5(F.col("id").cast("string")), 1, 8)), 48, "X")
    return rng.select(
        F.concat(*key_chars).alias("key"),
        rowid.alias("rowid"),
        filler.alias("filler"),
        h.alias("checksum_part"),
    )


def random_text_writer(
    spark: SparkSession,
    rows: int,
    words_per_row: int = 20,
    vocab_size: int = 1000,
    seed: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """RandomTextWriter (EX/RandomTextWriter.java:1): rows of random
    words from a bounded vocabulary — deterministic given the seed.
    Column: (line string)."""
    rng = spark.range(0, rows, 1, partitions or spark.sparkContext.defaultParallelism)
    words = [
        F.concat(
            F.lit("w"),
            (hash64(F.col("id").cast("string"), salt=f"rtw-{seed}-{j}") % vocab_size).cast(
                "string"
            ),
        )
        for j in range(words_per_row)
    ]
    return rng.select(F.concat_ws(" ", *words).alias("line"))


def validate_sorted(df: DataFrame, key: str = "key") -> dict:
    """TeraValidate: assert global order (per-partition order + cross-
    partition boundary order) and return a multiset checksum that is
    partitioning-independent. Reference: EX/terasort/TeraValidate.java:88
    (misorder detection, per-task), :122-:140 (cross-file boundary
    check), TeraChecksum.java:1 (sum of record hashes). Intended to run
    on the *written* output of a total_order_sort.

    Scale shape matches the reference exactly: each partition is
    scanned once in physical row order, emitting one summary row
    (first key, last key, local misorder count); the cross-partition
    boundary check runs driver-side over #partitions rows."""

    def per_partition(idx, rows):
        first = last = None
        mis = 0
        n = 0
        for r in rows:
            k = r[0]
            if first is None:
                first = k
            elif last is not None and last > k:
                mis += 1
            last = k
            n += 1
        if n:
            yield (idx, first, last, mis, n)

    stats = sorted(
        df.select(key).rdd.mapPartitionsWithIndex(per_partition).collect()
    )
    misordered = sum(s[3] for s in stats)
    rows = sum(s[4] for s in stats)
    for (_, _, prev_last, _, _), (_, nxt_first, _, _, _) in zip(stats, stats[1:]):
        if prev_last > nxt_first:
            misordered += 1
    checksum = df.select(
        F.sum(hash64(key) % F.lit(2**31 - 1)).alias("c")
    ).collect()[0]["c"]
    return {"misordered": misordered, "checksum": int(checksum or 0), "rows": rows}
