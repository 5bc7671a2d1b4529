"""Synthetic data generators as sources (SURVEY.md §2.1).

TeraGen / RandomWriter / RandomTextWriter re-expressed as
``spark.range(n)`` + deterministic column expressions: seedable,
partition-parallel, no data movement. The reference's TeraGen is a
128-bit LCG (EX/terasort/Random16.java:1) producing 100-byte
records (layout EX/terasort/TeraGen.java:55-:62); this module's
``teragen`` derives bytes from hash64 (fast, expression-only) and is
kept for RandomWriter-style workloads; the BIT-EXACT gensort port
(Random16/Unsigned16/GenSort parity, with a DuckDB oracle) lives in
``sources/teragen_exact.py`` and backs the terasort_100k query.
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
    """TeraValidate: assert global order and return a multiset checksum
    that is partitioning-independent. Reference:
    EX/terasort/TeraValidate.java:88 (per-task misorder detection),
    :122-:140 (cross-file boundary check), TeraChecksum.java:1.

    File-backed DataFrames (the written output of a total sort) are
    validated exactly the way TeraValidate does: row adjacency within
    each file via the ``_metadata.row_index`` column (a keyed self-join
    — no global ordering operation), plus a driver-side boundary chain
    over per-file summaries in file-name order (one row per file).

    Non-file DataFrames fall back to physical-partition-order scanning,
    which is only meaningful directly after a sort (before a write or
    any repartitioning) — Spark's scan-side split packing does NOT
    preserve name order on read-back, which is why the file path is
    the authority here.
    """
    try:
        # ONLY the _metadata resolution decides file-backed vs not —
        # this select is lazy (analysis-time error for non-file
        # frames). A bare except around the whole distributed
        # validation would silently reroute transient executor
        # failures into the partition-order fallback, which on
        # read-back data reports bogus misorder counts (review-r4b).
        meta = df.select(
            F.col(key).alias("__k"),
            F.col("_metadata.file_path").alias("__f"),
            F.col("_metadata.row_index").alias("__i"),
        )
    except Exception:
        return _validate_sorted_partitions(df, key)
    return _validate_sorted_files(meta)


def _gt(a, b) -> bool:
    """Python twin of Spark's ascending key order for boundary checks:
    NULL sorts FIRST, so 'a > b' is a violation only when a is
    non-null and (b is null or a > b) — bare Python comparison raised
    TypeError on a legitimately-sorted null key (review-r4b)."""
    if a is None:
        return False
    if b is None:
        return True
    return a > b


def _validate_sorted_files(meta: DataFrame) -> dict:
    """ONE job (was three: a self-join count + a per-file collect + a
    checksum collect; review-r4 cleanup): a per-file window pairs each
    row with its successor, then a single per-file aggregate emits the
    misorder count, first/last keys, row count, and checksum terms.
    The window partitions by FILE — a bounded unit by construction
    (~1 GB of rows), so no single-task funnel — and the groupBy keys
    on the same column, so the exchange is reused."""
    from pyspark.sql import Window

    w = Window.partitionBy("__f").orderBy("__i")
    stepped = meta.select(
        "__f",
        "__i",
        "__k",
        F.lead("__k").over(w).alias("__nxt"),
        # distinguishes "no successor row" from "successor key is NULL"
        F.lead(F.lit(1)).over(w).alias("__has_nxt"),
    )
    # null-consistent order check (NULL sorts first): value-then-NULL
    # is a violation a bare `>` would silently skip (NULL comparison)
    violated = (F.col("__k") > F.col("__nxt")) | (
        F.col("__k").isNotNull()
        & F.col("__nxt").isNull()
        & F.col("__has_nxt").isNotNull()
    )
    per_file = (
        stepped.groupBy("__f")
        .agg(
            F.sum(F.when(violated, 1).otherwise(0)).alias("mis"),
            F.min_by("__k", "__i").alias("first"),
            F.max_by("__k", "__i").alias("last"),
            F.count("*").alias("n"),
            # decimal(38,0): a BIGINT sum of ~2^31-sized terms wraps
            # past ~4e9 rows (review-r4b; same fix as teragen_checksum)
            F.sum((hash64("__k") % F.lit(2**31 - 1)).cast("decimal(38,0)")).alias("c"),
        )
        .collect()
    )
    per_file.sort(key=lambda r: r["__f"])
    misordered = sum(int(r["mis"] or 0) for r in per_file)
    for a, b in zip(per_file, per_file[1:]):
        if _gt(a["last"], b["first"]):
            misordered += 1
    checksum = sum(int(r["c"] or 0) for r in per_file)
    return {
        "misordered": misordered,
        "checksum": checksum,
        "rows": sum(r["n"] for r in per_file),
    }


def _validate_sorted_partitions(df: DataFrame, key: str) -> dict:
    def per_partition(idx, rows):
        first = last = None
        mis = 0
        n = 0
        for r in rows:
            k = r[0]
            if n == 0:
                first = k
            elif _gt(last, k):
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
        if _gt(prev_last, nxt_first):
            misordered += 1
    checksum = df.select(
        F.sum((hash64(key) % F.lit(2**31 - 1)).cast("decimal(38,0)")).alias("c")
    ).collect()[0]["c"]
    return {"misordered": misordered, "checksum": int(checksum or 0), "rows": rows}
