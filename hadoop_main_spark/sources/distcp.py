"""DistCp-style parallel copy as a Spark job (SURVEY.md §2.11).

Reference: hadoop-tools/hadoop-distcp DistCp.java:1 — a listing pass
followed by a fleet of copy mappers (CopyMapper.java:50), with
uniform-size split assignment and post-copy size validation. Here the
listing is a DataFrame, the copy fleet is ``mapInPandas`` over a
repartitioned listing (Spark's scheduler plays DynamicInputFormat's
work-stealing role via many small partitions), and validation is a
size audit per file.

Local-filesystem paths here; on a cluster the same structure works
over any fsspec/Hadoop-FS scheme by swapping the copy callable.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

LISTING_SCHEMA = StructType(
    [
        StructField("src", StringType()),
        StructField("dst", StringType()),
        StructField("size", LongType()),
    ]
)

REPORT_SCHEMA = StructType(
    [
        StructField("src", StringType()),
        StructField("dst", StringType()),
        StructField("size", LongType()),
        StructField("copied", LongType()),
        StructField("ok", LongType()),
    ]
)


def build_listing(spark: SparkSession, src_dir: str, dst_dir: str) -> DataFrame:
    """The DistCp listing pass: enumerate files under ``src_dir`` with
    sizes and target paths (driver-side walk — listings are metadata,
    small even for huge datasets; a 100 TB corpus with 128 MB files is
    ~800k rows)."""
    rows = []
    src_dir = os.path.abspath(src_dir)
    # dst paths must be canonical too: the copy runs in executor
    # processes (cwd may differ from the driver's) and distcp_sync
    # full-outer-joins these paths against a dst-side walk of
    # abspath(dst_dir) — a relative dst_dir would never match
    dst_dir = os.path.abspath(dst_dir)
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            sp = os.path.join(root, f)
            rel = os.path.relpath(sp, src_dir)
            rows.append((sp, os.path.join(dst_dir, rel), os.path.getsize(sp)))
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def size_balanced_buckets(listing, n: int):
    """Assign each listed file a bucket 0..n-1 by size-descending
    round-robin — balanced task byte-loads (adjacent large files in
    one directory would otherwise land in the same task). Shared by
    distcp and create_har (one definition). Route the result through
    ``repartitionByRange(n, "bucket")``: a hash repartition on the
    bucket id collides distinct buckets into one task and leaves
    others empty (pmod(murmur3) is not a bijection on 0..n-1 —
    review-r4b), defeating the balancing this ranking computes.

    The single-partition window over the FILE LISTING (≤ #files rows)
    is intentional; the non-foldable constant key suppresses the
    misleading WindowExec single-partition warning."""
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy(F.pmod(F.length("src"), F.lit(1))).orderBy(
            F.desc("size"), F.asc("src")
        )
    )
    return listing.withColumn("bucket", (rank - 1) % n)


def distcp(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    tasks: int | None = None,
    update: bool = False,
    listing: "DataFrame | None" = None,
) -> DataFrame:
    """Copy ``src_dir`` → ``dst_dir`` in parallel; returns the per-file
    report (size, bytes copied, ok flag). Large files spread across
    tasks by size-aware round-robin of the listing (the uniform-size
    splitter, DistCp's default assignment policy). ``update=True`` is
    DistCp's -update: files whose destination already exists with the
    same size are skipped (reported with copied == size, ok == 1) —
    the incremental-sync mode DistCpSync builds on."""
    if listing is None:
        listing = build_listing(spark, src_dir, dst_dir)
    n = tasks or spark.sparkContext.defaultParallelism
    ranked = size_balanced_buckets(listing, n)

    def copy_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import shutil

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    if (
                        update
                        and os.path.exists(r.dst)
                        and os.path.getsize(r.dst) == r.size
                    ):
                        out.append((r.src, r.dst, r.size, r.size, 1))
                        continue
                    os.makedirs(os.path.dirname(r.dst), exist_ok=True)
                    shutil.copyfile(r.src, r.dst)
                    copied = os.path.getsize(r.dst)
                    out.append((r.src, r.dst, r.size, copied, int(copied == r.size)))
                except OSError:
                    out.append((r.src, r.dst, r.size, 0, 0))
            yield pd.DataFrame(out, columns=[f.name for f in REPORT_SCHEMA.fields])

    return (
        ranked.repartitionByRange(n, "bucket")
        .drop("bucket")
        .mapInPandas(copy_batch, REPORT_SCHEMA)
    )


SYNC_REPORT_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("action", StringType()),
        StructField("size", LongType()),
        StructField("ok", LongType()),
    ]
)


def distcp_sync(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    tasks: int | None = None,
) -> DataFrame:
    """Incremental sync: DistCp ``-update -delete`` semantics
    (hadoop-tools/hadoop-distcp DistCpSync.java:1 computes the same
    copy/delete plan from snapshot diffs; here the diff comes from a
    full-outer join of the two listings — no snapshots on a plain FS,
    identical resulting sync actions):

    - source-only or size-changed files → ``copy``
    - same-size files → ``skip`` (size equality, like :func:`distcp`
      ``update=True``; the reference optionally adds checksums)
    - destination-only files → ``delete``

    The action plan is a DataFrame join, the execution a mapInPandas
    fleet like distcp's copy mappers. Returns (path, action, size,
    ok) per file; empty directories left behind by deletes are not
    pruned (the reference keeps them too unless -prune)."""
    src = build_listing(spark, src_dir, dst_dir).select(
        F.col("dst").alias("path"), F.col("src"), F.col("size").alias("src_size")
    )
    dst = build_listing(spark, dst_dir, dst_dir).select(
        F.col("src").alias("path"), F.col("size").alias("dst_size")
    )
    plan = (
        src.join(dst, "path", "full_outer")
        .select(
            "path",
            "src",
            F.coalesce("src_size", F.lit(0)).alias("size"),
            F.when(F.col("src").isNull(), "delete")
            .when(
                F.col("dst_size").isNull() | (F.col("dst_size") != F.col("src_size")),
                "copy",
            )
            .otherwise("skip")
            .alias("action"),
        )
    )
    n = tasks or spark.sparkContext.defaultParallelism

    def apply_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import shutil

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.action == "copy":
                        os.makedirs(os.path.dirname(r.path), exist_ok=True)
                        shutil.copyfile(r.src, r.path)
                        ok = int(os.path.getsize(r.path) == r.size)
                    elif r.action == "delete":
                        os.remove(r.path)
                        ok = 1
                    else:
                        ok = 1
                    out.append((r.path, r.action, r.size, ok))
                except OSError:
                    out.append((r.path, r.action, r.size, 0))
            yield pd.DataFrame(out, columns=[f.name for f in SYNC_REPORT_SCHEMA.fields])

    # execute ONCE and return the collected report: deletes are not
    # idempotent, so re-executing the lazy side-effecting plan (a
    # second action on the returned frame, or a task retry after the
    # os.remove landed) would re-delete and misreport ok=0 on files
    # that synced correctly — same reasoning as har.create_har
    rows = plan.repartition(n).mapInPandas(apply_batch, SYNC_REPORT_SCHEMA).collect()
    return spark.createDataFrame(rows, SYNC_REPORT_SCHEMA)


def distch(
    spark: SparkSession,
    target_dir: str,
    mode: int | None = None,
    tasks: int | None = None,
) -> DataFrame:
    """DistCh (hadoop-tools/hadoop-extras/.../DistCh.java:1): bulk
    metadata change over a file tree as a Spark job — same listing +
    mapInPandas fleet as distcp, applying chmod instead of copy.
    Returns (src, dst, size, copied=0, ok) rows; ownership changes are
    intentionally not attempted (container-dependent)."""
    listing = build_listing(spark, target_dir, target_dir)
    n = tasks or spark.sparkContext.defaultParallelism

    def apply_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    if mode is not None:
                        os.chmod(r.src, mode)
                    out.append((r.src, r.dst, r.size, 0, 1))
                except OSError:
                    out.append((r.src, r.dst, r.size, 0, 0))
            yield pd.DataFrame(out, columns=[f.name for f in REPORT_SCHEMA.fields])

    return listing.repartition(n).mapInPandas(apply_batch, REPORT_SCHEMA)


def distcp_dynamic(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    slots: int | None = None,
    steal_factor: int = 4,
    update: bool = False,
    max_chunks: int = 10_000,
) -> DataFrame:
    """DistCp dynamic-strategy analog (hadoop-tools/hadoop-distcp/...
    /mapred/lib/DynamicInputFormat.java:1): instead of one fixed
    split per copy slot, the listing splits into ``steal_factor x
    slots`` size-balanced CHUNKS, each chunk one Spark task. Spark's
    task queue plays DynamicInputFormat's chunk-claim protocol: a
    straggling executor holds ONE chunk (not 1/slots of all bytes)
    while idle executors keep pulling chunks — work stealing without
    any bespoke claim files. The reference's tuning bounds carry
    over: chunk count is clamped to [slots, max_chunks] and never
    exceeds the file count (a chunk below one file is pure task
    overhead, DynamicInputFormat's MAX_CHUNKS_TOLERABLE concern)."""
    slots = slots or spark.sparkContext.defaultParallelism
    listing = build_listing(spark, src_dir, dst_dir)
    n_files = listing.count()
    chunks = max(min(steal_factor * slots, n_files, max_chunks), min(slots, max(n_files, 1)), 1)
    return distcp(spark, src_dir, dst_dir, tasks=chunks, update=update, listing=listing)
