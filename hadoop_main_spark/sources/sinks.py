"""Sinks (SURVEY.md §2.2).

The reference's OutputFormats re-expressed on DataFrameWriter.
Atomic commit semantics (FileOutputCommitter's temp-dir + rename
protocol) are identical in Spark — it literally reuses the Hadoop
committer classes via HadoopMapReduceCommitProtocol.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_kv_text(df: DataFrame, path: str, sep: str = "\t", mode: str = "overwrite") -> None:
    """TextOutputFormat: ``key<sep>value`` lines (all columns joined).
    Reference: MRC/mapreduce/lib/output/TextOutputFormat.java:1."""
    # coalesce each column: concat_ws SKIPS nulls, which would drop
    # the separator slot and shift every later field (review-r4b) —
    # a null writes an EMPTY field, exactly what kv_split reads back
    line = F.concat_ws(
        sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    )
    df.select(line.alias("value")).write.mode(mode).text(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """MultipleOutputFormat path-from-key routing: output directory
    derived from column values. Reference: MRC/mapred/lib/
    MultipleOutputFormat.java:56 (generateFileNameForKeyValue:144).
    Hive-style partition dirs give the same layout plus partition
    pruning on read — the 100 TB layout primitive."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def multiple_outputs(
    df: DataFrame, routes: Mapping[str, Column], base_path: str, mode: str = "overwrite"
) -> dict[str, str]:
    """MultipleOutputs named side outputs: route rows to named sinks by
    predicate. Reference: MRC/mapreduce/lib/output/MultipleOutputs.java:175.
    One pass per route keeps each write atomic; for many routes prefer
    write_partitioned on a routing column (single pass)."""
    paths = {}
    for name, predicate in routes.items():
        out = f"{base_path.rstrip('/')}/{name}"
        df.filter(predicate).write.mode(mode).parquet(out)
        paths[name] = out
    return paths


def null_sink(df: DataFrame) -> None:
    """NullOutputFormat: execute the plan, discard output (the bench
    harness's forcing function). Reference: MRC/mapreduce/lib/output/
    NullOutputFormat.java:1."""
    df.write.format("noop").mode("overwrite").save()


def write_sorted_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str],
    n_buckets: int = 8,
) -> None:
    """MapFileOutputFormat analog: sorted + keyed-lookup-friendly
    output. Reference: MRC/mapreduce/lib/output/MapFileOutputFormat.java:1.
    A bucketed+sorted table lets later joins/aggregations on the
    bucket key skip the shuffle — the persisted form of the
    reference's co-sorted CompositeInputFormat precondition."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> dict:
    """Compact a parquet directory of many small files into files of
    ~``target_file_bytes`` — the write-side sibling of the reference's
    CombineFileInputFormat read-side packing (MRC/mapreduce/lib/input/
    CombineFileInputFormat.java:1). Small files are the classic 100 TB
    operational hazard (NameNode/listing pressure, per-file open cost,
    tiny row groups defeating parquet stats); periodic compaction is
    the standard fix.

    Sizing reads actual on-disk bytes via the file index (no data
    pass); the rewrite is one coalesce (narrow — no shuffle) unless
    ``out_path`` is None, in which case the rewrite targets a sibling
    then the caller swaps. Returns {files_before, files_after,
    bytes_total, rows}.
    """
    import math

    df = spark.read.parquet(path)
    files = df.inputFiles()
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    # ONE getContentSummary RPC for the whole tree — a per-file
    # getFileStatus loop is O(n) sequential driver round trips on
    # exactly the many-small-files workload this targets (review-r4b)
    root = jvm.org.apache.hadoop.fs.Path(path)
    total = int(
        root.getFileSystem(conf).getContentSummary(root).getLength()
    )
    n_out = max(1, math.ceil(total / target_file_bytes))
    dest = out_path or (path.rstrip("/") + "_compacted")
    df.coalesce(n_out).write.mode("overwrite").parquet(dest)
    out = spark.read.parquet(dest)
    out_files = out.inputFiles()
    # row count from the compacted output's footers (few files) — not
    # a second scan of the many-small-files source
    rows = out.count()
    return {
        "files_before": len(files),
        "files_after": len(out_files),
        "bytes_total": int(total),
        "rows": rows,
        "out_path": dest,
    }
