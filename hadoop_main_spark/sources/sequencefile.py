"""SequenceFile compatibility IO (SURVEY.md §2.1/§2.2).

The reference's flagship container format (IO/SequenceFile.java:222,
flat KV records with sync markers) read and written through Spark's
Hadoop-format RDD bridge — the supported migration path for existing
SequenceFile datasets. Parquet is this engine's *native* format
(columnar, pushdown, pruning); these helpers exist so a reference
user's data is readable on day one, converted once with
``sequencefile_to_parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_sequencefile(
    spark: SparkSession,
    path: str,
    key: str = "key",
    value: str = "value",
) -> DataFrame:
    """Read a SequenceFile of (Text|primitive Writable) KV pairs.
    Writable→Python conversion is Spark's builtin (Text→str,
    IntWritable/LongWritable→int, …). Reference reader:
    MRC/mapreduce/lib/input/SequenceFileInputFormat.java:1."""
    rdd = spark.sparkContext.sequenceFile(path)
    return rdd.toDF([key, value])


def write_sequencefile(df: DataFrame, path: str) -> None:
    """Write a 2-column DataFrame as a SequenceFile (first column =
    key, second = value; Writable types inferred). Reference:
    MRC/mapreduce/lib/output/SequenceFileOutputFormat.java:1."""
    if len(df.columns) != 2:
        raise ValueError("SequenceFile sink needs exactly (key, value) columns")
    df.rdd.map(tuple).saveAsSequenceFile(path)


def sequencefile_to_parquet(
    spark: SparkSession, src: str, dst: str, key: str = "key", value: str = "value"
) -> None:
    """One-time migration: SequenceFile → Parquet (the native format)."""
    read_sequencefile(spark, src, key, value).write.mode("overwrite").parquet(dst)
