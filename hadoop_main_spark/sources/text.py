"""Text-family sources (SURVEY.md §2.1).

Spark-first readers replacing the reference's InputFormats. File
splitting/packing knobs the reference exposes per-format
(FileInputFormat split size, CombineFileInputFormat packing) are
session-level here: `spark.sql.files.maxPartitionBytes` /
`openCostInBytes` govern every file source uniformly.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text(spark: SparkSession, path: str, col: str = "line") -> DataFrame:
    """TextInputFormat / LineRecordReader: one row per line.
    (Byte offsets are an implementation detail the reference leaks;
    use zipWithIndex-style ranks only if a consumer truly needs them.)
    Reference: MRC/mapreduce/lib/input/TextInputFormat.java:1."""
    return spark.read.text(path).withColumnRenamed("value", col)


def read_kv_text(
    spark: SparkSession, path: str, sep: str = "\t", key: str = "key", value: str = "value"
) -> DataFrame:
    """KeyValueTextInputFormat: split each line on the FIRST separator;
    missing separator → whole line is key, empty value.
    Reference: MRC/mapreduce/lib/input/KeyValueLineRecordReader.java:1."""
    from hadoop_main_spark.operators.transforms import kv_split

    return kv_split(read_text(spark, path), "line", sep, key, value)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    widths: Sequence[int],
    names: Sequence[str] | None = None,
) -> DataFrame:
    """FixedLengthInputFormat analog over text lines: slice each line
    into fixed-width fields. Reference: MRC/mapreduce/lib/input/
    FixedLengthInputFormat.java:47 (binary records there; the text
    form covers the same layout for splittable data)."""
    names = list(names or [f"f{i}" for i in range(len(widths))])
    if len(names) != len(widths):
        # zip would silently truncate to the shorter list, dropping
        # trailing fields with no error (review-r4b)
        raise ValueError(f"{len(widths)} widths but {len(names)} names")
    df = read_text(spark, path)
    cols = []
    off = 1
    for w, nm in zip(widths, names):
        cols.append(F.substring("line", off, w).alias(nm))
        off += w
    return df.select(*cols)


def read_nline(spark: SparkSession, path: str, lines_per_split: int) -> DataFrame:
    """NLineInputFormat: control parallelism as ~N lines per
    partition. Reference: MRC/mapreduce/lib/input/NLineInputFormat.java:61.
    In Spark parallelism is decoupled from record count; we honor the
    *intent* by repartitioning to ceil(total/N) partitions."""
    df = read_text(spark, path)
    total = df.count()
    n_parts = max(1, -(-total // lines_per_split))
    return df.repartition(n_parts)


def multiple_inputs(
    sources: Sequence[tuple[DataFrame, Callable[[DataFrame], DataFrame] | None]],
) -> DataFrame:
    """MultipleInputs: per-source transform ("per-path Mapper"), then
    union by name. Reference: MRC/mapreduce/lib/input/MultipleInputs.java:40."""
    if not sources:
        raise ValueError("multiple_inputs needs at least one source")
    outs = [(fn(df) if fn else df) for df, fn in sources]
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def auto_input(spark: SparkSession, path: str) -> DataFrame:
    """AutoInputFormat analog: pick a reader from the file extension
    (parquet / csv / json / text). Reference: ST/AutoInputFormat.java:1
    (sequencefile-vs-text sniffing; extension dispatch is the
    DataFrame-era equivalent)."""
    low = path.lower()
    if low.endswith(".parquet"):
        return spark.read.parquet(path)
    if low.endswith(".csv") or low.endswith(".tsv"):
        sep = "\t" if low.endswith(".tsv") else ","
        return spark.read.option("header", "true").option("sep", sep).csv(path)
    if low.endswith(".json") or low.endswith(".jsonl"):
        return spark.read.json(path)
    if low.endswith(".orc"):
        return spark.read.orc(path)
    if low.endswith(".avro"):
        # Prefer Spark's avro reader (full schema coverage) when the
        # spark-avro module is on the classpath; otherwise fall back to
        # the pure-Python container codec (sources/avro.py — flat
        # primitive records, the TESTDATA shape)
        try:
            return spark.read.format("avro").load(path)
        except Exception as e:  # pragma: no cover - env-dependent
            # only reroute the source-lookup failure — a path error or
            # schema problem from a WORKING avro reader must surface
            # as itself, not be silently retried on the fallback
            msg = str(e)
            if "Failed to find data source" in msg or "ClassNotFound" in msg:
                from hadoop_main_spark.sources.avro import read_avro

                return read_avro(spark, path)
            raise
    return read_text(spark, path)


def read_xml_records(
    spark: SparkSession, path: str, tag: str, col: str = "record"
) -> DataFrame:
    """StreamXmlRecordReader analog (ST/StreamXmlRecordReader.java:1):
    one row per ``<tag>…</tag>`` element. Files are read whole (one
    row per file) then split by pattern — matching the reference's
    begin/end-mark scan. For huge single XML files prefer converting
    upstream; for many-file corpora this parallelizes per file."""
    import re as _re

    whole = spark.read.text(path, wholetext=True)
    # escape the tag: XML names may contain regex metacharacters
    # ('.', '-') and an unescaped '.' would match wrong elements
    # (review-r4b)
    etag = _re.escape(tag)
    pat = f"(?s)<{etag}[\\s>].*?</{etag}>"
    return whole.select(
        F.explode(F.regexp_extract_all("value", F.lit(pat), F.lit(0))).alias(col)
    )
