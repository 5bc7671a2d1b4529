"""Driver-gate queries for the SURVEY §2 rows that were previously
pytest-only (verdict r10 "Next round" #1): NLineInputFormat,
CombineFileInputFormat small-file packing + compaction,
MultipleOutputs routing, the three explicit partitioners
(Hash/KeyFieldBased/Binary) as partition-histogram queries, MapFile
point lookup, and the counters framework — each with a closed-form
DuckDB oracle, so every §2 operator has a green CORRECTNESS row.

Fixture discipline: roundtrip queries write to tempfile.mkdtemp()
(the seqfile/fixedwidth/csv precedent — a shared FS on a real
cluster), and the oracle computes the same answer on the ORIGINAL
parquet, so the write→read machinery is what gets verified.

The partitioner histograms compute the REFERENCE'S partition
functions (Java int32 hash semantics) explicitly via
operators/partitioning.py's engine-exact helpers — Spark's internal
Murmur3 satisfies the same contract but no external oracle can
replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_main_spark.operators.partitioning import (
    java_long_hash_partition,
    java_long_hash_partition_sql,
    java_string_hash31,
    java_string_hash31_sql,
)
from hadoop_main_spark.plans.registry import query, t

_NLINE_N = 100      # lines per split (NLineInputFormat's N)
_N_REDUCERS = 7     # numReduceTasks for the partition histograms —
#                     prime and != any power of two so the mod step
#                     actually mixes (a 2^k count only reads low bits)
_H60_SQL = "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)"


def _h60() -> F.Column:
    """Order-independent 60-bit text hash term (the seqfile/csv
    checksum idiom) — built lazily: Column construction needs an
    active SparkContext, which doesn't exist at import time."""
    return F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint")


@query(
    "nline_split_agg",
    oracle=f"""
    SELECT CAST(ceil(COUNT(*) / {_NLINE_N}.0) AS BIGINT) AS n_splits,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    """,
    doc="NLineInputFormat ON the driver gate (MRC/mapreduce/lib/input/"
    "NLineInputFormat.java:61): document ids are written as one text "
    "file, read back through read_nline (N=100 lines per split), and "
    "the SPLIT ARITHMETIC itself is verified — the number of "
    "partitions the reader actually produced (countDistinct of "
    "spark_partition_id captured before any shuffle) must equal "
    "ceil(total/N) exactly, alongside lossless line count and id sum. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() write target.",
)
def nline_split_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.text import read_nline

    out = tempfile.mkdtemp(prefix="nline_") + "/ids"
    (
        t(spark, sf, "documents")
        .select(F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("value"))
        # ONE file: NLineInputFormat computes splits PER FILE, so the
        # ceil(total/N) oracle is exact only for a single file
        .coalesce(1)
        .write.mode("overwrite")
        .text(out)
    )
    back = read_nline(spark, out, _NLINE_N).withColumn(
        "__pid", F.spark_partition_id()
    )
    return back.agg(
        F.countDistinct("__pid").cast("bigint").alias("n_splits"),
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.col("line").cast("bigint")).cast("bigint").alias("sum_ids"),
    )


@query(
    "combine_pack_agg",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(64 AS BIGINT) AS files_before,
           CAST(1 AS BIGINT) AS files_after
    FROM documents GROUP BY lang
    """,
    doc="CombineFileInputFormat small-file packing + compaction ON "
    "the driver gate (MRC/mapreduce/lib/input/CombineFileInputFormat"
    ".java:67): documents are deliberately shattered into 64 tiny "
    "parquet files (the classic 100 TB operational hazard), the "
    "combine READ is asserted to pack them into fewer partitions "
    "than files (a hard Python raise, not a hope), "
    "compact_small_files rewrites them into exactly one file, and "
    "the read-back aggregate must be lossless per language with the "
    "file counts (64 -> 1) in the row. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() target.",
)
def combine_pack_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.sinks import compact_small_files

    base = tempfile.mkdtemp(prefix="combine_")
    small = f"{base}/small"
    (
        t(spark, sf, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(64)
        .write.mode("overwrite")
        .parquet(small)
    )
    # read-side packing: 64 tiny files must land in < 64 partitions
    # (maxPartitionBytes/openCostInBytes packing — the reference's
    # CombineFileSplit); a per-file partition means packing is off
    packed = spark.read.parquet(small)
    n_parts = packed.rdd.getNumPartitions()
    if n_parts >= 64:
        raise RuntimeError(
            f"combine_pack_agg: 64 small files read as {n_parts} "
            "partitions — file packing is not engaging"
        )
    info = compact_small_files(spark, small, target_file_bytes=1 << 40)
    if info["files_before"] != 64 or info["files_after"] != 1:
        raise RuntimeError(f"combine_pack_agg: unexpected compaction {info}")
    back = spark.read.parquet(info["out_path"])
    return back.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.lit(info["files_before"]).cast("bigint").alias("files_before"),
        F.lit(info["files_after"]).cast("bigint").alias("files_after"),
    )


@query(
    "multiple_outputs_agg",
    oracle=f"""
    SELECT lang AS route, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           md5(CAST(SUM({_H60_SQL}) AS VARCHAR)) AS text_checksum
    FROM documents GROUP BY lang
    """,
    doc="MultipleOutputs named side-output routing ON the driver gate "
    "(MRC/mapreduce/lib/output/MultipleOutputs.java:408): documents "
    "route into one named parquet sink per language via "
    "multiple_outputs' predicate map, each side output is read back "
    "INDEPENDENTLY, and every route's row count, id sum, and "
    "order-independent 60-bit text checksum must equal the oracle's "
    "per-language aggregate on the original parquet — a row routed "
    "to the wrong sink (or dropped, or duplicated) moves two rows. "
    "LOCAL-MODE CONTRACT: tempfile.mkdtemp() target.",
)
def multiple_outputs_agg(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.sinks import multiple_outputs

    langs = ["de", "en", "es", "fr", "zh"]
    d = t(spark, sf, "documents").select("doc_id", "lang", "text")
    base = tempfile.mkdtemp(prefix="multiout_")
    paths = multiple_outputs(
        d, {lg: F.col("lang") == lg for lg in langs}, base
    )
    parts = []
    for lg in langs:
        back = spark.read.parquet(paths[lg])
        parts.append(
            back.select(F.lit(lg).alias("route"), "doc_id", "text")
            .groupBy("route")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("doc_id").cast("bigint").alias("sum_ids"),
                F.md5(
                    F.sum(_h60().cast("decimal(38,0)")).cast("string")
                ).alias("text_checksum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "hash_partition_hist",
    oracle=f"""
    WITH k AS (SELECT o_orderkey * 2654435761 AS key FROM orders)
    SELECT {java_long_hash_partition_sql('key', _N_REDUCERS)} AS pid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(key % 1000003) AS BIGINT) AS sum_keys_mod
    FROM k GROUP BY pid ORDER BY pid
    """,
    doc="HashPartitioner ON the driver gate (MRC/mapreduce/lib/"
    "partition/HashPartitioner.java:31 with LongWritable.hashCode, "
    "IO/LongWritable.java:99): every order key (spread across the "
    "full 64-bit range via a Knuth multiplier so the (int)(v ^ v>>>32) "
    "fold is actually exercised) is assigned the EXACT partition id "
    "the reference's Java int32 arithmetic produces, and the "
    "per-partition histogram (count + a mod-prime key checksum: a "
    "RAW key sum overflows int64 already at the 10x tier since keys "
    "span the full 64-bit range by construction) must match the "
    "oracle replaying the same arithmetic. groupBy(pid) rides the "
    "one shuffle a real partitioner would cause — equal pids "
    "co-locate.",
)
def hash_partition_hist(spark: SparkSession, sf: str) -> DataFrame:
    key = (F.col("o_orderkey") * F.lit(2654435761)).alias("key")
    keyed = t(spark, sf, "orders").select(key)
    return (
        keyed.withColumn(
            "pid", java_long_hash_partition(F.col("key"), _N_REDUCERS)
        )
        .groupBy("pid")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("key") % 1000003).cast("bigint").alias("sum_keys_mod"),
        )
        .orderBy("pid")
    )


@query(
    "keyfield_partition_hist",
    oracle=f"""
    WITH l AS (SELECT c_name || chr(9) || c_mktsegment AS line,
                      c_mktsegment AS f2,
                      CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                        AS bal_cents
               FROM customer)
    SELECT ({java_string_hash31_sql('f2', 0, 12)}) % {_N_REDUCERS} AS pid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
    FROM l GROUP BY pid ORDER BY pid
    """,
    doc="KeyFieldBasedPartitioner ON the driver gate (MRC/mapreduce/"
    "lib/partition/KeyFieldBasedPartitioner.java:85, byte hash :126 — "
    "the streaming 'sort -k'-style partitioner): each customer row "
    "becomes a tab-separated line, field 2 (market segment) is "
    "extracted exactly as -k2,2 would, and its Java iterated 31-hash "
    "over the field's bytes (int32 wrap per step, & MAX_INT, mod R) "
    "assigns the partition id; the per-partition histogram must match "
    "the oracle replaying the byte arithmetic. Five segments over 7 "
    "reducers — collisions and empty reducers are part of the "
    "verified surface.",
)
def keyfield_partition_hist(spark: SparkSession, sf: str) -> DataFrame:
    line = F.concat_ws("\t", F.col("c_name"), F.col("c_mktsegment"))
    c = t(spark, sf, "customer").select(
        line.alias("line"),
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("bal_cents"),
    )
    f2 = F.split(F.col("line"), "\t").getItem(1)
    pid = F.pmod(java_string_hash31(f2, 0, 12), F.lit(_N_REDUCERS))
    return (
        c.withColumn("pid", pid)
        .groupBy("pid")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("bal_cents").cast("bigint").alias("sum_bal_cents"),
        )
        .orderBy("pid")
    )


@query(
    "binary_partition_hist",
    oracle=f"""
    WITH k AS (SELECT substr(p_name, 1, 6) AS slice,
                      p_partkey
               FROM part)
    SELECT ({java_string_hash31_sql('slice', 1, 6)}) % {_N_REDUCERS} AS pid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(p_partkey) AS BIGINT) AS sum_keys
    FROM k GROUP BY pid ORDER BY pid
    """,
    doc="BinaryPartitioner ON the driver gate (MRC/mapreduce/lib/"
    "partition/BinaryPartitioner.java:1, hash = WritableComparator."
    "hashBytes, IO/WritableComparator.java:187 — init 1, iterated "
    "31-hash): the configured byte slice [0, 6) of each part name is "
    "hashed with the reference's exact int32 arithmetic and the "
    "per-partition histogram must match the oracle replaying it. The "
    "slice (not the whole key) is the point — BinaryPartitioner's "
    "left/right offsets partition on a key PREFIX so related keys "
    "co-locate.",
)
def binary_partition_hist(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part").select(
        F.substring("p_name", 1, 6).alias("slice"), "p_partkey"
    )
    pid = F.pmod(java_string_hash31(F.col("slice"), 1, 6), F.lit(_N_REDUCERS))
    return (
        p.withColumn("pid", pid)
        .groupBy("pid")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("p_partkey").cast("bigint").alias("sum_keys"),
        )
        .orderBy("pid")
    )


@query(
    "mapfile_point_lookup",
    oracle="""
    WITH b AS (SELECT MIN(doc_id) AS kmin, MAX(doc_id) AS kmax
               FROM documents),
    mid AS (SELECT MIN(doc_id) AS kmid
            FROM documents, b WHERE doc_id > (kmin + kmax) // 2)
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           md5(text) AS text_md5
    FROM documents, b, mid
    WHERE doc_id IN (kmin, kmax, kmid)
    ORDER BY doc_id
    """,
    doc="MapFile point lookup ON the driver gate (IO/MapFile.java — "
    "Reader.get :677, the index'd binarySearch+seek :649): documents "
    "are written through write_mapfile (bucketed by key hash, sorted "
    "within buckets, parquet stats as the index file), then THREE "
    "deterministic keys (min, max, and the first key past the "
    "midpoint) are fetched via mapfile_lookup — each lookup prunes to "
    "ONE bucket directory (partition filter) and skips row groups "
    "inside it — and the fetched rows must match the oracle's direct "
    "selection byte-for-byte (text md5). LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() target.",
)
def mapfile_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.layouts import mapfile_lookup, write_mapfile

    d = t(spark, sf, "documents").select("doc_id", "lang", "n_chars", "text")
    path = tempfile.mkdtemp(prefix="mapfile_") + "/docs"
    write_mapfile(d, path, key="doc_id", n_buckets=16)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    kmid = d.filter(F.col("doc_id") > (lo + hi) // 2).agg(
        F.min("doc_id")
    ).collect()[0][0]
    parts = [
        mapfile_lookup(spark, path, k) for k in (lo, kmid, hi)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("text_md5"),
    ).orderBy("doc_id")


@query(
    "counters_agg",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_value,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
    FROM events
    """,
    doc="Counters framework ON the driver gate (MRC/mapreduce/"
    "Counter.java:1, TaskCounter.java:28): four named accumulators "
    "(records seen, click events, null values, event-id sum) are "
    "incremented EXECUTOR-SIDE from an Arrow-batched kernel during "
    "one pass over events — vectorized per batch, the TaskCounter "
    "pattern, never per row — then read on the driver after the "
    "action and emitted as a one-row DataFrame that must match the "
    "oracle's direct aggregates. Exactly-once at the gate: local "
    "mode never retries tasks; on a real cluster counters are "
    "Spark-accumulator semantics (at-least-once on retry), same as "
    "the reference's task counters on speculative re-execution.",
)
def counters_agg(spark: SparkSession, sf: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from hadoop_main_spark.functions.counters import Counters

    c = Counters(spark)
    acc_rec = c.counter("records")
    acc_click = c.counter("clicks")
    acc_null = c.counter("null_value")
    acc_ids = c.counter("sum_event_ids")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            acc_rec.add(len(b))
            acc_click.add(int((b["event_type"] == "click").sum()))
            acc_null.add(int(b["value"].isna().sum()))
            acc_ids.add(int(b["event_id"].sum()))
            yield pd.DataFrame({"n": [len(b)]})

    forced = (
        t(spark, sf, "events")
        .select("event_id", "event_type", "value")
        .mapInPandas(run, "n long")
    )
    # the action that populates the accumulators (reference: counters
    # are published when the task commits)
    forced.agg(F.sum("n")).collect()
    return spark.createDataFrame(
        [
            (
                c.value("records"),
                c.value("clicks"),
                c.value("null_value"),
                c.value("sum_event_ids"),
            )
        ],
        "n_records long, n_clicks long, n_null_value long,"
        " sum_event_ids long",
    )
