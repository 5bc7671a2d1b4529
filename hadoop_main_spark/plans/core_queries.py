"""Core query set: scans, transforms, aggregation, sort, joins.

Each entry cites the reference operator it re-expresses (paths per
SURVEY.md aliases). Oracles are ANSI-ish DuckDB SQL over the
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_main_spark.operators import aggregate as agg
from hadoop_main_spark.operators import joins as J
from hadoop_main_spark.operators import sorting as S
from hadoop_main_spark.operators import transforms as T
from hadoop_main_spark.plans.registry import query, t

# Money values in the test data carry 2 decimals; rates (discount,
# tax) are in [0,1). Tight decimal widths keep the full
# price*(1-disc)*(1+tax) product chain under 38 digits so neither
# Spark nor the DuckDB oracle loses scale (exact, order-independent
# sums → bit-identical doubles).
DEC = "decimal(18,4)"
DEC_PRICE = "decimal(12,2)"
DEC_RATE = "decimal(4,2)"


def _d(c) -> F.Column:
    return F.col(c).cast(DEC)


def _price(c) -> F.Column:
    return F.col(c).cast(DEC_PRICE)


def _rate(c) -> F.Column:
    return F.col(c).cast(DEC_RATE)


def _one() -> F.Column:
    return F.lit(1).cast(DEC_RATE)


# ---------------------------------------------------------------------------
# Aggregation family (reference: Reducer/Combiner, lib/aggregate, word stats)
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship scan→filter→hash-agg (partial+final, the reference's "
    "Combiner pattern, MRC/mapred/MapTask.java:1611). TPC-H Q1 shape.",
    bench=True,
)
def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    disc_price = _price("l_extendedprice") * (_one() - _rate("l_discount"))
    charge = disc_price * (_one() + _rate("l_tax"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_price("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_price("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_price("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_price("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(_rate("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "word_count",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    doc="Canonical WordCount (EX/WordCount.java:36): tokenize → (w,1) → sum; "
    "combiner = automatic partial agg.",
    bench=True,
)
def word_count(spark: SparkSession, sf: str) -> DataFrame:
    return agg.word_count(t(spark, sf, "documents"), "text")


@query(
    "grep_count",
    oracle="""
    SELECT match, COUNT(*) AS cnt
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]*da[a-z]*')) AS match FROM documents)
    GROUP BY match
    """,
    doc="Grep (EX/Grep.java:68): regexp_extract_all → explode → count. "
    "(The desc-sort half is total_order_sort; counting here keeps the "
    "oracle order-insensitive.)",
)
def grep_count(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T.regex_matches(t(spark, sf, "documents"), "text", "[a-z]*da[a-z]*")
        .groupBy("match")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "word_stats",
    oracle="""
    SELECT COUNT(*) AS word_count,
           CAST(SUM(len) AS DOUBLE) / COUNT(*) AS mean_len,
           CAST(quantile_cont(len, 0.5) AS DOUBLE) AS median_len,
           sqrt(greatest(CAST(SUM(len*len) AS DOUBLE) / COUNT(*)
                - (CAST(SUM(len) AS DOUBLE)/COUNT(*)) * (CAST(SUM(len) AS DOUBLE)/COUNT(*)), 0.0)) AS stddev_len
    FROM (SELECT length(word)::BIGINT AS len
          FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
          WHERE word <> '')
    """,
    doc="WordMean/WordMedian/WordStandardDeviation (EX/WordMean.java:71, "
    "EX/WordMedian.java:1, EX/WordStandardDeviation.java:1) in one pass, "
    "from exact integer SUM/SUM_SQ counters as the reference does.",
)
def word_stats(spark: SparkSession, sf: str) -> DataFrame:
    return agg.word_stats(t(spark, sf, "documents"), "text")


@query(
    "value_aggregator",
    oracle="""
    SELECT l_returnflag,
           COUNT(l_orderkey) AS record_count,
           MAX(CAST(l_orderkey AS BIGINT)) AS max_orderkey,
           MIN(CAST(l_linenumber AS BIGINT)) AS min_linenumber,
           MIN(CAST(l_linestatus AS VARCHAR)) AS min_status,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="ValueAggregatorJob descriptor set (MRC/mapreduce/lib/aggregate/"
    "ValueAggregatorBaseDescriptor.java:39): descriptor names compiled "
    "to one fused grouped aggregation.",
)
def value_aggregator(spark: SparkSession, sf: str) -> DataFrame:
    return agg.value_aggregator(
        t(spark, sf, "lineitem"),
        ["l_returnflag"],
        {
            "record_count": ("ValueCount", "l_orderkey"),
            "max_orderkey": ("LongValueMax", "l_orderkey"),
            "min_linenumber": ("LongValueMin", "l_linenumber"),
            "min_status": ("StringValueMin", "l_linestatus"),
            "sum_price": ("DoubleValueSum", "l_extendedprice"),
        },
    )


@query(
    "uniq_value_count",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS uniq_customers,
           LEAST(COUNT(DISTINCT o_custkey), 50) AS uniq_customers_capped
    FROM orders GROUP BY o_orderpriority
    """,
    doc="UniqValueCount incl. maxNumItems cap "
    "(MRC/mapreduce/lib/aggregate/UniqValueCount.java:35).",
)
def uniq_value_count(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("uniq_customers"),
        F.least(F.countDistinct("o_custkey"), F.lit(50)).cast("bigint").alias(
            "uniq_customers_capped"
        ),
    )


@query(
    "value_histogram",
    oracle="""
    SELECT event_type,
           COUNT(*) AS unique_items,
           MIN(item_count) AS min_count,
           CAST(quantile_cont(item_count, 0.5) AS DOUBLE) AS median_count,
           MAX(item_count) AS max_count,
           CAST(SUM(item_count) AS DOUBLE) / COUNT(*) AS mean_count,
           sqrt(greatest(CAST(SUM(item_count*item_count) AS DOUBLE)/COUNT(*)
                - (CAST(SUM(item_count) AS DOUBLE)/COUNT(*))*(CAST(SUM(item_count) AS DOUBLE)/COUNT(*)), 0.0)) AS stddev_count
    FROM (SELECT event_type, user_id, COUNT(*) AS item_count
          FROM events GROUP BY event_type, user_id)
    GROUP BY event_type
    """,
    doc="ValueHistogram report (MRC/mapreduce/lib/aggregate/"
    "ValueHistogram.java:83): two-level agg, stats from exact sums.",
)
def value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return agg.value_histogram(t(spark, sf, "events"), ["event_type"], "user_id")


# ---------------------------------------------------------------------------
# Transform family (fieldsel / kv split / inverse)
# ---------------------------------------------------------------------------

def _line():
    return F.concat_ws(
        "\t",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.col("l_suppkey").cast("string"),
    )


_LINE_SQL = (
    "concat_ws(chr(9), CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR), "
    "l_returnflag, l_linestatus, CAST(l_suppkey AS VARCHAR))"
)


@query(
    "field_selection",
    oracle=f"""
    SELECT list_extract(fields, 1) AS key,
           concat_ws(chr(9), list_extract(fields, 3), list_extract(fields, 4),
                      list_extract(fields, 5)) AS value,
           COUNT(*) AS cnt
    FROM (SELECT str_split({_LINE_SQL}, chr(9)) AS fields FROM lineitem)
    GROUP BY 1, 2
    """,
    doc="FieldSelectionMapper/Reducer (MRC/mapreduce/lib/fieldsel/"
    "FieldSelectionMapper.java:1): cut-style spec '0' / '2-4' over "
    "tab-delimited lines, then the identity-reduce count.",
)
def field_selection(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select(_line().alias("line"))
    sel = T.field_selection(li, "line", key_spec="0", value_spec="2-4", sep="\t")
    return sel.groupBy("key", "value").agg(F.count("*").alias("cnt"))


@query(
    "kv_split",
    oracle="""
    SELECT CASE WHEN strpos(line, chr(9)) = 0 THEN line
                ELSE substr(line, 1, strpos(line, chr(9)) - 1) END AS key,
           CASE WHEN strpos(line, chr(9)) = 0 THEN ''
                ELSE substr(line, strpos(line, chr(9)) + 1) END AS value,
           COUNT(*) AS cnt
    FROM (SELECT CASE WHEN l_linenumber = 1 THEN l_returnflag
                      ELSE l_returnflag || chr(9) || l_linestatus || chr(9) || CAST(l_linenumber AS VARCHAR)
                 END AS line FROM lineitem)
    GROUP BY 1, 2
    """,
    doc="KeyValueTextInputFormat first-separator split incl. the "
    "missing-separator edge (whole line = key, empty value) — "
    "MRC/mapreduce/lib/input/KeyValueLineRecordReader.java:1.",
)
def kv_split(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select(
        F.when(F.col("l_linenumber") == 1, F.col("l_returnflag"))
        .otherwise(
            F.concat_ws(
                "\t", "l_returnflag", "l_linestatus", F.col("l_linenumber").cast("string")
            )
        )
        .alias("line")
    )
    return T.kv_split(li, "line", "\t").groupBy("key", "value").agg(
        F.count("*").alias("cnt")
    )


# ---------------------------------------------------------------------------
# Sort family
# ---------------------------------------------------------------------------


@query(
    "total_order_sort",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           ROW_NUMBER() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
    FROM lineitem
    """,
    doc="Global total-order sort (EX/Sort.java:98, TeraSort "
    "EX/terasort/TeraSort.java:49): sampled range partitioning is "
    "Spark's built-in RangePartitioner. Rank column makes order "
    "verifiable under order-insensitive hashing.",
    bench=True,
)
def total_order_sort(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    return S.total_order_sort(
        li, F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"),
        ranked="rank",
    )


@query(
    "secondary_sort",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rank
    FROM orders
    """,
    doc="Secondary sort (EX/SecondarySort.java: FirstPartitioner:133, "
    "FirstGroupingComparator:145): partition by custkey, values "
    "ordered by date within group.",
)
def secondary_sort(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    return S.secondary_sort(o, "o_custkey", ["o_orderdate", "o_orderkey"], "rank")


@query(
    "sort_by_spec",
    oracle="""
    SELECT line, ROW_NUMBER() OVER (
        ORDER BY CAST(list_extract(str_split(line, chr(9)), 2) AS DOUBLE) DESC,
                 list_extract(str_split(line, chr(9)), 1) ASC) AS rank
    FROM (SELECT CAST(s_suppkey AS VARCHAR) || chr(9) || CAST(s_acctbal AS VARCHAR) AS line
          FROM supplier)
    """,
    doc="`sort -k` key-field spec compiler (-k2,2nr -k1) — "
    "KeyFieldBasedComparator (MRC/mapreduce/lib/partition/"
    "KeyFieldBasedComparator.java:53).",
)
def sort_by_spec(spark: SparkSession, sf: str) -> DataFrame:
    sup = t(spark, sf, "supplier").select(
        F.concat_ws("\t", F.col("s_suppkey").cast("string"), F.col("s_acctbal").cast("string")).alias(
            "line"
        )
    )
    return S.global_rank(sup, *S.compile_sort_spec("-k2,2nr -k1", "line", "\t"), rank_col="rank")


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@query(
    "inner_join_nary",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    doc="N-ary inner composite join (CompositeInputFormat 'inner', "
    "MRC/mapreduce/lib/join/CompositeInputFormat.java:93). Dimension "
    "sides broadcast (DistributedCache analog).",
)
def inner_join_nary(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    r = t(spark, sf, "region").withColumnRenamed("r_regionkey", "n_regionkey")
    joined = J.broadcast_join(J.broadcast_join(c, n, "c_nationkey"), r, "n_regionkey")
    return joined.select("c_custkey", "c_name", "n_name", "r_name")


@query(
    "outer_join",
    oracle="""
    SELECT n_nationkey AS nationkey, n_name, cust_cnt
    FROM nation
    FULL OUTER JOIN (SELECT c_nationkey, COUNT(*) AS cust_cnt
                     FROM customer GROUP BY c_nationkey) c
      ON n_nationkey = c_nationkey
    """,
    doc="Full-outer composite join (CompositeInputFormat 'outer'): "
    "nations with no customers surface with NULL count.",
)
def outer_join(spark: SparkSession, sf: str) -> DataFrame:
    n = t(spark, sf, "nation").select(F.col("n_nationkey").alias("nationkey"), "n_name")
    c = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    return J.composite_join([n, c], "nationkey", "outer")


@query(
    "override_join",
    oracle="""
    WITH s1 AS (SELECT n_nationkey AS k, n_name AS v FROM nation),
         s2 AS (SELECT c_nationkey AS k, MAX(c_name) AS v FROM customer GROUP BY c_nationkey),
         s3 AS (SELECT s_nationkey AS k, MAX(s_name) AS v FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(s1.k, s2.k, s3.k) AS k,
           CASE WHEN s3.k IS NOT NULL THEN s3.v
                WHEN s2.k IS NOT NULL THEN s2.v
                ELSE s1.v END AS v
    FROM s1 FULL OUTER JOIN s2 ON s1.k = s2.k
            FULL OUTER JOIN s3 ON COALESCE(s1.k, s2.k) = s3.k
    """,
    doc="'override' composite join: value from the RIGHTMOST source "
    "containing the KEY wins — even when that value is NULL "
    "(MRC/mapreduce/lib/join/OverrideRecordReader.java:1) — "
    "full-outer chain + presence-guarded pick (a raw value coalesce "
    "would let a NULL value fall through to an earlier source).",
)
def override_join(spark: SparkSession, sf: str) -> DataFrame:
    s1 = t(spark, sf, "nation").select(F.col("n_nationkey").alias("k"), F.col("n_name").alias("v"))
    s2 = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.max("c_name").alias("v"))
    )
    s3 = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.max("s_name").alias("v"))
    )
    return J.composite_join([s1, s2, s3], "k", "override")


@query(
    "tagged_join",
    oracle="""
    SELECT o.o_custkey AS custkey, o.o_orderkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    doc="Reduce-side tagged join (datajoin DataJoinReducerBase.java:174): "
    "per-key cross product of tagged sources = shuffle equi-join.",
)
def tagged_join(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"), "o_orderkey")
    c = t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"), "c_name")
    return o.join(c, "custkey", "inner")


@query(
    "tagged_join_nary",
    oracle="""
    WITH c AS (SELECT c_nationkey AS k, c_acctbal AS cus_val FROM customer),
         s AS (SELECT s_nationkey AS k, s_acctbal AS sup_val FROM supplier),
         n AS (SELECT n_nationkey AS k, CAST(n_regionkey AS DOUBLE) AS nat_val FROM nation)
    SELECT COALESCE(cs.k, n.k) AS nationkey, cus_val, sup_val, nat_val
    FROM (SELECT COALESCE(c.k, s.k) AS k, cus_val, sup_val
          FROM c FULL OUTER JOIN s ON c.k = s.k) cs
    FULL OUTER JOIN n ON cs.k = n.k
    """,
    doc="N-ary reduce-side tagged OUTER join (datajoin "
    "DataJoinReducerBase.joinAndCollect, DataJoinReducerBase.java:174-"
    ":227): three tagged sources crossed per key; keys absent from a "
    "source keep null for that tag — the outer-subclass combine() "
    "behavior. At small SFs some nations genuinely lack suppliers, so "
    "the outer path is exercised for real.",
)
def tagged_join_nary(spark: SparkSession, sf: str) -> DataFrame:
    srcs = {
        "cus": t(spark, sf, "customer").select(
            F.col("c_nationkey").alias("k"), F.col("c_acctbal").alias("val")
        ),
        "sup": t(spark, sf, "supplier").select(
            F.col("s_nationkey").alias("k"), F.col("s_acctbal").alias("val")
        ),
        "nat": t(spark, sf, "nation").select(
            F.col("n_nationkey").alias("k"), F.col("n_regionkey").cast("double").alias("val")
        ),
    }
    out = J.tagged_join(srcs, key="k", value_col="val", how="outer")
    return out.select(F.col("k").alias("nationkey"), "cus_val", "sup_val", "nat_val")


@query(
    "broadcast_join_agg",
    oracle="""
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Map-side hash join via broadcast (DistributedCache, "
    "MRC/filecache/DistributedCache.java:135) feeding partial+final agg.",
    bench=True,
)
def broadcast_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    rev = _price("l_extendedprice") * (_one() - _rate("l_discount"))
    return (
        J.broadcast_join(li, p, "l_partkey")
        .groupBy("p_brand")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("line_count"))
    )


@query(
    "semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS bucket, COUNT(*) AS cnt FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS bucket, COUNT(*) AS cnt FROM customer
      -- NOT EXISTS, not NOT IN: one NULL o_custkey would make every
      -- NOT IN verdict NULL (zero rows) while left_anti keeps the
      -- unmatched customers (review-r4b)
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Semi/anti joins — absent in the reference (SURVEY §2.7), free "
    "Spark capability ('left_semi' / 'left_anti').",
)
def semi_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = J.semi_join(c, o, "c_custkey").agg(F.count("*").alias("cnt")).select(
        F.lit("with_orders").alias("bucket"), "cnt"
    )
    anti = J.anti_join(c, o, "c_custkey").agg(F.count("*").alias("cnt")).select(
        F.lit("without_orders").alias("bucket"), "cnt"
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# Multi-input union / sampling filters / top-k
# ---------------------------------------------------------------------------


@query(
    "multi_input_union",
    oracle="""
    SELECT name, nationkey, acctbal, src FROM (
      SELECT c_name AS name, CAST(c_nationkey AS INT) AS nationkey, c_acctbal AS acctbal,
             'customer' AS src FROM customer
      UNION ALL
      SELECT s_name, CAST(s_nationkey AS INT), s_acctbal, 'supplier' FROM supplier)
    """,
    doc="MultipleInputs (MRC/mapreduce/lib/input/MultipleInputs.java:40): "
    "per-source transform then unionByName.",
)
def multi_input_union(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("src"),
    )
    s = t(spark, sf, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_nationkey").cast("int").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("src"),
    )
    return c.unionByName(s)


@query(
    "sample_filter",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 5 = 0
      AND regexp_matches(text, 'join')
    """,
    doc="SequenceFileInputFilter scan filters (MRC/mapreduce/lib/input/"
    "SequenceFileInputFilter.java:1): MD5-hash percent sampling + regex "
    "record filter, pushed into the scan predicate.",
)
def sample_filter(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    return d.filter((hash64("doc_id") % 5 == 0) & F.col("text").rlike("join")).select(
        "doc_id", "n_chars"
    )


@query(
    "top_k",
    oracle="""
    SELECT word, cnt FROM (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word FROM documents)
      WHERE word <> '' GROUP BY word)
    ORDER BY cnt DESC, word ASC LIMIT 20
    """,
    doc="Top-k — absent as an engine primitive in the reference "
    "(SURVEY §2.5); deterministic tie-break on the word.",
)
def top_k(spark: SparkSession, sf: str) -> DataFrame:
    wc = agg.word_count(t(spark, sf, "documents"), "text")
    return wc.orderBy(F.desc("cnt"), F.asc("word")).limit(20)


# ---------------------------------------------------------------------------
# Events / time windows (capability extension per SURVEY §2.12)
# ---------------------------------------------------------------------------


@query(
    "events_window",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregation over the events table "
    "(batch form; streaming/windows.py runs the same expressions under "
    "readStream with a watermark).",
)
def events_window(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_d("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window_stats",
    oracle="""
    WITH starts AS (
      SELECT ts, event_type, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w_start
      FROM events)
    SELECT CAST(floor(epoch(w_start)) AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM starts
    GROUP BY 1, 2
    """,
    doc="Sliding event-time windows (2h window, 1h slide): each event "
    "lands in window/slide = 2 overlapping windows — F.window does the "
    "expansion; the oracle reproduces Spark's epoch-aligned starts by "
    "expanding each event to its two covering hour-starts. Same "
    "expressions run under readStream with a watermark "
    "(streaming/windows.py sliding_avg).",
)
def sliding_window_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_d("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
