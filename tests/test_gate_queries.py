"""Round-11 driver-gate machinery: the engine-exact Java partition
hash helpers behind the partition-histogram queries, pinned against
a pure-Python reimplementation of the reference's int32 semantics
(HashPartitioner.java:31 / LongWritable.hashCode / the iterated 31-
hash of KeyFieldBasedPartitioner.java:126 and
WritableComparator.hashBytes) on adversarial keys, BOTH engines.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_main_spark.operators.partitioning import (  # noqa: E402
    java_long_hash_partition,
    java_long_hash_partition_sql,
    java_string_hash31,
    java_string_hash31_sql,
)


def _jlong_pid(v: int, n: int) -> int:
    h = v ^ (v >> 32)  # non-negative keys: >>> == >>
    h32 = ((h & 0xFFFFFFFF) + 2**31) % 2**32 - 2**31
    return (h32 & 0x7FFFFFFF) % n


def _jstr_hash(s: str, init: int) -> int:
    h = init
    for ch in s:
        h = ((h * 31 + ord(ch)) + 2**31) % 2**32 - 2**31
    return h & 0x7FFFFFFF


LONG_KEYS = [0, 1, 7, 12345, 2654435761 * 4999, 2**40 + 17, 2**62 - 3]
STR_KEYS = ["", "A", "BUILDING", "AUTOMOBILE", "zzzzzzzzzzzz", "ab c", "~!0"]


def test_java_long_hash_partition_both_engines(spark):
    import duckdb

    df = spark.createDataFrame([(k,) for k in LONG_KEYS], "k long")
    got = [
        r[0]
        for r in df.select(
            java_long_hash_partition(F.col("k"), 7).alias("p")
        ).collect()
    ]
    assert got == [_jlong_pid(k, 7) for k in LONG_KEYS]
    con = duckdb.connect()
    for k in LONG_KEYS:
        sql = java_long_hash_partition_sql(str(k), 7)
        assert con.execute(f"select {sql}").fetchone()[0] == _jlong_pid(k, 7)


@pytest.mark.parametrize("init", [0, 1])
def test_java_string_hash31_both_engines(spark, init):
    import duckdb

    df = spark.createDataFrame([(s,) for s in STR_KEYS], "s string")
    got = [
        r[0]
        for r in df.select(
            java_string_hash31(F.col("s"), init, 12).alias("h")
        ).collect()
    ]
    assert got == [_jstr_hash(s, init) for s in STR_KEYS]
    con = duckdb.connect()
    for s in STR_KEYS:
        sql = java_string_hash31_sql(repr(s), init, 12)
        assert con.execute(f"select {sql}").fetchone()[0] == _jstr_hash(s, init)


def test_java_string_hash31_rejects_long_keys(spark):
    df = spark.createDataFrame([("x" * 13,)], "s string")
    with pytest.raises(Exception, match="longer than 12"):
        df.select(java_string_hash31(F.col("s"), 0, 12)).collect()
