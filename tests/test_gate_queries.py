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


def test_cdc_chunks_shift_resistance(spark):
    """The CDC property fixed-size blocks lack: a shared region chunks
    IDENTICALLY regardless of its offset in the containing document —
    inserting a prefix before the region must leave the region's
    interior chunk digests unchanged (only the boundary-straddling
    chunks may differ). Also pins: chunk concatenation rebuilds the
    text, and empty docs produce no chunks."""
    from hadoop_main_spark.operators.dedup import cdc_chunks

    shared = "".join(
        f"word{i % 97} content token {i * 7 % 53} " for i in range(200)
    )
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, "PREFIX-" * 11 + shared),
            (3, ""),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r.doc_id), []).append(r)
    assert 3 not in by_doc                       # empty -> no chunks
    assert len(by_doc[4]) == 1                   # sub-window -> one chunk
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    d2 = sorted(by_doc[2], key=lambda r: r.chunk_idx)
    # lengths rebuild the text exactly
    assert sum(r.chunk_len for r in d1) == len(shared)
    assert sum(r.chunk_len for r in d2) == len("PREFIX-" * 11 + shared)
    # interior digests of the shared region survive the offset shift:
    # all but the first chunk of doc 1 must appear in doc 2
    s1 = [r.chunk_md5 for r in d1][1:]
    s2 = set(r.chunk_md5 for r in d2)
    assert len(s1) >= 3, "fixture must produce several chunks"
    assert all(h in s2 for h in s1)


def test_weighted_systematic_sample_exact_k_and_pps(spark):
    """Exactly k rows, pick indices 1..k, and the PPS property: a row
    holding more than 1/k of the total weight is ALWAYS selected."""
    from hadoop_main_spark.operators.transforms import (
        weighted_systematic_sample,
    )

    rows = [(i, 1 if i != 50 else 500) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    got = weighted_systematic_sample(df, "wt", k=7, order_col="doc_id")
    out = sorted(
        (int(r.doc_id), int(r.pick), int(r.n_picks)) for r in got.collect()
    )
    assert sum(n for _, _, n in out) == 7       # draws total exactly k
    picked = {d for d, _, _ in out}
    assert 50 in picked                          # the heavy row always drawn
    heavy = next(n for d, _, n in out if d == 50)
    assert heavy >= 5                            # ...with multiplicity
    # uniform-weight case: no multiplicities, exactly k distinct rows
    uni = spark.createDataFrame(
        [(i, 3) for i in range(100)], "doc_id long, wt long"
    )
    got_u = weighted_systematic_sample(uni, "wt", k=7, order_col="doc_id")
    u = [(int(r.doc_id), int(r.n_picks)) for r in got_u.collect()]
    assert len(u) == 7 and all(n == 1 for _, n in u)
    import pytest

    with pytest.raises(ValueError):
        weighted_systematic_sample(df, "wt", k=0)
