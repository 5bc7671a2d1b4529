"""Bit-exactness tests for the gensort TeraGen port.

Reference: EX/terasort/Random16.java (LCG + skip-ahead table),
Unsigned16.java (128-bit arithmetic), GenSort.java:39 (record
layout), TeraGen.java:218 (per-row stream position),
TeraChecksum.java (CRC record checksum).
"""

import zlib

import pytest
from pyspark.sql import functions as F

from hadoop_main_spark.sources.teragen_exact import (
    _SKIP,
    GEN_A,
    GEN_C,
    affine_pow,
    duckdb_oracle_sql,
    next_rand,
    record_bytes,
    skip_ahead,
    teragen_exact,
    teragen_checksum,
)

# Spot values of Random16.genArray (Random16.java:74-:77, :200-:203,
# :324-:327) — checked facts proving the squaring derivation
# reproduces the reference's embedded table bit-for-bit.
_REF_TABLE = {
    1: ("17bce35bdf69743c529ed9eb20e0ae99", "95e0e48262b3edfe04479485c755b646"),
    2: ("f4dd417327db7a9bd194dfbe42d45771", "882a02c315362b60765f100068b33a1c"),
    64: ("5f0ba18c53cd8fbc0000000000000001", "f0b1944bfd71a97f0000000000000000"),
    127: ("00000000000000000000000000000001", "80000000000000000000000000000000"),
}


def test_skip_table_matches_reference():
    for k, (a_hex, c_hex) in _REF_TABLE.items():
        assert _SKIP[k] == (int(a_hex, 16), int(c_hex, 16))


def test_skip_ahead_equals_sequential():
    x = 0
    for n in range(1, 500):
        x = next_rand(x)
        assert skip_ahead(n) == x
    # a large jump: affine composition == continued iteration
    big = 10_000_019
    a, c = affine_pow(big)
    assert skip_ahead(big) == c  # f**n(0) = c_n
    assert next_rand(skip_ahead(big)) == skip_ahead(big + 1)


def test_record_layout():
    rand = skip_ahead(1)  # record 0's rand (TeraGen.java:225: next before gen)
    rec = record_bytes(0, rand)
    assert len(rec) == 100
    assert rec[:10] == rand.to_bytes(16, "big")[:10]
    assert rec[10:12] == bytes((0x00, 0x11))
    assert rec[12:44] == b"%032X" % 0
    assert rec[44:48] == bytes((0x88, 0x99, 0xAA, 0xBB))
    hx = "%032X" % rand
    assert rec[48:96] == "".join(ch * 4 for ch in hx[20:]).encode()
    assert rec[96:] == bytes((0xCC, 0xDD, 0xEE, 0xFF))


def test_spark_stream_and_crc_checksum(spark):
    """Spark generator == pure-Python port, including the CRC32 record
    checksum (F.crc32 is PureJavaCrc32-compatible; TeraChecksum
    analog)."""
    n = 10_000
    df = teragen_exact(spark, n, partitions=8)
    got = {r.rowid: (r.key_hex, r.filler_hex, bytes(r.record)) for r in df.collect()}
    rand = 0
    crc_sum = 0
    for rid in range(n):
        rand = next_rand(rand)
        hx = "%032X" % rand
        rec = record_bytes(rid, rand)
        crc_sum += zlib.crc32(rec)
        assert got[rid] == (hx[:20], hx[20:], rec)
    spark_sum = teragen_checksum(df).collect()[0]["checksum"]
    assert int(spark_sum) == crc_sum


def test_duckdb_oracle_matches_python():
    duckdb = pytest.importorskip("duckdb")
    n = 2_000
    res = sorted(duckdb.sql(duckdb_oracle_sql(n)).fetchall())
    assert len(res) == n
    rand = 0
    for rid in range(n):
        rand = next_rand(rand)
        hx = "%032X" % rand
        assert res[rid][0] == rid
        assert (res[rid][1], res[rid][2]) == (hx[:20], hx[20:])


import os as _os

import pytest as _pytest


@_pytest.mark.skipif(
    not _os.environ.get("SPARK_GRAFT_SLOW"), reason="set SPARK_GRAFT_SLOW=1 to run"
)
def test_teragen_exact_10m_rank_slow(spark):
    """1 GB-class end-to-end: 10M bit-exact gensort rows through the
    vectorized generator + single-scan global_rank. Rank must be a
    dense permutation consistent with the key order."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators.sorting import global_rank
    from hadoop_main_spark.sources.teragen_exact import teragen_exact

    n = spark.sparkContext.defaultParallelism
    g = teragen_exact(spark, 10_000_000).select("rowid", "key_hex")
    bounds = [("%020X" % (j * (1 << 80) // n), 0) for j in range(1, n)]
    ranked = global_rank(g, "key_hex", "rowid", rank_col="r", split_points=bounds)
    stats = ranked.agg(
        F.count("*").alias("c"),
        F.min("r").alias("lo"),
        F.max("r").alias("hi"),
        F.countDistinct("r").alias("d"),
    ).collect()[0]
    assert (stats.c, stats.lo, stats.hi, stats.d) == (10_000_000, 1, 10_000_000, 10_000_000)
    sample = sorted(
        ranked.sample(0.0002, seed=1).select("key_hex", "rowid", "r").collect(),
        key=lambda x: (x.key_hex, x.rowid),
    )
    ranks = [x.r for x in sample]
    assert ranks == sorted(ranks) and len(ranks) > 500
