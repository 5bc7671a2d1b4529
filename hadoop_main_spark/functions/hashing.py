"""Portable deterministic hashing.

The reference engine hashes with per-type Java ``hashCode`` /
``MD5Hash`` (reference: IO/MD5Hash.java:1) and partitions with
``hash(key) mod R`` (MRC/mapreduce/lib/partition/HashPartitioner.java:31).
Spark's builtin ``F.hash`` is Murmur3, which no other engine
reproduces — so every place where a hash value is part of query
*semantics* (sampling, minhash, simhash, LSH buckets, fingerprints)
we derive a 60-bit integer from MD5 instead. MD5 is implemented
identically everywhere (Spark, DuckDB, Python hashlib), making
results verifiable against any SQL oracle, and it is JVM-evaluated
in Spark (no Python round-trip).

``hash64(col, salt)`` = int(first 15 hex chars of md5(col || '§' || salt), 16)
  → uniform in [0, 2^60), always non-negative, bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SALT_SEP = "§"  # never occurs in the synthetic data


def _salted(col: Column | str, salt: str | int | None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if salt is None or salt == "":
        return c
    return F.concat(c, F.lit(SALT_SEP + str(salt)))


def hash64(col: Column | str, salt: str | int | None = None) -> Column:
    """60-bit non-negative deterministic hash of a string column."""
    return F.conv(F.substring(F.md5(_salted(col, salt)), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str, salt: str | int | None = None) -> str:
    """The DuckDB-SQL text computing exactly :func:`hash64`."""
    inner = f"CAST({expr} AS VARCHAR)"
    if salt is not None and salt != "":
        inner = f"concat({inner}, '{SALT_SEP}{salt}')"
    return f"CAST(concat('0x', substr(md5({inner}), 1, 15)) AS BIGINT)"


def hash64_py(value: str, salt: str | int | None = None) -> int:
    """Python reference implementation (for tests / driver-side use)."""
    import hashlib

    s = str(value)
    if salt is not None and salt != "":
        s = s + SALT_SEP + str(salt)
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
