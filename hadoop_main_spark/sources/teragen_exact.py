"""Bit-exact TeraGen: the gensort 128-bit LCG, Spark-native.

Reference semantics (EX/terasort/Random16.java:20-:44,
Unsigned16.java:206, GenSort.java:39-:76, TeraGen.java:218-:237):

- rand stream: ``x' = (A*x + C) mod 2**128`` with the published
  L'Ecuyer multiplier ``A = 0x2360ed051fc65da44385df649fccf645`` and
  odd constant ``C = 0x4a696d47726179524950202020202001``
  (Random16.java:26-:29; constants are public — gensort 1.0,
  Chris Nyberg).
- skip-ahead: Random16.genArray (Random16.java:71) holds the affine
  coefficients of ``f**(2**k)``; we DERIVE the same table from (A, C)
  by the affine-square identity ``f∘f(x) = a²x + (a+1)c`` instead of
  embedding 128 copied constants — verified equal to the reference
  table entries in tests.
- record for row i (TeraGen.java:220-:226): the mapper seeds
  ``rand = skipAhead(firstRow)`` and calls ``nextRand`` BEFORE
  generating, so row i's rand is ``f**(i+1)(0)``.
- 100-byte binary layout (GenSort.generateRecord, GenSort.java:39):
  bytes 0-9   key   = high 10 bytes of rand (hex digits 0..19)
  bytes 10-11 break = 00 11
  bytes 12-43 rowid = 32 ASCII uppercase hex digits of the row number
  bytes 44-47 break = 88 99 AA BB
  bytes 48-95 fill  = hex digits 20..31 of rand, each as an ASCII
                      char repeated 4×
  bytes 96-99 break = CC DD EE FF

Generation is embarrassingly parallel: each partition skip-aheads to
its first row then iterates sequentially — exactly the reference
mapper's strategy, so the design holds at any scale (1T rows = 1T
independent row ranges). Inside each Arrow batch the LCG stream is
numpy-VECTORIZED: the 128-bit state lives as four 32-bit limbs in
uint64 arrays, and the batch's states are produced by prefix
doubling — states[m..2m) = f**m(states[0..m)) using the skip table's
(a, c) of f**(2**k) — so a batch of n rows costs O(log n) vector
affine steps (each a handful of numpy multiply/mask/shift ops), not
n Python big-int iterations. Record assembly (hex digits, 100-byte
layout) is likewise vectorized over uint8 matrices.

The DuckDB oracle (``duckdb_oracle_sql``) regenerates the identical
stream in pure SQL: rand_j for j = hi*256+lo is
``f**(hi*256)(f**lo(0))`` — the per-``lo`` states and per-``hi``
affine coefficients are precomputed here and embedded as VALUES
tables, and the 128-bit multiply-add runs vectorized over 16-bit
limbs (8 BIGINT limbs; products ≤ 2**32, safely inside BIGINT).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M128 = (1 << 128) - 1
GEN_A = 0x2360ED051FC65DA44385DF649FCCF645
GEN_C = 0x4A696D47726179524950202020202001


def _skip_table() -> list[tuple[int, int]]:
    """(a_k, c_k) of f**(2**k) for k in 0..127, derived by squaring."""
    a, c = GEN_A, GEN_C
    out = [(a, c)]
    for _ in range(127):
        a, c = (a * a) & _M128, ((a + 1) * c) & _M128
        out.append((a, c))
    return out


_SKIP = _skip_table()


def skip_ahead(n: int) -> int:
    """rand value n steps from seed 0 (Random16.skipAhead)."""
    r = 0
    k = 0
    while n:
        if n & 1:
            a, c = _SKIP[k]
            r = (a * r + c) & _M128
        n >>= 1
        k += 1
    return r


def next_rand(x: int) -> int:
    """One LCG step (Random16.nextRand)."""
    return (GEN_A * x + GEN_C) & _M128


def affine_pow(n: int) -> tuple[int, int]:
    """(a, c) such that f**n(x) = (a*x + c) mod 2**128."""
    ra, rc = 1, 0  # identity
    k = 0
    while n:
        if n & 1:
            a, c = _SKIP[k]
            # f**(2**k) ∘ current:  a*(ra*x + rc) + c
            ra, rc = (a * ra) & _M128, (a * rc + c) & _M128
        n >>= 1
        k += 1
    return ra, rc


_BREAK1 = bytes((0x00, 0x11))
_BREAK2 = bytes((0x88, 0x99, 0xAA, 0xBB))
_BREAK3 = bytes((0xCC, 0xDD, 0xEE, 0xFF))


# --- vectorized batch generation (numpy, 32-bit limbs in uint64) ------------


def _np():
    import numpy as np

    return np


def _limbs32(v: int) -> list[int]:
    """Four little-endian 32-bit limbs of a 128-bit value."""
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(4)]


def _affine_vec(a: int, c: int, x: list) -> list:
    """(a*x + c) mod 2**128 applied to a VECTOR of states.

    ``x`` is four uint64 arrays holding 32-bit limbs. Every partial
    product a_j * x_k fits uint64 (< 2**64); column accumulators hold
    at most ~9 values < 2**32 plus carries (< 2**36) — no overflow.
    """
    np = _np()
    m32 = np.uint64(0xFFFFFFFF)
    s32 = np.uint64(32)
    al, cl = _limbs32(a), _limbs32(c)
    n = len(x[0])
    acc = [np.zeros(n, dtype=np.uint64) for _ in range(4)]
    for i in range(4):
        for j in range(i + 1):
            if al[j] == 0:
                continue
            p = np.uint64(al[j]) * x[i - j]
            acc[i] += p & m32
            if i + 1 < 4:
                acc[i + 1] += p >> s32
        if cl[i]:
            acc[i] += np.uint64(cl[i])
    out = []
    carry = np.zeros(n, dtype=np.uint64)
    for i in range(4):
        s = acc[i] + carry
        out.append(s & m32)
        carry = s >> s32
    return out


def _states_vec(first_rand: int, n: int) -> list:
    """States ``f**i(first_rand)`` for i in [0, n) as limb vectors,
    by prefix doubling over the skip table: log2(n) vector affines."""
    np = _np()
    st = [np.array([l], dtype=np.uint64) for l in _limbs32(first_rand)]
    k = 0
    while len(st[0]) < n:
        a, c = _SKIP[k]  # f**(2**k)
        nxt = _affine_vec(a, c, st)
        st = [np.concatenate([s, t]) for s, t in zip(st, nxt)]
        k += 1
    return [s[:n] for s in st]


_HEXBYTES = b"0123456789ABCDEF"


def _gen_batch_vec(rowids, first_rand: int):
    """Vectorized records for CONTIGUOUS rowids seeded at first_rand.

    Returns (keys, key_hex, filler_hex, records) as per-row Python
    bytes/str lists (the Arrow-serializable shapes)."""
    np = _np()
    n = len(rowids)
    st = _states_vec(first_rand, n)
    hexmap = np.frombuffer(_HEXBYTES, dtype=np.uint8)
    # 16 rand bytes, big-endian: limb3 .. limb0
    b16 = np.empty((n, 16), dtype=np.uint8)
    for k in range(4):
        b16[:, (3 - k) * 4 : (4 - k) * 4] = (
            st[k].astype(">u4").view(np.uint8).reshape(n, 4)
        )
    nib = np.empty((n, 32), dtype=np.uint8)
    nib[:, 0::2] = b16 >> 4
    nib[:, 1::2] = b16 & 0xF
    hx = hexmap[nib]  # (n, 32) ASCII uppercase hex of the 128-bit rand
    # 32 ASCII hex digits of the row number (top 16 are '0': rowid < 2**64)
    rid8 = np.ascontiguousarray(rowids.astype(">u8")).view(np.uint8).reshape(n, 8)
    ridnib = np.empty((n, 16), dtype=np.uint8)
    ridnib[:, 0::2] = rid8 >> 4
    ridnib[:, 1::2] = rid8 & 0xF
    rec = np.empty((n, 100), dtype=np.uint8)
    rec[:, 0:10] = b16[:, 0:10]
    rec[:, 10:12] = np.frombuffer(_BREAK1, dtype=np.uint8)
    rec[:, 12:28] = ord("0")
    rec[:, 28:44] = hexmap[ridnib]
    rec[:, 44:48] = np.frombuffer(_BREAK2, dtype=np.uint8)
    rec[:, 48:96] = np.repeat(hx[:, 20:32], 4, axis=1)
    rec[:, 96:100] = np.frombuffer(_BREAK3, dtype=np.uint8)
    # materialize per-row objects by slicing ONE contiguous buffer each
    # (bulk tobytes + cheap slices, not n tobytes/decode calls)
    b16_all = b16.tobytes()
    hx_all = hx.tobytes().decode("ascii")
    rec_all = rec.tobytes()
    keys = [b16_all[i * 16 : i * 16 + 10] for i in range(n)]
    key_hex = [hx_all[i * 32 : i * 32 + 20] for i in range(n)]
    fill_hex = [hx_all[i * 32 + 20 : i * 32 + 32] for i in range(n)]
    recs = [rec_all[i * 100 : (i + 1) * 100] for i in range(n)]
    return keys, key_hex, fill_hex, recs


def record_bytes(rowid: int, rand: int) -> bytes:
    """The full 100-byte GenSort binary record (GenSort.java:39-:76)."""
    r16 = rand.to_bytes(16, "big")
    hx = "%032X" % rand
    fill = "".join(ch * 4 for ch in hx[20:32]).encode("ascii")
    return r16[:10] + _BREAK1 + (b"%032X" % rowid) + _BREAK2 + fill + _BREAK3


def teragen_exact(
    spark: SparkSession, rows: int, partitions: int | None = None
) -> DataFrame:
    """Bit-exact TeraGen as a DataFrame source.

    Columns: rowid bigint, key binary(10), key_hex string(20),
    filler_hex string(12), record binary(100). key_hex/filler_hex
    together are the full 128-bit rand (hex digits 0..19 / 20..31),
    so value-comparing them checks the entire LCG stream.
    """
    # ≥25k rows per generator partition: each partition pays a fixed
    # Arrow/Python-worker cost, so tiny slices are pure overhead; at
    # real scale (rows >> 25k * parallelism) this is just
    # defaultParallelism, and cluster callers pass `partitions`
    nparts = partitions or max(
        1, min(spark.sparkContext.defaultParallelism, -(-rows // 25_000))
    )
    rng = spark.range(0, rows, 1, nparts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            n = len(ids)
            if n == 0:
                continue
            first = int(ids[0])
            if bool((ids == first + np.arange(n, dtype=ids.dtype)).all()):
                # hot path: spark.range partitions are contiguous — ONE
                # skip-ahead to the first row, then O(log n) vectorized
                # prefix-doubling affine steps generate the whole batch
                keys, key_hex, fill_hex, recs = _gen_batch_vec(
                    ids, skip_ahead(first + 1)
                )
            else:
                # arbitrary id sets: per-row seek (scalar fallback)
                keys, key_hex, fill_hex, recs = [], [], [], []
                rand, prev = 0, None
                for rid in (int(r) for r in ids):
                    rand = (
                        next_rand(rand)
                        if rid == prev_plus1(prev)
                        else skip_ahead(rid + 1)
                    )
                    prev = rid
                    hx = "%032X" % rand
                    keys.append(rand.to_bytes(16, "big")[:10])
                    key_hex.append(hx[:20])
                    fill_hex.append(hx[20:])
                    recs.append(
                        keys[-1]
                        + _BREAK1
                        + (b"%032X" % rid)
                        + _BREAK2
                        + "".join(ch * 4 for ch in hx[20:]).encode("ascii")
                        + _BREAK3
                    )
            yield pd.DataFrame(
                {
                    "rowid": pd.Series(ids, dtype="int64"),
                    "key": keys,
                    "key_hex": key_hex,
                    "filler_hex": fill_hex,
                    "record": recs,
                }
            )

    schema = "rowid bigint, key binary, key_hex string, filler_hex string, record binary"
    return rng.mapInPandas(gen, schema)


def prev_plus1(prev: int | None) -> int | None:
    return None if prev is None else prev + 1


def teragen_checksum(df: DataFrame):
    """TeraChecksum (EX/terasort/TeraChecksum.java:1): sum of CRC32 of
    every record. F.crc32 is JVM-side and identical to PureJavaCrc32;
    DECIMAL(38,0) keeps the sum exact at any row count (the reference
    carries it in an Unsigned16)."""
    return df.select(
        F.sum(F.crc32(F.col("record")).cast("decimal(38,0)")).alias("checksum")
    )


# --- DuckDB oracle ----------------------------------------------------------

_LO_BLOCK = 256


def _limbs16(x: int) -> list[int]:
    """Eight little-endian 16-bit limbs of a 128-bit value."""
    return [(x >> (16 * i)) & 0xFFFF for i in range(8)]


def duckdb_oracle_sql(rows: int) -> str:
    """Pure-SQL regeneration of the TeraGen stream for the driver's
    DuckDB oracle: rand for j = hi*256+lo is f**(hi*256)(f**lo(0)).
    Embeds f**lo(0) states (lo table) and f**(hi*256) affine
    coefficients (hi table) as VALUES; the 128-bit multiply-add runs
    over 16-bit limbs entirely in BIGINT arithmetic."""
    hi_max = rows // _LO_BLOCK  # j ranges 1..rows
    lo_rows = []
    x = 0
    for lo in range(_LO_BLOCK):
        lo_rows.append((lo, _limbs16(x)))
        x = next_rand(x)
    a_blk, c_blk = affine_pow(_LO_BLOCK)
    hi_rows = []
    ha, hc = 1, 0  # affine identity = f**0
    for hi in range(hi_max + 1):
        hi_rows.append((hi, _limbs16(ha), _limbs16(hc)))
        # f**((hi+1)*256) = f**256 ∘ f**(hi*256)
        ha, hc = (a_blk * ha) & _M128, (a_blk * hc + c_blk) & _M128

    lo_values = ",\n".join(
        "(%d,%s)" % (lo, ",".join(map(str, limbs))) for lo, limbs in lo_rows
    )
    hi_values = ",\n".join(
        "(%d,%s,%s)" % (hi, ",".join(map(str, al)), ",".join(map(str, cl)))
        for hi, al, cl in hi_rows
    )
    # column sums s_i = sum_{j+k=i} a_j*x_k + c_i  (mod-2**128 keeps i<8);
    # max value ≈ 8 * 2**32 — far inside BIGINT
    sums = []
    for i in range(8):
        terms = ["a%d::BIGINT*x%d" % (j, i - j) for j in range(i + 1)]
        terms.append("c%d::BIGINT" % i)
        sums.append("(%s) AS s%d" % (" + ".join(terms), i))
    # carry-propagation chain: one CTE per limb
    carry_ctes = []
    prev_src = "sums"
    for i in range(8):
        carry_in = "" if i == 0 else " + r%d" % (i - 1)
        carry_ctes.append(
            "limb%d AS (SELECT *, (s%d%s) & 65535 AS t%d, (s%d%s) >> 16 AS r%d FROM %s)"
            % (i, i, carry_in, i, i, carry_in, i, prev_src)
        )
        prev_src = "limb%d" % i
    key_hex = "||".join("printf('%%04X', t%d)" % i for i in (7, 6, 5, 4, 3))
    fill_hex = "||".join("printf('%%04X', t%d)" % i for i in (2, 1, 0))
    return """
WITH lo_tab(lo, x0,x1,x2,x3,x4,x5,x6,x7) AS (VALUES
{lo_values}),
hi_tab(hi, a0,a1,a2,a3,a4,a5,a6,a7, c0,c1,c2,c3,c4,c5,c6,c7) AS (VALUES
{hi_values}),
pairs AS (
  SELECT hi*{blk} + lo - 1 AS rowid, *
  FROM hi_tab CROSS JOIN lo_tab
  WHERE hi*{blk} + lo BETWEEN 1 AND {rows}
),
sums AS (SELECT rowid, {sums} FROM pairs),
{carries}
SELECT rowid,
       {key_hex} AS key_hex,
       {fill_hex} AS filler_hex,
       ROW_NUMBER() OVER (ORDER BY {key_hex}, rowid) AS rank
FROM {last}
""".format(
        lo_values=lo_values,
        hi_values=hi_values,
        blk=_LO_BLOCK,
        rows=rows,
        sums=", ".join(sums),
        carries=",\n".join(carry_ctes),
        key_hex=key_hex,
        fill_hex=fill_hex,
        last=prev_src,
    )
