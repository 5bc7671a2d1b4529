"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03;
the MOSS algorithm).

Capability extension beyond the reference (BASELINE.json north_star):
a position-aware fingerprinting scheme that selects, from the rolling
k-gram hash sequence of each document, the minimum hash of every
window of ``w`` consecutive grams (rightmost minimum on ties). The
guarantee: any shared substring of at least w + k - 1 tokens between
two documents produces at least one SHARED selected fingerprint, while
only ~2/(w+1) of all gram hashes are kept — a tunable density knob
between exact span hashing (``cross_doc_spans``: every window
shuffles) and MinHash (no positions). The selected (pos, fp) pairs are
what MOSS-style overlap/plagiarism detection matches on.

Portability: gram hashes derive from hash64 (MD5-based,
functions/hashing.py), so the selection is bit-identical in any SQL
engine. The per-window argmin with rightmost tie-break is ONE packed
BIGINT ``min()``:

    key = (hash64(gram) mod 2^40) * 2^20 + (2^20 - 1 - pos)

min(key) minimizes the 40-bit fingerprint first and, among equal
fingerprints, maximizes pos — exactly the winnowing tie rule — so both
engines compute it with a plain ROWS window. Documents longer than
2^20 k-grams (~1M tokens) exceed the packed position space and must be
pre-chunked (doc_chunking); 2^40 fingerprint space keeps hash
collisions ~1e-7 per million grams (collisions only ever ADD candidate
matches — verification downstream stays exact).

Scale design (100 TB): gram TEXT never shuffles — only (id, pos,
packed key) rows cross the per-document window exchange, and the
window partitions by document id (bounded by one document's length,
never a global sort). The pair join shuffles only selected
fingerprints (~2/(w+1) of grams) with the standard hot-bucket guard.
Window ends before position w-1 use the prefix window (the robust
variant), so short documents still fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64, hash64_sql
from hadoop_main_spark.operators.dedup import word_shingles

FP_BITS = 40
POS_BITS = 20
FP_MOD = 1 << FP_BITS
POS_MOD = 1 << POS_BITS


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Selected winnowing fingerprints: one row per (document,
    selected gram) with the gram's 0-based token position.

    Output: (``id_col``, pos, fp) — fp in [0, 2^40). Documents with
    fewer than ``k`` tokens emit nothing (the word_shingles short-doc
    guard); any document with at least one k-gram emits at least one
    fingerprint (prefix windows select too).
    """
    from hadoop_main_spark.operators.partitioning import fan_out

    grams = (
        fan_out(df.select(id_col, text_col), [id_col])
        .select(
            F.col(id_col),
            F.posexplode(word_shingles(text_col, k)).alias("pos", "__gram"),
        )
        # gram text is hashed AT THE SCAN; only the packed key shuffles
        .select(
            F.col(id_col),
            "pos",
            (
                (hash64("__gram", "winnow") % F.lit(FP_MOD)) * F.lit(POS_MOD)
                + (F.lit(POS_MOD - 1) - F.col("pos"))
            ).alias("__key"),
        )
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    sel = grams.select(
        F.col(id_col), F.min("__key").over(win).alias("__skey")
    ).distinct()
    return sel.select(
        F.col(id_col),
        (F.lit(POS_MOD - 1) - F.col("__skey") % F.lit(POS_MOD)).alias("pos"),
        # integral `div`, not `/`: float division loses exactness past 2^53
        F.expr(f"__skey div {POS_MOD}").alias("fp"),
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_fp_bucket: int = 1000,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` DISTINCT selected
    fingerprints — the MOSS candidate-match step.

    Output: (id_a, id_b, n_shared), id_a < id_b. ``max_fp_bucket``
    drops degenerate fingerprints appearing in more documents than the
    bound (the minhash ``max_band_bucket`` discipline: a boilerplate
    gram shared by everything would quadratically explode the join and
    carries no discriminating signal).
    """
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w).select(
        id_col, "fp"
    ).distinct()
    sized = fps.withColumn(
        "__bn", F.count("*").over(Window.partitionBy("fp"))
    ).filter(F.col("__bn") <= max_fp_bucket)
    a = sized.select(F.col(id_col).alias("id_a"), "fp")
    b = sized.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_fingerprints_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
) -> str:
    """DuckDB CTE body producing exactly :func:`winnow_fingerprints`
    as a relation ``(id_col, pos, fp)`` — compose with ``WITH fps AS
    (<this>) SELECT ...``."""
    toks = f"list_filter(regexp_split_to_array({text_col}, '\\s+'), t -> t <> '')"
    gram = " || ' ' || ".join(f"tk[i+{j}]" for j in range(k))
    key = (
        f"({hash64_sql('(' + gram + ')', 'winnow')} % {FP_MOD}::BIGINT)"
        f" * {POS_MOD} + ({POS_MOD - 1} - (i - 1))"
    )
    return f"""
    SELECT {id_col}, {POS_MOD - 1} - (skey % {POS_MOD}) AS pos,
           skey // {POS_MOD} AS fp
    FROM (
      SELECT DISTINCT {id_col},
             min(key) OVER (PARTITION BY {id_col} ORDER BY pos
                            ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS skey
      FROM (
        SELECT {id_col}, i - 1 AS pos, {key} AS key
        FROM (SELECT {id_col}, {toks} AS tk FROM {table}),
             unnest(generate_series(1, greatest(len(tk) - {k - 1}, 0))) AS u(i)
      )
    )
    """
