"""LLM-training-data pipeline queries: dedup, similarity search,
text analysis — each with a DuckDB oracle generated from the SAME
constants/expressions as the Spark operators (single source of
truth for permutation constants, stopword profiles, moduli).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64_sql
from hadoop_main_spark.operators import dedup as D
from hadoop_main_spark.operators import similarity as SIM
from hadoop_main_spark.operators import textstats as TS
from hadoop_main_spark.plans.registry import query, t

P = D.MINHASH_P
J = D.NUM_HASHES
B = D.BANDS
R = D.ROWS_PER_BAND

# --- shared oracle SQL fragments --------------------------------------------

_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')"

_SHINGLE_CTE = f"""
  toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
  sh AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
    FROM toks),
  hv AS (SELECT doc_id, {hash64_sql('shingle')} % {P} AS h FROM sh)
"""

_SIG_COLS = ",\n           ".join(
    f"coalesce(MIN(({a}::BIGINT * h + {b}) % {P}), {P - 1}) AS mh{j}"
    for j, (a, b) in enumerate(D.PERM)
)

_SIG_CTE = f"""
  sig0 AS (SELECT doc_id, {_SIG_COLS} FROM hv GROUP BY doc_id),
  sig AS (SELECT d.doc_id, {", ".join(f"coalesce(mh{j}, {P - 1}) AS mh{j}" for j in range(J))}
          FROM documents d LEFT JOIN sig0 USING (doc_id))
"""


def _band_sig_sql(b: int) -> str:
    cols = ", ".join(f"CAST(mh{b * R + r} AS VARCHAR)" for r in range(R))
    return hash64_sql(f"concat_ws('_', {cols})", f"band{b}")


_BANDS_CTE = (
    "  bands AS (\n    "
    + "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, {b} AS band, {_band_sig_sql(b)} AS band_sig FROM sig"
        for b in range(B)
    )
    + ")"
)

_CAND_CTE = """
  sized AS (SELECT *, COUNT(*) OVER (PARTITION BY band, band_sig) AS bucket_n FROM bands),
  cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM sized a JOIN sized b ON a.band = b.band AND a.band_sig = b.band_sig
    WHERE a.doc_id < b.doc_id AND a.bucket_n <= 1000 AND b.bucket_n <= 1000)
"""

_MINHASH_PREFIX = (
    "WITH" + _SHINGLE_CTE + "," + _SIG_CTE + ",\n" + _BANDS_CTE + "," + _CAND_CTE
)

_AGREE = " + ".join(f"CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END" for j in range(J))


# --- dedup -------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY text) AS canonical_id,
           doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_duplicate
    FROM documents
    """,
    doc="Exact dedup: hash-groupBy on content, lowest id canonical.",
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return D.exact_dedup(d, ["text"], "doc_id").select(
        "doc_id", "canonical_id", "is_duplicate"
    )


@query(
    "dedup_minhash_lsh",
    oracle=_MINHASH_PREFIX
    + f"""
    SELECT id_a, id_b, CAST(({_AGREE}) AS DOUBLE) / {float(J)} AS est_jaccard
    FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5
    """,
    doc="MinHash({J} perms)+LSH({B} bands) near-dup candidate pairs with "
    "estimated Jaccard — shingle→minhash→band→bucket-join, no all-pairs "
    "product; degenerate buckets (>1000 docs) dropped (skew guard).",
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return D.minhash_lsh_pairs(d, "doc_id", "text", min_est_jaccard=0.5)


_SIMHASH_BITSUMS = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS s{k}"
    for k in range(D.SIMHASH_BITS)
)
_SIMHASH_VAL = " + ".join(
    f"CASE WHEN s{k} > 0 THEN {1 << k}::BIGINT ELSE 0 END" for k in range(D.SIMHASH_BITS)
)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
         th AS (SELECT doc_id, {hash64_sql('token')} AS h FROM tok),
         bits AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM th GROUP BY doc_id),
         sh AS (SELECT doc_id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM bits)
    -- zero-token docs never reach tok (unnest of an empty list):
    -- reattach them with the sentinel signature 0 (engine parity)
    SELECT d.doc_id, COALESCE(sh.simhash, 0) AS simhash
    FROM documents d LEFT JOIN sh USING (doc_id)
    """,
    doc="32-bit SimHash per document over unigram tokens (with "
    "multiplicity); sign-of-sum per bit position.",
)
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return D.simhash(t(spark, sf, "documents"), "doc_id", "text")


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
         th AS (SELECT doc_id, {hash64_sql('token')} AS h FROM tok),
         bits AS (SELECT doc_id, {_SIMHASH_BITSUMS} FROM th GROUP BY doc_id),
         sh0 AS (SELECT doc_id, CAST({_SIMHASH_VAL} AS BIGINT) AS simhash FROM bits),
         sh AS (SELECT d.doc_id, COALESCE(sh0.simhash, 0) AS simhash
                FROM documents d LEFT JOIN sh0 USING (doc_id)),
         bands AS (
           SELECT doc_id, simhash, band, (simhash >> (8 * band)) & 255 AS band_val
           FROM sh CROSS JOIN (VALUES (0),(1),(2),(3)) b(band)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS sim_a, b.simhash AS sim_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_val = b.band_val
            AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
    doc="SimHash near-dup PAIRS: LSH on 8-bit bands (hamming <= 3 of 32 "
    "bits implies agreement on >= 1 of 4 bands), verified by exact "
    "Hamming distance — the banded candidate + verify shape that "
    "avoids the all-pairs product at scale.",
)
def dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    pairs = D.simhash_pairs(t(spark, sf, "documents"), "doc_id", "text", max_hamming=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "dedup_ngram_jaccard",
    oracle=_MINHASH_PREFIX
    + """,
    grams AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
              FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS ic
              FROM cand c JOIN grams ga ON ga.doc_id = c.id_a
                          JOIN grams gb ON gb.doc_id = c.id_b AND ga.g = gb.g
              GROUP BY c.id_a, c.id_b)
    SELECT c.id_a, c.id_b,
           CAST(coalesce(ic, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(ic, 0) AS DOUBLE) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    WHERE CAST(coalesce(ic, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(ic, 0) AS DOUBLE) >= 0.5
    """,
    doc="Exact word-3-gram Jaccard computed only on MinHash-LSH "
    "candidate pairs (candidate-then-verify, never all-pairs).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return D.ngram_jaccard_pairs(t(spark, sf, "documents"), "doc_id", "text", min_jaccard=0.5)


@query(
    "dedup_embedding_quantized",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             {hash64_sql("array_to_string(list_transform(embedding[1:8], x -> COALESCE(CAST(CAST(floor(CAST(x AS DOUBLE) / 0.5) AS BIGINT) AS VARCHAR), 'n')), ',')")} AS qhash
      FROM embeddings)
    SELECT vec_id, MIN(vec_id) OVER (PARTITION BY qhash) AS canonical_id,
           COUNT(*) OVER (PARTITION BY qhash) AS group_size
    FROM q QUALIFY group_size > 1
    """,
    doc="Embedding near-dup bucketing via grid quantization of the "
    "leading 8 dims (0.5 lattice) + hash-groupBy — the O(n) cheap "
    "candidate generator ahead of exact cosine verification.",
)
def dedup_embedding_quantized(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    return D.embedding_quantize_dedup(e, "vec_id", "embedding", grid=0.5, dims=8)


# --- similarity search -------------------------------------------------------

_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform({a}, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x))"
)


def _cos(a: str, b: str) -> str:
    return f"({_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)}))"


@query(
    "ann_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT query_id, e.vec_id AS neighbor_id, {_cos("e.embedding", "qv")} AS cosine
           FROM embeddings e, q WHERE e.vec_id <> query_id),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 10
    """,
    doc="Exact top-10 cosine ANN baseline: broadcast queries, one "
    "narrow corpus pass, per-query top-k; sequential-fold dot product "
    "(bit-identical across engines).",
    bench=True,
)
def ann_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.brute_force_topk(e, q, "vec_id", "embedding", "query_id", k=10)


@query(
    "ann_ivf",
    oracle=f"""
    WITH comps AS (
           SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
           FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
         centd AS (
           SELECT cell, dim,
                  CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
           FROM comps GROUP BY cell, dim),
         cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         cellrank AS (
           SELECT query_id, cell, qv,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY {_cos("centroid", "qv")} DESC, cell) AS crank
           FROM q, cent),
         probe AS (SELECT query_id, cell, qv FROM cellrank WHERE crank <= 8),
         scored AS (
           SELECT p.query_id, e.vec_id AS neighbor_id, {_cos("e.embedding", "p.qv")} AS cosine
           FROM embeddings e JOIN probe p ON e.label = p.cell
           WHERE e.vec_id <> p.query_id),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 10
    """,
    doc="IVF ANN: decimal-exact per-cell centroids (cell = label), "
    "probe top-8 cells (RECALL.md knee: recall@10 0.90 on this weakly-"
    "clustered 10-cell fixture; nprobe is the published quality/cost "
    "dial — see the recall-vs-nprobe curve), brute force within — "
    "scans ~nprobe/ncells of "
    "the corpus; the 100 TB path with cells as partition keys.",
)
def ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk(e, q, "label", "vec_id", "embedding", "query_id", k=10, nprobe=8)


@query(
    "ann_ivf_indexed",
    oracle=f"""
    WITH comps AS (
           SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
           FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
         centd AS (
           SELECT cell, dim,
                  CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
           FROM comps GROUP BY cell, dim),
         cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id >= 10 AND vec_id < 18),
         cellrank AS (
           SELECT query_id, cell, qv,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY {_cos("centroid", "qv")} DESC, cell) AS crank
           FROM q, cent),
         probe AS (SELECT query_id, cell, qv FROM cellrank WHERE crank <= 8),
         scored AS (
           SELECT p.query_id, e.vec_id AS neighbor_id, {_cos("e.embedding", "p.qv")} AS cosine
           FROM embeddings e JOIN probe p ON e.label = p.cell
           WHERE e.vec_id <> p.query_id),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 10
    """,
    doc="IVF ANN against a MATERIALIZED index (the ann_ivf watch-item "
    "companion to ivfpq_indexed_topk): build_ivf_index's centroids "
    "parquet + vectors partitionBy(cell) are built once "
    "(build-if-absent), and the probe reads the persisted centroids "
    "and statically prunes the vector scan to the top-3 probed cells "
    "per query — the per-query exact-DECIMAL centroid rebuild is off "
    "the query path. Distinct query set (vec_id 10..17, nprobe 8 per "
    "the RECALL.md curve) "
    "from ann_ivf.",
)
def ann_ivf_indexed(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    idx = _index_dir(sf, "ivf")
    if not (
        os.path.exists(f"{idx}/centroids/_SUCCESS")
        and os.path.exists(f"{idx}/vectors/_SUCCESS")
    ):
        SIM.build_ivf_index(e, idx, "label", "vec_id", "embedding")
    q = e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 18)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk_indexed(
        spark, idx, q, "vec_id", "embedding", "query_id", k=10, nprobe=8
    )


# --- text analysis -----------------------------------------------------------


def _stop_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKS}, t -> list_contains([{lst}], lower(t))))"


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars_computed,
           len({_TOKS})::BIGINT AS n_tokens,
           len(list_distinct({_TOKS}))::BIGINT AS n_unique_tokens,
           {_stop_sql(TS.LANG_PROFILES["en"])}::BIGINT AS n_stopwords,
           len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS n_punct,
           CAST(len(list_distinct({_TOKS})) AS DOUBLE)
             / (CASE WHEN len({_TOKS}) > 0 THEN CAST(len({_TOKS}) AS DOUBLE) ELSE 1.0 END) AS unique_ratio,
           CAST({_stop_sql(TS.LANG_PROFILES["en"])} AS DOUBLE)
             / (CASE WHEN len({_TOKS}) > 0 THEN CAST(len({_TOKS}) AS DOUBLE) ELSE 1.0 END) AS stopword_ratio,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
             / CAST(greatest(length(text), 1) AS DOUBLE) AS punct_ratio
    FROM documents
    """,
    doc="Per-document quality features: char/token/unique/stopword/"
    "punct counts and ratios — one narrow projection pass.",
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    return TS.quality_features(t(spark, sf, "documents"), "doc_id", "text")


def _char_profile_sql(chars: tuple[str, ...]) -> str:
    """SQL twin of textstats.char_profile_score (occurrence counts)."""
    return "(" + " + ".join(
        f"(length(text) - length(replace(text, '{ch}', '')))" for ch in chars
    ) + ")"


def _langid_sql() -> str:
    score_cols = {
        lang: (
            _char_profile_sql(words)
            if lang in TS.CHAR_PROFILE_LANGS
            else _stop_sql(words)
        )
        for lang, words in TS.LANG_PROFILES.items()
    }
    langs = list(TS.LANG_PROFILES)
    cases = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        conds.append(f"s_{lang} > 0")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    scores = ", ".join(f"{sql} AS s_{lang}" for lang, sql in score_cols.items())
    return f"""
    WITH s AS (SELECT doc_id, lang AS lang_label, {scores} FROM documents)
    SELECT doc_id, lang_label, CASE {' '.join(cases)} ELSE 'und' END AS lang_guess FROM s
    """


@query(
    "lang_id",
    oracle=_langid_sql(),
    doc="Stopword-profile language ID (argmax of per-language stopword "
    "hits, declaration-order tie-break, no hits → 'und').",
)
def lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id", F.col("lang").alias("lang_label"), TS.lang_id("text").alias("lang_guess")
    )


@query(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           len({_TOKS}) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z0-9]{{1,4}}|[^A-Za-z0-9\\s]')) AS n_bpe_ish
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish subword proxy "
    "(≤4-char alnum runs + punctuation marks).",
)
def token_counts(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        TS.token_count("text").alias("n_tokens"),
        TS.bpe_ish_count("text").alias("n_bpe_ish"),
    )


@query(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({_TOKS}, t -> {hash64_sql('t')} % {TS.FP_P})),
             (acc, h) -> (acc * {TS.FP_MULT} + h) % {TS.FP_P}) AS fp
    FROM documents
    """,
    doc="Order-sensitive document fingerprint: rolling polynomial hash "
    "over token hashes (sequential fold, engine-portable).",
)
def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return d.select("doc_id", TS.fingerprint("text").alias("fp"))


_RHP_W_HASH = hash64_sql("concat(CAST(j AS VARCHAR), '-', CAST(d AS VARCHAR))", "rhp")
_PERT_HASH = hash64_sql(
    "concat(CAST(vec_id AS VARCHAR), '-', CAST(p[2]-1 AS VARCHAR))", "pert"
)
_FOLD_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
)

#: planted-duplicate corpus: the raw embeddings plus ONE perturbed
#: copy each (deterministic hash noise, ids shifted by 1e6) — shared
#: by dedup_embedding_cosine and semantic_dedup so the fixture corpus
#: contains true near-dups. The SQL fragment and :func:`_perturbed_corpus`
#: are the single source of truth; edit them TOGETHER.
_PERT_CORPUS_CTE = f"""corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT orig_id + 1000000 AS vec_id, v FROM (
        SELECT vec_id AS orig_id,
             list_transform(list_zip(embedding, generate_series(1, len(embedding))),
               p -> CAST(p[1] AS DOUBLE)
                    + ((CAST({_PERT_HASH} % 1000 AS DOUBLE) / 1000.0 - 0.5) * 0.05)) AS v
        FROM embeddings)
    )"""


def _perturbed_corpus(e: DataFrame) -> DataFrame:
    """Spark builder of :data:`_PERT_CORPUS_CTE`: embeddings as
    (vec_id, v double[]) plus one perturbed copy per vector.

    Kept as the indexed-transform EXPRESSION form deliberately
    (optimization r12, verdict-r11 #5 — measured, rejected): a
    bit-exact mapInArrow perturbation kernel (vectorized Python md5
    noise) was built and property-tested, but the r11 shared-corpus
    barrier already de-duplicated the interpreted-hash cost across
    consumers, so the kernel only traded interpretation for an extra
    JVM->Python->JVM boundary — semantic_dedup regressed 1.18 -> 1.32 s
    and dedup_embedding_cosine was a wash (isolated min-of-N A/B at
    sf0.1). The interpreted HOF stays because it is the cheaper of
    the two evils at every consumer count >= 1 WITH the barrier in
    place."""
    from hadoop_main_spark.functions.hashing import hash64

    orig = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # two-step select: computing the +1000000 alias in the same select
    # as the lambda would lateral-capture the NEW vec_id inside the
    # perturbation hash (Spark resolves the alias, DuckDB the column)
    pert = e.select(
        F.col("vec_id").alias("orig_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + (
                (
                    hash64(
                        F.concat(
                            F.col("vec_id").cast("string"), F.lit("-"), i.cast("string")
                        ),
                        "pert",
                    )
                    % 1000
                ).cast("double")
                / 1000.0
                - 0.5
            )
            * 0.05,
        ).alias("v"),
    ).select((F.col("orig_id") + 1000000).alias("vec_id"), "v")
    return orig.unionByName(pert)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH wts AS (
      SELECT j, list(CASE WHEN {_RHP_W_HASH} % 2 = 1 THEN 1.0 ELSE -1.0 END ORDER BY d) AS wl
      FROM range(0, 16) t(j) CROSS JOIN range(0, 64) u(d)
      GROUP BY j
    ),
    {_PERT_CORPUS_CTE},
    bits AS (
      SELECT c.vec_id, w.j,
             CASE WHEN {_FOLD_DOT.format(a="c.v", b="w.wl")} >= 0 THEN 1 ELSE 0 END AS bit
      FROM corpus c CROSS JOIN wts w
    ),
    bands AS (
      SELECT vec_id, j // 4 AS band, SUM(bit * (1 << (j % 4))) AS band_val
      FROM bits GROUP BY vec_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_val = b.band_val AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT id_a, id_b,
             ({_FOLD_DOT.format(a="va.v", b="vb.v")}
              / (sqrt({_FOLD_DOT.format(a="va.v", b="va.v")})
                 * sqrt({_FOLD_DOT.format(a="vb.v", b="vb.v")}))) AS cosine
      FROM cand JOIN corpus va ON va.vec_id = id_a JOIN corpus vb ON vb.vec_id = id_b)
    WHERE cosine >= 0.95
    """,
    doc="Embedding-cosine near-dup via random-hyperplane LSH (SimHash "
    "for vectors): plant one perturbed copy per embedding "
    "(deterministic hash noise), sign-of-dot 16-bit signatures, 4-band "
    "candidate join, exact cosine >= 0.95 verification on candidates "
    "only — never an all-pairs product. Completes the dedup family "
    "(exact / minhash / simhash / ngram / quantized / cosine).",
)
def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _perturbed_corpus(t(spark, sf, "embeddings"))
    # rhp_cosine_pairs reads its input THREE times (signature pass +
    # both sides of the exact-cosine verify); the perturbation's
    # per-component hash64 noise is expensive enough (128k interpreted
    # md5 evaluations at sf0.1) that re-deriving it per consumer
    # tripled the query (optimization r11: 3.6 s -> 1.9 s). Lazy, so
    # every action still computes the corpus fresh — the barrier only
    # shares it WITHIN the action.
    corpus = corpus.localCheckpoint(eager=False)
    return D.rhp_cosine_pairs(corpus, "vec_id", "v", dim=64, min_cosine=0.95)


#: capped-variant LSH parameters (dedup_embedding_cosine_capped):
#: 64 bits in 4 bands of 16 — the band space (2^16 values) is ≫ any
#: bounded bucket cap, so the cap prunes only genuine collision
#: pile-ups; shared by the Spark build and the oracle text below.
_RHPC_BITS = 64
_RHPC_BAND_BITS = 16
_RHPC_CAP = 1000


@query(
    "dedup_embedding_cosine_capped",
    oracle=f"""
    WITH wts AS (
      SELECT j, list(CASE WHEN {_RHP_W_HASH} % 2 = 1 THEN 1.0 ELSE -1.0 END ORDER BY d) AS wl
      FROM range(0, {_RHPC_BITS}) t(j) CROSS JOIN range(0, 64) u(d)
      GROUP BY j
    ),
    {_PERT_CORPUS_CTE},
    bits AS (
      SELECT c.vec_id, w.j,
             CASE WHEN {_FOLD_DOT.format(a="c.v", b="w.wl")} >= 0 THEN 1 ELSE 0 END AS bit
      FROM corpus c CROSS JOIN wts w
    ),
    bands AS (
      SELECT vec_id, j // {_RHPC_BAND_BITS} AS band,
             SUM(bit * (1 << (j % {_RHPC_BAND_BITS}))) AS band_val
      FROM bits GROUP BY vec_id, j // {_RHPC_BAND_BITS}
    ),
    sized AS (
      SELECT vec_id, band, band_val,
             COUNT(*) OVER (PARTITION BY band, band_val) AS bn
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sized a JOIN sized b
        ON a.band = b.band AND a.band_val = b.band_val AND a.vec_id < b.vec_id
      WHERE a.bn <= {_RHPC_CAP} AND b.bn <= {_RHPC_CAP}
    )
    SELECT id_a, id_b, cosine FROM (
      SELECT id_a, id_b,
             ({_FOLD_DOT.format(a="va.v", b="vb.v")}
              / (sqrt({_FOLD_DOT.format(a="va.v", b="va.v")})
                 * sqrt({_FOLD_DOT.format(a="vb.v", b="vb.v")}))) AS cosine
      FROM cand JOIN corpus va ON va.vec_id = id_a JOIN corpus vb ON vb.vec_id = id_b)
    WHERE cosine >= 0.95
    """,
    doc="PRODUCTION-shaped RHP-LSH cosine dedup (optimization r12, "
    "verdict-r11 #2 — the declared decision on the band-bucket cap): "
    "same planted-duplicate corpus and exact-cosine >= 0.95 verify as "
    "dedup_embedding_cosine, but 64 signature bits in 4 bands of 16 "
    "(band space 2^16 ≫ corpus, so only true near-dups and rare "
    "random collisions share a bucket) PLUS the minhash-style "
    "max-band-bucket skew guard at 1000 — on a duplicate-heavy "
    "corpus the un-capped 4-bit-band form grows candidates ~copies² "
    "(the r11 10x identical-copy tier measured 57.7x); here bucket "
    "work is bounded by construction. The exact 16-bit form remains "
    "the declared recall-oriented tool; this is the shape a 100 TB "
    "run ships.",
)
def dedup_embedding_cosine_capped(spark: SparkSession, sf: str) -> DataFrame:
    corpus = _perturbed_corpus(t(spark, sf, "embeddings"))
    corpus = corpus.localCheckpoint(eager=False)  # shared by sig + verify
    return D.rhp_cosine_pairs(
        corpus,
        "vec_id",
        "v",
        dim=64,
        min_cosine=0.95,
        bits=_RHPC_BITS,
        band_bits=_RHPC_BAND_BITS,
        max_band_bucket=_RHPC_CAP,
    )


_CC_SUFFIX = f"""
 , pairs AS (
    SELECT id_a, id_b
    FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5),
  und AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
  reach(a, b) AS (
    SELECT a, b FROM und
    UNION
    SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
  comp AS (SELECT a AS doc_id, MIN(b) AS canonical_id FROM reach GROUP BY a)
SELECT doc_id, canonical_id,
       COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
FROM comp
"""


# the CTE chain up THROUGH the components table (no final select) —
# reused by leakage_safe_split's oracle
_CC_MID = _CC_SUFFIX.split("\nSELECT doc_id, canonical_id")[0]


@query(
    "leakage_safe_split",
    oracle=_MINHASH_PREFIX.replace("WITH", "WITH RECURSIVE", 1)
    + _CC_MID
    + f"""
 , canon AS (
    SELECT d.doc_id, d.lang, COALESCE(c.canonical_id, d.doc_id) AS gk
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
  s AS (SELECT lang, gk, {hash64_sql('gk', 'split')} % 100 AS h FROM canon)
SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT gk) AS BIGINT) AS n_groups
FROM s GROUP BY 1, 2
""",
    doc="LEAKAGE-SAFE train/val/test split — the assignment a "
    "benchmark-honest training pipeline actually needs: hashing by "
    "doc_id (train_split_assign) puts near-duplicate documents on "
    "BOTH sides of the train/test boundary, silently inflating eval; "
    "here the split key is the document's near-dup CLUSTER canonical "
    "id (MinHash-LSH pairs -> connected components, singletons their "
    "own group), so an entire duplicate cluster lands in ONE split by "
    "construction. Same salted-hash 90/5/5 discipline; output per "
    "(split, lang): doc count + GROUP count. The oracle replays the "
    "full chain — signatures, banded candidates, exact-agreement "
    "verify, recursive-CTE components, canonical coalesce, split "
    "hash — so the composition, not just the pieces, is verified.",
)
def leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(d, "doc_id", "text", min_est_jaccard=0.5)
    comp = D.connected_components(pairs).withColumnRenamed("id", "doc_id")
    canon = d.select("doc_id", "lang").join(comp, "doc_id", "left").select(
        "lang", F.coalesce(F.col("component"), F.col("doc_id")).alias("gk")
    )
    h = hash64("gk", "split") % 100
    split = F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    return canon.groupBy(split.alias("split"), "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("gk").cast("bigint").alias("n_groups"),
    )


@query(
    "cc_incremental_resolution",
    oracle=_MINHASH_PREFIX.replace("WITH", "WITH RECURSIVE", 1) + _CC_SUFFIX,
    doc="INCREMENTAL duplicate-cluster maintenance (the recrawl path: "
    "an ingest wave adds near-dup pairs against an already-resolved "
    "corpus — re-clustering from scratch per wave is what a 100 TB "
    "pipeline must avoid): the MinHash-LSH pairs split into an OLD "
    "half (both ids below the median) resolved by the standard "
    "connected_components pass, and a NEW wave grafted on via "
    "dedup.connected_components_incremental — prior components "
    "collapse to diameter-1 STARS, so the re-run converges in "
    "O(log d_new) rounds regardless of original cluster depth, over "
    "star + wave edges only. The result must equal dedup_clusters' "
    "ONE-SHOT oracle verbatim (star edges preserve connectivity "
    "exactly): any label the incremental path fails to merge, or any "
    "singleton it loses, moves a row.",
)
def cc_incremental_resolution(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(
        d, "doc_id", "text", min_est_jaccard=0.5
    ).localCheckpoint()  # NOT persist(): the cache manager plan-matches
    # a persisted subplan into EVERY later query computing the same
    # pairs (dedup_minhash_lsh grew an InMemoryTableScan — the round-2
    # cache-hygiene advice); localCheckpoint pins iteration state
    # without registering in the cache manager
    mid = d.agg(F.expr("percentile_approx(doc_id, 0.5, 100000)")).first()[0]
    old = pairs.filter((F.col("id_a") < mid) & (F.col("id_b") < mid))
    new = pairs.filter((F.col("id_a") >= mid) | (F.col("id_b") >= mid))
    labels0 = D.connected_components(old)
    comp = D.connected_components_incremental(labels0, new).withColumnRenamed(
        "id", "doc_id"
    )
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("doc_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


@query(
    "eval_holdout_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang, source
               ORDER BY {hash64_sql("CAST(doc_id AS VARCHAR)", 'holdout')},
                        doc_id) AS rk
      FROM documents)
    SELECT lang, source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY lang, source, rk
    """,
    doc="Deterministic STRATIFIED EVAL HOLDOUT (the eval-set "
    "construction step beside train_split/leakage_safe_split): per "
    "(lang, source) stratum, exactly the 5 documents with the lowest "
    "salted doc-id hash (ties to the lower id) — a fixed-size "
    "per-stratum sample that is REPRODUCIBLE across runs, engines, "
    "and corpus growth within a stratum's existing members (a doc's "
    "hash never changes, so re-running on an append-only corpus can "
    "only swap members when new docs hash lower — the property that "
    "keeps eval sets stable across ingest waves). ONE stratum-keyed "
    "window; no collect, no sort of the corpus.",
)
def eval_holdout_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        hash64(F.col("doc_id").cast("string"), "holdout"), "doc_id"
    )
    return (
        d.select("lang", "source", "doc_id")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .orderBy("lang", "source", "rk")
    )


@query(
    "dedup_clusters",
    oracle=_MINHASH_PREFIX.replace("WITH", "WITH RECURSIVE", 1) + _CC_SUFFIX,
    doc="Duplicate-cluster resolution: MinHash-LSH pairs -> connected "
    "components (iterative min-label propagation, one shuffle per "
    "hop, localCheckpoint-flattened lineage) -> canonical doc per "
    "cluster + cluster size. The oracle verifies the iterative "
    "algorithm against a recursive CTE.",
)
def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    pairs = D.minhash_lsh_pairs(d, "doc_id", "text", min_est_jaccard=0.5)
    comp = D.connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        "cluster_size",
    )


@query(
    "curation_pipeline",
    oracle=_MINHASH_PREFIX
    + f"""
 , pairs AS (
    SELECT id_a, id_b
    FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5),
  dupes AS (SELECT DISTINCT id_b FROM pairs),
  lang AS (SELECT doc_id FROM ({_langid_sql()}) WHERE lang_guess = 'en'),
  qual AS (
    SELECT doc_id, n_tokens FROM (
      SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens,
             CAST(len(list_distinct({_TOKS})) AS DOUBLE)
               / (CASE WHEN len({_TOKS}) > 0 THEN CAST(len({_TOKS}) AS DOUBLE) ELSE 1.0 END) AS unique_ratio
      FROM documents)
    WHERE n_tokens >= 20 AND unique_ratio >= 0.3)
SELECT d.source, COUNT(*) AS n_docs, CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens
FROM documents d
JOIN lang l ON d.doc_id = l.doc_id
JOIN qual q ON d.doc_id = q.doc_id
LEFT JOIN dupes ON d.doc_id = dupes.id_b
WHERE dupes.id_b IS NULL
GROUP BY d.source
""",
    doc="End-to-end training-data curation pipeline composed from the "
    "operator library: language-ID filter (en) -> quality gate "
    "(>=20 tokens, unique-ratio >=0.3) -> MinHash-LSH near-dup drop "
    "(keep the smaller id of each pair) -> per-source doc/token "
    "budget report. One declarative plan; every stage is the same "
    "operator verified individually elsewhere.",
    bench=True,
)
def curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    # lang + quality are all token-derived: fuse them into ONE
    # projection pass over documents (one scan, no self-joins) —
    # only the near-dup id set joins in, as a left anti. The gate
    # expressions are shared with quality_features (single source).
    qcols = TS.token_quality_cols("text")
    feats = d.select(
        "doc_id",
        "source",
        TS.lang_id("text").alias("g"),
        qcols["n_tokens"].alias("n_tokens"),
        qcols["unique_ratio"].alias("unique_ratio"),
    )
    kept = feats.filter(
        (F.col("g") == "en")
        & (F.col("n_tokens") >= 20)
        & (F.col("unique_ratio") >= 0.3)
    )
    dupes = (
        D.minhash_lsh_pairs(d, "doc_id", "text", min_est_jaccard=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        kept.join(dupes, "doc_id", "left_anti")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
    """,
    doc="Distinctive-term extraction (TF-IDF family): tf * N / df "
    "scoring — an exact integer ratio, so the score is engine-portable "
    "without libm log differences. ONE token explosion: document "
    "frequency is a term-partitioned window over the aggregated tf "
    "table (never a vocabulary broadcast — verdict-r4 #1 — and never "
    "a derived-aggregate self-join, whose pruned branch defeats "
    "exchange reuse); per-doc top-3 via a keyed window.",
)
def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    # n_docs as a LAZY one-row broadcast (the token_rarity_score
    # shape), not an eager d.count() — the driver action added a whole
    # extra documents scan before the main plan ran (review-r4b)
    n_docs = d.agg(F.count("*").alias("__n_docs"))
    # NO fan_out: tf's own (doc_id, term) exchange — fed by map-side
    # partial counts of the exploded tokens — is the shared subtree
    # BOTH consumers (dfreq and the score join) reuse at runtime, so
    # the explosion runs once (the dsir_importance shape; a fan_out
    # pre-shuffle would satisfy the grouping and leave no exchange to
    # reuse). The explicit isNotNull keeps the branches
    # canonical-identical under the term-join pushdown (NOTES trap).
    tf = (
        d.select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.explode(tokenize("text")).alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # document frequency = COUNT OVER a term-partitioned window on the
    # aggregated tf table (tf rows are distinct (doc, term) pairs), not
    # a tf x dfreq self-join: Catalyst prunes the join's dfreq branch
    # to functions=[] (count(tf) is rewritten to count(1) via non-null
    # inference first), so canonical equality — and exchange reuse —
    # is unrecoverable in the join form and the explosion runs twice
    # (the bigram_lm_topk lesson). The window partitions by term over
    # vocabulary-bounded groups of the ALREADY-AGGREGATED table; a
    # broadcast of the vocabulary table stays banned at 100x
    # vocabulary (verdict-r4 #1), and only the one-row n_docs total
    # broadcasts.
    w_term = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count("*").over(w_term))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                (F.col("tf") * F.col("__n_docs")).cast("double")
                / F.col("df").cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
    )


@query(
    "bm25_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    dfw AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df,
                   CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
            FROM tf),
    tot AS (SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
                   CAST(SUM(tf) AS BIGINT) AS total_tokens FROM tf),
    terms AS (SELECT term, df FROM (SELECT DISTINCT term, df FROM dfw)
              ORDER BY df DESC, term LIMIT 3),
    scored AS (
      SELECT d.doc_id,
             ((2 * (t.n_docs - q.df) + 1) * 100000) // (2 * q.df + 1) AS idf,
             d.tf,
             2500 + (7500 * d.dl * t.n_docs) // t.total_tokens AS norm
      FROM dfw d JOIN terms q USING (term) CROSS JOIN tot t),
    per_term AS (
      SELECT doc_id,
             (idf * tf * 22000) // (tf * 10000 + (12 * norm) // 10) AS s
      FROM scored),
    agg AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score
            FROM per_term GROUP BY doc_id)
    SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT 20
    """,
    doc="BM25 retrieval ranking (Robertson & Zaragoza 2009, k1=1.2 "
    "b=0.75) in EXACT fixed-point integer arithmetic — the retrieval "
    "scorer beside tfidf_top_terms' extraction scorer: the length "
    "norm lives at scale 1e4 (2500 + 7500*dl*N div total), the idf is "
    "the RSJ ratio (N-df+0.5)/(df+0.5) cross-multiplied to scale 1e5 "
    "WITHOUT the log (rank-order-preserving for single terms and "
    "documented as this engine's scoring contract — libm log is not "
    "engine-portable, the tfidf/pagerank_int discipline), and every "
    "step is positive-operand integer division (Spark div == DuckDB "
    "//). Query = the 3 highest-df terms (deterministic tie-break), "
    "top-20 docs by (score DESC, doc_id). ONE token explosion: df "
    "and dl are BOTH windows over the aggregated tf table (the "
    "tfidf_top_terms shape), the query-term table is LIMIT 3, and "
    "only one-row totals broadcast; top-20 is TakeOrdered, never an "
    "unpartitioned window.",
)
def bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    n_docs = d.agg(F.count("*").cast("bigint").alias("__n_docs"))
    tf = (
        d.select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.explode(tokenize("text")).alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df and dl as windows over the aggregated (doc, term, tf) table —
    # one corpus explosion, no self-joins (the tfidf_top_terms shape)
    dfw = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")).cast("bigint")
    ).withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("bigint")
    )
    totals = tf.agg(F.sum("tf").cast("bigint").alias("__total_tokens")).crossJoin(
        F.broadcast(n_docs)
    )
    terms = (
        dfw.select("term", "df")
        .distinct()
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(3)
        .select("term", F.col("df").alias("qdf"))
    )
    scored = (
        dfw.join(F.broadcast(terms), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.expr("((2 * (__n_docs - qdf) + 1) * 100000) div (2 * qdf + 1)").alias(
                "idf"
            ),
            "tf",
            F.expr("2500 + (7500 * dl * __n_docs) div __total_tokens").alias("norm"),
        )
        .select(
            "doc_id",
            F.expr(
                "(idf * tf * 22000) div (tf * 10000 + (12 * norm) div 10)"
            ).alias("s"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").cast("bigint").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


CHUNK_SIZE = 32
CHUNK_STRIDE = 24


@query(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    chunks AS (
      SELECT doc_id, tk,
             unnest(generate_series(0,
               greatest((len(tk) - {CHUNK_SIZE} + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}, 0))) AS chunk_idx
      FROM toks)
    SELECT doc_id, chunk_idx,
           len(tk[chunk_idx*{CHUNK_STRIDE} + 1 : chunk_idx*{CHUNK_STRIDE} + {CHUNK_SIZE}]) AS n_chunk_tokens,
           array_to_string(tk[chunk_idx*{CHUNK_STRIDE} + 1 : chunk_idx*{CHUNK_STRIDE} + {CHUNK_SIZE}], ' ') AS chunk_text
    FROM chunks
    """,
    doc=f"Document chunking for training pipelines: split each document "
    f"into overlapping {CHUNK_SIZE}-token windows with stride "
    f"{CHUNK_STRIDE} (1→N expand via sequence+explode, then an O(1) "
    f"array slice per chunk — the text is tokenized once, never "
    f"re-scanned per chunk). Trailing partial chunks are kept; chunk "
    f"count is the integer formula ceil((n-size)/stride)+1 clamped "
    f"at 1, so coverage is total. At 100 TB this is a narrow "
    f"map-side transform — no shuffle at all.",
)
def doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    toks = d.select("doc_id", tokenize("text").alias("tk"))
    n_last = F.greatest(
        F.expr(f"(size(tk) - {CHUNK_SIZE} + {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE}"),
        F.lit(0),
    )
    chunks = toks.select(
        "doc_id",
        "tk",
        F.explode(F.sequence(F.lit(0), n_last)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("tk"), F.col("chunk_idx") * CHUNK_STRIDE + 1, F.lit(CHUNK_SIZE)
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size(piece).alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


@query(
    "doc_repetition",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
      FROM toks),
    per_gram AS (SELECT doc_id, shingle, COUNT(*) AS c FROM sh GROUP BY doc_id, shingle),
    per_doc AS (
      SELECT doc_id, SUM(c) AS total_grams, MAX(c) AS top_gram_count,
             COUNT(*) AS distinct_grams
      FROM per_gram GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(total_grams, 0) AS BIGINT) AS total_grams,
           CAST(coalesce(top_gram_count, 0) AS BIGINT) AS top_gram_count,
           CAST(coalesce(top_gram_count, 0) AS DOUBLE)
             / CAST(greatest(coalesce(total_grams, 0), 1) AS DOUBLE) AS top_gram_ratio,
           CAST(coalesce(total_grams, 0) - coalesce(distinct_grams, 0) AS DOUBLE)
             / CAST(greatest(coalesce(total_grams, 0), 1) AS DOUBLE) AS dup_gram_ratio
    FROM documents d LEFT JOIN per_doc USING (doc_id)
    """,
    doc="Repetition / boilerplate detection (quality signal for "
    "training-data curation): per document, the share of word-3-grams "
    "taken by the single most repeated gram (top_gram_ratio) and the "
    "share that are repeats of an earlier gram (dup_gram_ratio). "
    "High values flag looped/boilerplate text. Integer-exact ratios; "
    "two keyed aggregations, fan_out-parallelized explosion; gram-less "
    "docs (<3 tokens) report zeros.",
)
def doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.partitioning import fan_out

    d = t(spark, sf, "documents")
    grams = fan_out(d.select("doc_id", "text"), ["doc_id"]).select(
        "doc_id", F.explode(D.word_shingles("text", 3)).alias("shingle")
    )
    per_gram = grams.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("total_grams"),
        F.max("c").alias("top_gram_count"),
        F.count("*").alias("distinct_grams"),
    )
    total = F.coalesce(F.col("total_grams"), F.lit(0))
    top = F.coalesce(F.col("top_gram_count"), F.lit(0))
    distinct = F.coalesce(F.col("distinct_grams"), F.lit(0))
    denom = F.greatest(total, F.lit(1)).cast("double")
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        total.cast("bigint").alias("total_grams"),
        top.cast("bigint").alias("top_gram_count"),
        (top.cast("double") / denom).alias("top_gram_ratio"),
        ((total - distinct).cast("double") / denom).alias("dup_gram_ratio"),
    )


@query(
    "crossmodal_dup_agreement",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             {hash64_sql("array_to_string(list_transform(embedding[1:8], x -> COALESCE(CAST(CAST(floor(CAST(x AS DOUBLE) / 0.5) AS BIGINT) AS VARCHAR), 'n')), ',')")} AS qhash
      FROM embeddings),
    g AS (SELECT vec_id, MIN(vec_id) OVER (PARTITION BY qhash) AS canon FROM q),
    pairs AS (SELECT canon AS id_a, vec_id AS id_b FROM g WHERE vec_id <> canon),
    toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    grams AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gm
              FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS ic
              FROM pairs p JOIN grams ga ON ga.doc_id = p.id_a
                           JOIN grams gb ON gb.doc_id = p.id_b AND ga.gm = gb.gm
              GROUP BY p.id_a, p.id_b)
    SELECT p.id_a, p.id_b,
           {_cos("ea.embedding", "eb.embedding")} AS cosine,
           CAST(coalesce(ic, 0) AS DOUBLE)
             / CAST(sa.sz + sb.sz - coalesce(ic, 0) AS DOUBLE) AS text_jaccard
    FROM pairs p
    JOIN embeddings ea ON ea.vec_id = p.id_a
    JOIN embeddings eb ON eb.vec_id = p.id_b
    LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    """,
    doc="Cross-modal duplicate verification: candidate pairs come from "
    "the cheap embedding grid-quantization bucketer (O(n), vector "
    "space); each candidate is then scored BOTH by exact embedding "
    "cosine and by text word-3-gram Jaccard over the 1:1-aligned "
    "documents table. The pattern for multimodal corpora where "
    "near-dup decisions need agreement between modalities before "
    "dropping data. Candidates only — never an all-pairs product in "
    "either modality.",
)
def crossmodal_dup_agreement(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.similarity import cosine

    e = t(spark, sf, "embeddings")
    d = t(spark, sf, "documents")
    q = D.embedding_quantize_dedup(e, "vec_id", "embedding", grid=0.5, dims=8)
    pairs = q.filter(F.col("vec_id") != F.col("canonical_id")).select(
        F.col("canonical_id").alias("id_a"), F.col("vec_id").alias("id_b")
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    grams = fan_out(d.select("doc_id", "text"), ["doc_id"]).select(
        F.col("doc_id"),
        F.explode(F.array_distinct(D.word_shingles("text", 3))).alias("gm"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(grams.select(F.col("doc_id").alias("id_a"), "gm"), "id_a")
        .join(grams.select(F.col("doc_id").alias("id_b"), F.col("gm").alias("gm2")), "id_b")
        .filter(F.col("gm") == F.col("gm2"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("ic"))
    )
    return (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            cosine("__va", "__vb").alias("cosine"),
            (
                F.coalesce(F.col("ic"), F.lit(0)).cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("ic"), F.lit(0))).cast(
                    "double"
                )
            ).alias("text_jaccard"),
        )
    )


# --- training-set assembly ops ----------------------------------------------


@query(
    "train_split_assign",
    oracle=f"""
    SELECT CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT lang, n_chars, {hash64_sql('doc_id', 'split')} % 100 AS h FROM documents)
    GROUP BY 1, 2
    """,
    doc="Deterministic train/val/test assignment (90/5/5) by salted "
    "hash of the document id — reproducible across runs, engines and "
    "cluster sizes (no RNG, no randomSplit reshuffle dependence); "
    "per-(split, lang) doc and char budgets for auditing.",
)
def train_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    h = hash64("doc_id", "split") % 100
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "token_pack_bins",
    oracle=f"""
    WITH tc AS (SELECT source, doc_id, len({_TOKS}) AS n_tok FROM documents),
         c AS (
           SELECT source, doc_id, n_tok,
                  COALESCE(SUM(n_tok) OVER (
                    PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
           FROM tc)
    SELECT source, CAST(prev // 2048 AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY source, bin_id
    """,
    doc="Greedy contiguous sequence packing for LM training batches: "
    "documents concatenate in id order per source and split into "
    "2048-token context bins — a doc belongs to the bin where its "
    "first token lands (concat-then-chunk semantics). The running "
    "token count uses the two-phase grouped_prefix_sum (range-"
    "bucketed local windows + broadcast offsets), NOT a "
    "Window.partitionBy(source): with ~20 sources that window would "
    "funnel each source through one task at 100 TB.",
)
def token_pack_bins(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.sorting import grouped_prefix_sum

    d = t(spark, sf, "documents")
    tc = d.select("source", "doc_id", TS.token_count("text").alias("n_tok"))
    prev = grouped_prefix_sum(
        tc, ["source"], ["doc_id"], "n_tok", out_col="__prev", exclusive=True
    )
    return (
        prev.withColumn("bin_id", F.floor(F.col("__prev") / F.lit(2048)).cast("bigint"))
        .groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("bin_tokens"),
        )
    )


@query(
    "domain_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {hash64_sql('doc_id', 'cap')}, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_total
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           CAST(MAX(n_total) AS BIGINT) AS n_total
    FROM ranked WHERE rn <= 50 GROUP BY source
    """,
    doc="Per-domain document cap (the Common-Crawl-style budget that "
    "stops one domain from dominating a corpus): keep 50 docs per "
    "source, chosen by salted-hash rank — a deterministic uniform "
    "sample, stable under any partitioning; reports kept/total per "
    "source.",
)
def domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(hash64("doc_id", "cap"), F.col("doc_id"))
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n_total"),
    )
    return (
        ranked.filter(F.col("rn") <= 50)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
            F.max("n_total").cast("bigint").alias("n_total"),
        )
    )


def _qsum(col: str, scale: int):
    """Partitioning-independent, ENGINE-IDENTICAL sum of doubles:
    quantize each value to 1/scale units with pure double ops
    (floor(v*scale + 0.5) — IEEE-identical in Spark and DuckDB,
    unlike a double->DECIMAL cast whose tie-rounding differs), sum
    as BIGINT, convert back. Quantization coarsens, never diverges."""
    q = F.floor(F.col(col) * F.lit(float(scale)) + F.lit(0.5))
    return F.sum(q).cast("double") / F.lit(float(scale))


_SQ_L2 = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
    "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), (acc, x) -> acc + x)"
)


@query(
    "kmeans_step",
    oracle=f"""
    WITH seeds AS (SELECT vec_id AS cluster, embedding AS seed
                   FROM embeddings WHERE vec_id < 8),
         d AS (SELECT e.vec_id, s.cluster,
                      {_SQ_L2.format(a='e.embedding', b='s.seed')} AS d2,
                      CAST(e.embedding[1] AS DOUBLE) AS e0,
                      CAST(e.embedding[2] AS DOUBLE) AS e1
               FROM embeddings e CROSS JOIN seeds s),
         best AS (SELECT * FROM (
                    SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                    FROM d) WHERE rn = 1)
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(SUM(CAST(floor(e0 * 10000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000000 AS c0_sum,
           CAST(SUM(CAST(floor(e1 * 10000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000000 AS c1_sum,
           CAST(SUM(CAST(floor(d2 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 AS inertia
    FROM best GROUP BY cluster
    """,
    doc="One Lloyd k-means iteration — the IVF coarse-quantizer "
    "TRAINING primitive (ann_ivf consumes a prior clustering; this is "
    "how it gets built): 8 deterministic seed vectors (lowest ids), "
    "every embedding assigned to the nearest seed by sequential-fold "
    "squared L2 (ties to the smaller cluster id), then per-cluster "
    "sizes, DECIMAL-exact component sums (partitioning-independent "
    "centroid numerators) and DECIMAL-exact inertia. Seeds broadcast; "
    "the corpus is scanned once and never shuffled before the final "
    "per-cluster aggregate. Iterating this step to convergence is the "
    "standard driver loop (each iteration one job), exactly like "
    "connected_components' frontier loop.",
)
def kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.similarity import kmeans_assign

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 8).collect()
    ]
    # vectorized nearest-seed assignment (numpy batch kernel,
    # bit-identical to the sequential fold / list_reduce oracle —
    # see operators/similarity.kmeans_assign); no crossJoin + window:
    # one narrow scan, then the per-cluster aggregate
    best = kmeans_assign(e, seeds, "vec_id", "embedding").select(
        "cluster",
        F.col("__d2").alias("d2"),
        F.element_at("embedding", 1).cast("double").alias("e0"),
        F.element_at("embedding", 2).cast("double").alias("e1"),
    )
    return best.groupBy("cluster").agg(
        F.count("*").alias("n_assigned"),
        _qsum("e0", 10**7).alias("c0_sum"),
        _qsum("e1", 10**7).alias("c1_sum"),
        _qsum("d2", 10**6).alias("inertia"),
    )


@query(
    "kmeans_two_steps",
    oracle=f"""
    WITH seeds AS (SELECT vec_id AS cluster, embedding AS seed
                   FROM embeddings WHERE vec_id < 8),
         d1 AS (SELECT e.vec_id, s.cluster,
                       {_SQ_L2.format(a='e.embedding', b='s.seed')} AS d2
                FROM embeddings e CROSS JOIN seeds s),
         b1 AS (SELECT vec_id, cluster FROM (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                  FROM d1) WHERE rn = 1),
         comp1 AS (
           SELECT b1.cluster, i.i AS dim, e.embedding[i.i] AS x
           FROM b1 JOIN embeddings e USING (vec_id),
                unnest(generate_series(1, len(e.embedding))) AS i(i)),
         centd AS (
           SELECT cluster, dim,
                  CAST(((SUM(CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
                         + COUNT(*) * 160000000) // COUNT(*)) - 160000000 AS DOUBLE)
                  / 10000000 AS c
           FROM comp1 GROUP BY cluster, dim),
         cent1 AS (SELECT cluster, list(c ORDER BY dim) AS centroid
                   FROM centd GROUP BY cluster),
         d2t AS (SELECT e.vec_id, c.cluster,
                        {_SQ_L2.format(a='e.embedding', b='c.centroid')} AS d2,
                        CAST(e.embedding[1] AS DOUBLE) AS e0,
                        CAST(e.embedding[2] AS DOUBLE) AS e1
                 FROM embeddings e CROSS JOIN cent1 c),
         b2 AS (SELECT * FROM (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                  FROM d2t) WHERE rn = 1)
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_assigned,
           CAST(SUM(CAST(floor(e0 * 10000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000000 AS c0_sum,
           CAST(SUM(CAST(floor(e1 * 10000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 10000000 AS c1_sum,
           CAST(SUM(CAST(floor(d2 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 AS inertia
    FROM b2 GROUP BY cluster
    """,
    doc="Two Lloyd iterations end-to-end (seed-assign -> DECIMAL-exact "
    "centroid recompute -> re-assign), the in-repo training loop for "
    "ann_ivf's coarse quantizer (operators/similarity.kmeans_fit "
    "iterates the same step to convergence). The k x dim centroid "
    "table is driver-collected between iterations — tiny by "
    "definition, the same pattern as MLlib KMeans and global_rank's "
    "split points. Inertia after step 2 is DECIMAL-exact so the whole "
    "two-step trajectory is oracle-verified bit-for-bit.",
)
def kmeans_two_steps(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.similarity import (
        kmeans_assign,
        kmeans_centroids,
    )

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 8).collect()
    ]
    a1 = kmeans_assign(e, seeds, "vec_id", "embedding")
    cents1 = [
        (int(r.cluster), [float(x) for x in r.centroid])
        for r in kmeans_centroids(a1, "cluster", "embedding").collect()
    ]
    a2 = kmeans_assign(e, cents1, "vec_id", "embedding")
    return (
        a2.select(
            "cluster",
            "__d2",
            F.element_at("embedding", 1).cast("double").alias("e0"),
            F.element_at("embedding", 2).cast("double").alias("e1"),
        )
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_assigned"),
            _qsum("e0", 10**7).alias("c0_sum"),
            _qsum("e1", 10**7).alias("c1_sum"),
            _qsum("__d2", 10**6).alias("inertia"),
        )
    )


@query(
    "ann_ivf_trained",
    oracle=f"""
    WITH seeds AS (SELECT vec_id AS cluster, embedding AS seed
                   FROM embeddings WHERE vec_id < 8),
         d1 AS (SELECT e.vec_id, s.cluster,
                       {_SQ_L2.format(a='e.embedding', b='s.seed')} AS d2
                FROM embeddings e CROSS JOIN seeds s),
         b1 AS (SELECT vec_id, cluster FROM (
                  SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                  FROM d1) WHERE rn = 1),
         comp1 AS (
           SELECT b1.cluster, i.i AS dim, e.embedding[i.i] AS x
           FROM b1 JOIN embeddings e USING (vec_id),
                unnest(generate_series(1, len(e.embedding))) AS i(i)),
         centd1 AS (
           SELECT cluster, dim,
                  CAST(((SUM(CAST(floor(CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
                         + COUNT(*) * 160000000) // COUNT(*)) - 160000000 AS DOUBLE)
                  / 10000000 AS c
           FROM comp1 GROUP BY cluster, dim),
         cent1 AS (SELECT cluster, list(c ORDER BY dim) AS centroid
                   FROM centd1 GROUP BY cluster),
         d2t AS (SELECT e.vec_id, c.cluster,
                        {_SQ_L2.format(a='e.embedding', b='c.centroid')} AS d2
                 FROM embeddings e CROSS JOIN cent1 c),
         cells AS (SELECT vec_id, cluster FROM (
                     SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d2, cluster) AS rn
                     FROM d2t) WHERE rn = 1),
         comps AS (
           SELECT cells.cluster AS cell, i.i AS dim, e.embedding[i.i] AS x
           FROM cells JOIN embeddings e USING (vec_id),
                unnest(generate_series(1, len(e.embedding))) AS i(i)),
         centd AS (
           SELECT cell, dim,
                  CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
           FROM comps GROUP BY cell, dim),
         cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
         q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         cellrank AS (
           SELECT query_id, cell, qv,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY {_cos("centroid", "qv")} DESC, cell) AS crank
           FROM q, cent),
         probe AS (SELECT query_id, cell, qv FROM cellrank WHERE crank <= 4),
         scored AS (
           SELECT p.query_id, e.vec_id AS neighbor_id, {_cos("e.embedding", "p.qv")} AS cosine
           FROM embeddings e JOIN cells ON cells.vec_id = e.vec_id
                JOIN probe p ON cells.cluster = p.cell
           WHERE e.vec_id <> p.query_id),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 10
    """,
    doc="IVF with a TRAINED coarse quantizer, end-to-end under the "
    "exact oracle — the FAISS train+search loop the label-cell "
    "variants approximate: two Lloyd iterations (seed-assign -> "
    "1e-7-grid integer-exact centroid recompute -> re-assign, the "
    "kmeans_two_steps trajectory) produce the cell map, then the "
    "standard IVF probe (per-cell decimal-exact centroids, top-4 of "
    "8 trained cells by query-centroid cosine) prunes the scan. "
    "Trained cells track the metric where label cells cannot, so "
    "this is the quality path RECALL.md's curve points at; the k x "
    "dim centroid table is driver-collected between iterations "
    "(MLlib KMeans' pattern, tiny by definition).",
)
def ann_ivf_trained(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.similarity import (
        kmeans_assign,
        kmeans_centroids,
    )

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 8).collect()
    ]
    a1 = kmeans_assign(e, seeds, "vec_id", "embedding")
    cents1 = [
        (int(r.cluster), [float(x) for x in r.centroid])
        for r in kmeans_centroids(a1, "cluster", "embedding").collect()
    ]
    cells = kmeans_assign(e, cents1, "vec_id", "embedding").select(
        "vec_id", "embedding", "cluster"
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk(
        cells, q, "cluster", "vec_id", "embedding", "query_id", k=10, nprobe=4
    )


@query(
    "decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
         g5 AS (SELECT DISTINCT doc_id,
                       unnest(list_transform(
                         generate_series(1, greatest(len(tk) - 4, 0)),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                              || ' ' || tk[i+3] || ' ' || tk[i+4])) AS g
                FROM toks),
         bg AS (SELECT DISTINCT {hash64_sql('g')} AS gh FROM g5
                WHERE doc_id % 97 = 0),
         tg AS (SELECT doc_id, {hash64_sql('g')} AS gh FROM g5
                WHERE doc_id % 97 <> 0),
         hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gh))
    SELECT d.doc_id, d.source, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 97 <> 0
    """,
    doc="Benchmark decontamination — the test-set-overlap scrub every "
    "serious training corpus needs: the doc_id %% 97 == 0 slice plays "
    "the benchmark/eval set, its distinct word-5-gram hashes become a "
    "BROADCAST filter (eval sets are tiny by construction), and every "
    "training document sharing at least one 5-gram is flagged. Only "
    "64-bit gram hashes move — document text never shuffles; the "
    "per-doc flag (not a dropped row) lets downstream choose flag-"
    "and-weight vs hard removal.",
)
def decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    g5 = d.select(
        "doc_id",
        F.explode(F.array_distinct(D.word_shingles("text", 5))).alias("g"),
    ).select("doc_id", hash64("g").alias("gh"))
    # one shingle+md5 pass shared by the bench (broadcast build) and
    # train (probe) consumers — same barrier as decontaminate_bloom
    g5 = g5.localCheckpoint(eager=False)
    bench_grams = g5.filter(F.col("doc_id") % 97 == 0).select("gh").distinct()
    train_grams = g5.filter(F.col("doc_id") % 97 != 0)
    hits = (
        train_grams.join(broadcast(bench_grams), "gh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        d.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", "source", F.coalesce("__hit", F.lit(False)).alias("contaminated")
        )
    )


@query(
    "bigram_topk",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
         bg AS (SELECT unnest(list_transform(
                  generate_series(1, greatest(len(tk) - 1, 0)),
                  i -> tk[i] || ' ' || tk[i+1])) AS bigram
                FROM toks)
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram LIMIT 20
    """,
    doc="Corpus bigram top-k — the second-order collocation count "
    "(classic chained-MR shape: tokenize -> pair -> count -> top-k). "
    "Partial aggregation combines map-side and the limit plans as "
    "TakeOrderedAndProject (per-partition top-20 + 20-row merge), so "
    "neither the full bigram table nor a global sort ever "
    "materializes. Tie-break on the bigram makes top-k deterministic.",
)
def bigram_topk(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(20)
    )


#: PII regexes shared verbatim by the Spark build and the oracle —
#: conservative RE2-compatible subset so Java regex and DuckDB agree
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\+1-555-[0-9]{4}"
_PII_IP = "10\\.[0-9]{1,3}\\.0\\.[0-9]{1,3}"


@query(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS body
      FROM documents),
    red AS (
      SELECT doc_id, source,
             len(regexp_extract_all(body, '{_PII_EMAIL}')) AS n_email,
             len(regexp_extract_all(body, '{_PII_PHONE}')) AS n_phone,
             len(regexp_extract_all(body, '{_PII_IP}')) AS n_ip,
             regexp_replace(regexp_replace(regexp_replace(body,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS scrubbed
      FROM aug)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
           CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
           CAST(SUM(n_ip) AS BIGINT) AS ips_redacted,
           CAST(SUM({hash64_sql('scrubbed')} % 1000003) AS BIGINT) AS scrub_check
    FROM red GROUP BY source
    """,
    doc="PII redaction — the privacy scrub every training corpus "
    "runs before tokenization: emails, phone numbers and IPs are "
    "regex-redacted to typed placeholders in ONE projection pass "
    "(no shuffle until the per-source count aggregate; the text "
    "itself never shuffles). The synthetic corpus carries no real "
    "PII, so deterministic doc_id-derived PII is appended first and "
    "the scrubbed text is checksummed per source, proving the exact "
    "replacement output, not just match counts. Patterns stay in the "
    "RE2-compatible subset so Java regex and the oracle agree.",
)
def pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    aug = d.select("doc_id", "source", body.alias("body"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("body"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    red = aug.select(
        "source",
        F.size(F.regexp_extract_all("body", F.lit(_PII_EMAIL), F.lit(0))).alias("n_email"),
        F.size(F.regexp_extract_all("body", F.lit(_PII_PHONE), F.lit(0))).alias("n_phone"),
        F.size(F.regexp_extract_all("body", F.lit(_PII_IP), F.lit(0))).alias("n_ip"),
        scrubbed.alias("scrubbed"),
    )
    return red.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_email").alias("emails_redacted"),
        F.sum("n_phone").alias("phones_redacted"),
        F.sum("n_ip").alias("ips_redacted"),
        F.sum(hash64("scrubbed") % 1000003).alias("scrub_check"),
    )


@query(
    "url_canonicalize",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'HTTPS://WWW.' || source || '.Example.COM/path/'
               || CAST(doc_id % 50 AS VARCHAR) || '/?utm_source=x&id='
               || CAST(doc_id % 7 AS VARCHAR) || '&ref=abc#frag' AS url
      FROM documents),
    canon AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(lower(url),
                 '#.*$', ''),
                 '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
                 '[?&]+$', ''),
                 '^https://www\\.', 'https://'),
                 '/+$', '') AS canonical_url
      FROM u)
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS canonical_doc
    FROM canon GROUP BY canonical_url
    """,
    doc="URL canonicalization + dedup — the web-crawl ingest step "
    "that collapses scheme/case/www/fragment/tracking-param variants "
    "before content dedup ever runs (same variants, one fetch): "
    "lowercase, strip fragment, drop utm_*/ref params, normalize "
    "www + trailing slash, then group by the canonical form with the "
    "min doc_id as the canonical representative. Synthetic URLs are "
    "derived from doc_id/source since the corpus has none; the "
    "regexp_replace chain is the operator under test and runs "
    "verbatim in both engines. One projection + one count shuffle on "
    "the canonical key.",
)
def url_canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM/path/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("/?utm_source=x&id="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref=abc#frag"),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.lower(url), "#.*$", ""),
                    "(utm_[a-z]+|ref)=[^&]*&?",
                    "",
                ),
                "[?&]+$",
                "",
            ),
            "^https://www\\.",
            "https://",
        ),
        "/+$",
        "",
    )
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


# --- round-4 extensions: containment, SemDeDup, quality rules, mixing --------


@query(
    "dedup_ngram_containment",
    oracle=_MINHASH_PREFIX
    + """,
    grams AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
              FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS ic
              FROM cand c JOIN grams ga ON ga.doc_id = c.id_a
                          JOIN grams gb ON gb.doc_id = c.id_b AND ga.g = gb.g
              GROUP BY c.id_a, c.id_b)
    SELECT i.id_a, i.id_b,
           CAST(ic AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE CAST(ic AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.6
    """,
    doc="Exact n-gram CONTAINMENT (inter / min set size) on MinHash-LSH "
    "candidate pairs — the asymmetric doc-inside-doc overlap score "
    "that symmetric Jaccard dilutes (a page fully contained in a book "
    "has jaccard ~0 but containment 1). Shared candidate+verify core "
    "with dedup_ngram_jaccard; never an all-pairs product.",
)
def dedup_ngram_containment(spark: SparkSession, sf: str) -> DataFrame:
    return D.ngram_containment_pairs(
        t(spark, sf, "documents"), "doc_id", "text", min_containment=0.6
    )


#: the SemDeDup candidate chain (seed assign -> cluster-size guard ->
#: within-cluster pairs) and its exact-cosine scoring subquery — ONE
#: definition shared by semantic_dedup (pairs view) and
#: semantic_dedup_clusters (resolves the SAME pairs), so a threshold
#: or seed change can never desynchronize the two.
_SEM_CAND_CTE = f"""seeds AS (SELECT vec_id AS cluster,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS seed
                   FROM embeddings
                   WHERE vec_id < LEAST(GREATEST(8, (SELECT COUNT(*) FROM embeddings) // 250), 4096)),
    {_PERT_CORPUS_CTE},
    d AS (SELECT c.vec_id, s.cluster, {_SQ_L2.format(a='c.v', b='s.seed')} AS d2
          FROM corpus c CROSS JOIN seeds s),
    best AS (SELECT vec_id, cluster FROM (
               SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY d2, cluster) AS rn
               FROM d) WHERE rn = 1),
    sized AS (SELECT *, COUNT(*) OVER (PARTITION BY cluster) AS cn FROM best),
    cand AS (SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b
             FROM sized a JOIN sized b
               ON a.cluster = b.cluster AND a.vec_id < b.vec_id
             WHERE a.cn <= 10000)"""

_SEM_SCORED = f"""(
      SELECT cluster, id_a, id_b,
             ({_FOLD_DOT.format(a="va.v", b="vb.v")}
              / nullif(sqrt({_FOLD_DOT.format(a="va.v", b="va.v")})
                       * sqrt({_FOLD_DOT.format(a="vb.v", b="vb.v")}), 0.0)) AS cosine
      FROM cand JOIN corpus va ON va.vec_id = id_a JOIN corpus vb ON vb.vec_id = id_b)"""


def _semantic_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Spark builder of the shared SemDeDup pair set (the Spark twin
    of :data:`_SEM_CAND_CTE` + :data:`_SEM_SCORED` + the 0.95 cut)."""
    e = t(spark, sf, "embeddings")
    corpus = _perturbed_corpus(e)
    # k SCALES with the corpus (k ~ n / target-cluster-size, the
    # SemDeDup contract): fixed k=8 kept clusters growing linearly
    # with n, so within-cluster pair work grew QUADRATICALLY — the
    # 10x scale gate measured 57x (tools/scale_gate.py, round 7).
    # max(8, n // 250) is 8 at every fixture sf (results unchanged)
    # and caps mean cluster size at ~500 vectors beyond that. The
    # count is parquet-footer metadata, not a scan. k is CAPPED at
    # 4096 (advice r7): the seeds ride the assignment kernel's
    # CLOSURE, so driver memory / closure size is k*dim floats and
    # assignment work is n*k — both must stay bounded, not grow with
    # the corpus. Beyond n ~ 1M vectors, cluster size grows again;
    # for true corpus-scaling k the seeds would need to stay
    # distributed (a broadcast DataFrame join, a different operator).
    k = min(max(8, e.count() // 250), 4096)
    seeds = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < k).collect()
    ]
    return SIM.semantic_dedup_pairs(
        corpus, seeds, "vec_id", "v", min_cosine=0.95, max_cluster=10_000
    )


_DBSCAN_EPS = 200  # 1e-4 grid units = 0.02 in embedding space
_DBSCAN_MINPTS = 4
_DBSCAN_SHIFT = 16384  # makes grid coords positive so div == //


@query(
    "dbscan_embedding_clusters",
    oracle=lambda sf_dir: f"""
    WITH pts AS (
      SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
               + {_DBSCAN_SHIFT} AS gx,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 10000 + 0.5) AS BIGINT)
               + {_DBSCAN_SHIFT} AS gy
      FROM embeddings),
    dp AS MATERIALIZED (
      SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS w, MIN(vec_id) AS rep,
             gx // {_DBSCAN_EPS} AS cx, gy // {_DBSCAN_EPS} AS cy
      FROM pts GROUP BY gx, gy),
    nk AS (
      SELECT rep, gx, gy, w, cx + d.dx AS kx, cy + d.dy AS ky
      FROM dp, (SELECT x.dx, y.dy FROM unnest([-1, 0, 1]) x(dx),
                unnest([-1, 0, 1]) y(dy)) d),
    cand AS MATERIALIZED (
      SELECT a.rep AS rep_a, b.rep AS rep_b, b.w AS w_b
      FROM dp a JOIN nk b ON b.kx = a.cx AND b.ky = a.cy
      WHERE (a.gx - b.gx) * (a.gx - b.gx)
            + (a.gy - b.gy) * (a.gy - b.gy) <= {_DBSCAN_EPS * _DBSCAN_EPS}),
    mass AS MATERIALIZED (
      SELECT rep_a AS rep, SUM(w_b) AS m FROM cand GROUP BY rep_a),
    mp AS (SELECT greatest({_DBSCAN_MINPTS},
             (SELECT SUM(m) FROM mass) // (SELECT COUNT(*) FROM mass) + 1)
             AS minpts),
    core AS MATERIALIZED (
      SELECT rep FROM mass CROSS JOIN mp WHERE m >= minpts),
    ce AS (SELECT c.rep_a AS a, c.rep_b AS b FROM cand c
           JOIN core ka ON ka.rep = c.rep_a JOIN core kb ON kb.rep = c.rep_b
           WHERE c.rep_a <> c.rep_b),
    und AS MATERIALIZED (SELECT a, b FROM ce UNION SELECT b, a FROM ce),
    {_cc_pointer_jump_sql(16)},
    corelab AS MATERIALIZED (
      SELECT core.rep, COALESCE(comp.canonical_id, core.rep) AS cluster
      FROM core LEFT JOIN comp ON comp.entity_id = core.rep),
    borderlab AS MATERIALIZED (
      SELECT c.rep_a AS rep, MIN(cl.cluster) AS cluster
      FROM cand c JOIN corelab cl ON cl.rep = c.rep_b
      WHERE c.rep_a NOT IN (SELECT rep FROM core)
      GROUP BY c.rep_a),
    lab AS (
      SELECT dp.gx, dp.gy,
             CASE WHEN cl.rep IS NOT NULL THEN 'core'
                  WHEN bl.rep IS NOT NULL THEN 'border'
                  ELSE 'noise' END AS role,
             COALESCE(cl.cluster, bl.cluster, -1) AS cluster
      FROM dp LEFT JOIN corelab cl ON cl.rep = dp.rep
              LEFT JOIN borderlab bl ON bl.rep = dp.rep)
    SELECT p.vec_id, CAST(l.cluster AS BIGINT) AS cluster, l.role
    FROM pts p JOIN lab l ON l.gx = p.gx AND l.gy = p.gy
    ORDER BY p.vec_id
    """,
    doc="DBSCAN density clustering (Ester et al., KDD'96) over the "
    "embedding 2-D projection on the exact 1e-4 integer grid — the "
    "density-based clustering family beside k-means (centroid) and "
    "SemDeDup (similarity-threshold): eps = 0.02, minPts ADAPTIVE = "
    "max(4, mean eps-neighborhood mass + 1) as a one-row broadcast "
    "(cores are above-average-density points — on a single dense "
    "blob a fixed minPts makes everything core and one giant "
    "eps-CHAIN whose CC depth dominates; the adaptive cut keeps "
    "core components shallow at every density, and is exact integer "
    "division on both engines), core / border / noise roles, "
    "clusters = connected components of the core-core eps-graph, "
    "border points joining their MINIMUM core neighbor's cluster "
    "(the published algorithm leaves border assignment "
    "scan-order-dependent; the min rule makes it deterministic and "
    "engine-portable — documented contract). The "
    "100 TB shape is WEIGHTED DBSCAN on DISTINCT grid points: exact "
    "duplicates collapse to one weighted point FIRST (result-"
    "IDENTICAL: a copy's eps-neighborhood mass equals the sum of "
    "multiplicities), so a mass-duplicated corpus — the 10x/100x "
    "key-shifted-copy tier, or a real recrawl — pays pair work in "
    "DISTINCT density, never in corpus rows; labels fan back to ids "
    "by one (gx, gy) equi-join. Candidates come from one 9-cell "
    "grid-blocked equi-join (cell side = eps), exact int64 distance "
    "verify, then pointer-jump CC (O(log diameter) rounds). The "
    "oracle replays the full chain including the unrolled CC at 16 "
    "rounds — eps-graphs chain DEEPER than entity_clusters' "
    "diameter-20 name graph (12 rounds left a 183-node chain "
    "cluster split at sf0.01; 16 vs 20 rounds pinned hash-equal at "
    "sf0.01 AND sf0.1).",
)
def dbscan_embedding_clusters(spark: SparkSession, sf: str) -> DataFrame:
    eps, eps2, minpts = _DBSCAN_EPS, _DBSCAN_EPS * _DBSCAN_EPS, _DBSCAN_MINPTS
    e = t(spark, sf, "embeddings")
    pts = e.select(
        "vec_id",
        (
            F.floor(F.col("embedding")[0].cast("double") * 10000 + F.lit(0.5)).cast(
                "bigint"
            )
            + _DBSCAN_SHIFT
        ).alias("gx"),
        (
            F.floor(F.col("embedding")[1].cast("double") * 10000 + F.lit(0.5)).cast(
                "bigint"
            )
            + _DBSCAN_SHIFT
        ).alias("gy"),
    )
    # distinct weighted grid points — the dedup-first discipline that
    # keeps pair work bounded by DISTINCT density under mass
    # duplication; localCheckpoint because candidates, mass, core and
    # the final fan-out all re-read it
    dp = (
        pts.groupBy("gx", "gy")
        .agg(F.count("*").cast("bigint").alias("w"), F.min("vec_id").alias("rep"))
        .withColumn("cx", F.expr(f"gx div {eps}"))
        .withColumn("cy", F.expr(f"gy div {eps}"))
        .localCheckpoint()
    )
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    (F.col("cx") + F.lit(dx)).alias("kx"),
                    (F.col("cy") + F.lit(dy)).alias("ky"),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("k")
    nk = dp.select(
        F.col("rep").alias("rep_b"),
        F.col("gx").alias("bx"),
        F.col("gy").alias("by"),
        F.col("w").alias("w_b"),
        cells,
    ).select("rep_b", "bx", "by", "w_b", "k.kx", "k.ky")
    cand = (
        dp.join(nk, (F.col("kx") == F.col("cx")) & (F.col("ky") == F.col("cy")))
        .filter(
            (F.col("gx") - F.col("bx")) * (F.col("gx") - F.col("bx"))
            + (F.col("gy") - F.col("by")) * (F.col("gy") - F.col("by"))
            <= eps2
        )
        .select(F.col("rep").alias("rep_a"), "rep_b", "w_b")
        .localCheckpoint()
    )
    mass = cand.groupBy("rep_a").agg(F.sum("w_b").alias("m"))
    # density-ADAPTIVE core threshold: max(minPts, mean neighborhood
    # mass + 1) as a one-row broadcast — cores are above-average-
    # density points, so low-density bridge chains become border/
    # noise and core components stay SHALLOW (a fixed minPts on a
    # single dense blob yields one giant eps-chain whose CC depth,
    # not data volume, dominated the fixture)
    stats = mass.agg(
        F.expr(f"greatest({minpts}, (sum(m) div count(*)) + 1)").alias("__minpts")
    )
    core = (
        mass.crossJoin(F.broadcast(stats))
        .filter(F.col("m") >= F.col("__minpts"))
        .select(F.col("rep_a").alias("rep"))
        .localCheckpoint()
    )
    ce = (
        cand.filter(F.col("rep_a") != F.col("rep_b"))
        .join(core.withColumnRenamed("rep", "rep_a"), "rep_a", "left_semi")
        .join(core.withColumnRenamed("rep", "rep_b"), "rep_b", "left_semi")
        .select(F.col("rep_a").alias("id_a"), F.col("rep_b").alias("id_b"))
    )
    comp = D.connected_components(ce)
    corelab = core.join(
        comp.withColumnRenamed("id", "rep"), "rep", "left"
    ).select("rep", F.coalesce("component", "rep").alias("cluster"))
    borderlab = (
        cand.join(core.withColumnRenamed("rep", "rep_a"), "rep_a", "left_anti")
        .join(
            corelab.select(F.col("rep").alias("rep_b"), "cluster"), "rep_b"
        )
        .groupBy("rep_a")
        .agg(F.min("cluster").alias("cluster"))
        .withColumnRenamed("rep_a", "rep")
    )
    lab = (
        dp.join(corelab.withColumnRenamed("cluster", "c_core"), "rep", "left")
        .join(borderlab.withColumnRenamed("cluster", "c_border"), "rep", "left")
        .select(
            "gx",
            "gy",
            F.when(F.col("c_core").isNotNull(), F.lit("core"))
            .when(F.col("c_border").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("c_core", "c_border", F.lit(-1)).cast("bigint").alias(
                "cluster"
            ),
        )
    )
    return pts.join(lab, ["gx", "gy"]).select("vec_id", "cluster", "role")


@query(
    "semantic_dedup",
    bench=True,
    oracle=f"""
    WITH {_SEM_CAND_CTE}
    SELECT cluster, id_a, id_b, cosine FROM {_SEM_SCORED}
    WHERE cosine >= 0.95 AND NOT isnan(cosine)
    """,
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means "
    "coarse clustering of the embedding space (8 deterministic seed "
    "vectors, the ann_ivf/kmeans_step quantizer), then EXACT "
    "sequential-fold cosine only WITHIN each cluster — pairwise work "
    "drops from O(n^2) to O(sum n_c^2) and at 100 TB k scales with "
    "the corpus so clusters stay bounded (max_cluster skew guard "
    "mirrors the LSH band-bucket cap). One perturbed copy per "
    "embedding is planted (deterministic hash noise, the "
    "dedup_embedding_cosine corpus) so the fixture corpus contains "
    "true semantic dups. Assignment is the vectorized mapInArrow "
    "kernel; the within-cluster pair join is an equi-join on the "
    "cluster id, never a cartesian product.",
)
def semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return _semantic_pairs(spark, sf)


@query(
    "gopher_quality_flags",
    oracle=f"""
    WITH nn AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
    feat AS (
      SELECT doc_id,
             {_TOKS} AS tk,
             string_split(text, chr(10)) AS ls,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash,
             CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_ell
      FROM nn),
    agg AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_tok,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(tk, t -> CAST(length(t) AS BIGINT))), (a, x) -> a + x) AS sum_len,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS bullet_lines,
             CAST(len(list_filter(ls, l -> l LIKE '%...')) AS BIGINT) AS ell_lines,
             CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
             CAST(len(list_intersect(list_transform(tk, t -> lower(t)),
               {list(TS.GOPHER_STOPWORDS)})) AS BIGINT) AS stop_d,
             n_hash, n_ell
      FROM feat)
    SELECT doc_id,
           n_tok AS n_tokens,
           (n_tok >= 50 AND n_tok <= 100000) AS ok_token_count,
           (3 * n_tok <= sum_len AND sum_len <= 10 * n_tok) AS ok_word_length,
           (10 * (n_hash + n_ell) <= n_tok) AS ok_symbol_ratio,
           (10 * bullet_lines <= 9 * n_lines) AS ok_bullet_lines,
           (10 * ell_lines <= 3 * n_lines) AS ok_ellipsis_lines,
           (5 * alpha_words >= 4 * n_tok) AS ok_alpha_words,
           (stop_d >= 2) AS ok_stopwords,
           ((n_tok >= 50 AND n_tok <= 100000)
            AND (3 * n_tok <= sum_len AND sum_len <= 10 * n_tok)
            AND (10 * (n_hash + n_ell) <= n_tok)
            AND (10 * bullet_lines <= 9 * n_lines)
            AND (10 * ell_lines <= 3 * n_lines)
            AND (5 * alpha_words >= 4 * n_tok)
            AND (stop_d >= 2)) AS pass_gopher
    FROM agg
    """,
    doc="Gopher document-quality rules (Rae et al. 2021, "
    "arXiv:2112.11446 §A1.1) as per-doc boolean flags + the combined "
    "gate: token-count bounds, mean word length in [3,10], "
    "symbol-to-word ratio, bullet/ellipsis line fractions, "
    "alphabetic-word fraction, >= 2 distinct stopwords. Every ratio "
    "threshold is CROSS-MULTIPLIED to an integer comparison — zero "
    "float divisions, bit-portable. One narrow projection pass, no "
    "shuffle (the pre-dedup quality gate of every LLM data pipeline).",
)
def gopher_quality_flags(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    flags = TS.gopher_flags_cols("text")
    return d.select("doc_id", *[c.alias(n) for n, c in flags.items()])


@query(
    "token_rarity_score",
    oracle="""
    WITH tok AS (SELECT doc_id,
                        unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS term
                 FROM documents),
    cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term),
    tot AS (SELECT CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))) AS BIGINT) AS n_total
            FROM documents),
    scored AS (SELECT doc_id, n_total // c AS r
               FROM tok JOIN cnt USING (term) CROSS JOIN tot),
    pd AS (SELECT doc_id, CAST(SUM(r) AS BIGINT) AS rarity_sum,
                  CAST(COUNT(*) AS BIGINT) AS n_tokens
           FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(rarity_sum, 0) AS rarity_sum,
           COALESCE(n_tokens, 0) AS n_tokens,
           CASE WHEN COALESCE(n_tokens, 0) > 0
                THEN CAST(rarity_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                ELSE 0.0 END AS mean_rarity
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
    doc="Corpus-statistics rarity score (the libm-free analog of a "
    "unigram-LM perplexity filter, CCNet-style): every token scores "
    "floor(N / corpus_count(token)) — an exact BIGINT, large for rare "
    "tokens, 1-ish for stopwords — summed per document, plus the "
    "mean as an exact-integer ratio. Two aggregates (term counts, "
    "per-doc sum) + one join on the term key; the term-count table "
    "is the only broadcast-sized side at 100 TB if the vocabulary is "
    "bounded, else it shuffle-joins on term (both engines identical: "
    "no log(), no float accumulation).",
)
def token_rarity_score(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    # single explosion via the shared per-(doc, term) partial-agg
    # exchange (the dsir_importance shape): tc is consumed by the
    # vocabulary aggregate AND the score join, reused at runtime
    tc = (
        d.select("doc_id", "text")
        # doc_id isNotNull mirrors the final left join's pushdown into
        # the probe branch (the NOTES ReusedExchange trap)
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.explode(tokenize("text")).alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tc"))
    )
    cnt = tc.groupBy("term").agg(F.sum("tc").cast("bigint").alias("c"))
    # corpus total from a NARROW projection (sum of per-doc token
    # counts) — deriving it from cnt would hang a third consumer off
    # the shared exchange for a 1-row result; the narrow scan is free
    tot = d.agg(F.sum(F.size(tokenize("text"))).cast("bigint").alias("n_total"))
    scored = tc.join(cnt, "term").crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "tc",
        (F.col("tc") * F.expr("n_total div c")).alias("r"),
    )
    pd = scored.groupBy("doc_id").agg(
        F.sum("r").cast("bigint").alias("rarity_sum"),
        F.sum("tc").cast("bigint").alias("n_tokens"),
    )
    return d.select("doc_id").join(pd, "doc_id", "left").select(
        "doc_id",
        F.coalesce("rarity_sum", F.lit(0)).alias("rarity_sum"),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.col("rarity_sum").cast("double") / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_rarity"),
    )


#: per-source budget math shared by domain_mix_weights (publishes it)
#: and domain_mix_apply (samples by it) — ONE definition each side, so
#: the applied sample can never disagree with the published budgets
#: (the _band_structs discipline). Weight: 'src<digits>' sources get
#: (idx % 4) + 1, anything else falls back to 1 via try_cast.
_MIX_SRC_CTE = """src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             COALESCE(TRY_CAST(regexp_extract(source, '^src(\\d+)$', 1) AS BIGINT) % 4 + 1, 1) AS weight
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
                   CAST(SUM(weight) AS BIGINT) AS w_total
            FROM src)"""


def _domain_budgets(d: DataFrame) -> DataFrame:
    """Spark builder of :data:`_MIX_SRC_CTE` joined to its totals:
    (source, n_docs, weight, n_total, w_total), one row per source
    with the one-row totals broadcast on."""
    src = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_docs")).select(
        "source",
        "n_docs",
        F.coalesce(
            # try_cast: a source not matching 'src<digits>' must fall
            # back to weight 1, not crash the ANSI cast (both engines)
            F.expr(r"try_cast(regexp_extract(source, '^src(\\d+)$', 1) AS BIGINT)")
            % 4
            + 1,
            F.lit(1),
        ).alias("weight"),
    )
    tot = src.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.sum("weight").cast("bigint").alias("w_total"),
    )
    return src.crossJoin(F.broadcast(tot))


@query(
    "domain_mix_weights",
    oracle=f"""
    WITH {_MIX_SRC_CTE}
    SELECT source, n_docs, weight,
           (weight * n_total) // w_total AS target_docs,
           least(n_docs, (weight * n_total) // w_total) AS kept_docs,
           CAST(least(n_docs, (weight * n_total) // w_total) AS DOUBLE)
             / CAST(n_docs AS DOUBLE) AS keep_rate
    FROM src CROSS JOIN tot
    """,
    doc="Training-mixture resampling math (the Pile / DoReMi-style "
    "domain reweighting, statically targeted): each source gets a "
    "deterministic integer target weight, the per-source document "
    "budget is the exact integer share (w * N) div W, the keep rate "
    "is the exact ratio of the capped budget to the source size. "
    "Downstream, train_split_assign's deterministic hash sampling "
    "applies keep_rate per source. One groupBy + a broadcast of the "
    "one-row totals — the per-source table is tiny by definition at "
    "any corpus scale.",
)
def domain_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    out = _domain_budgets(t(spark, sf, "documents"))
    target = F.expr("(weight * n_total) div w_total")
    kept = F.least(F.col("n_docs"), target)
    return out.select(
        "source",
        "n_docs",
        "weight",
        target.alias("target_docs"),
        kept.alias("kept_docs"),
        (kept.cast("double") / F.col("n_docs").cast("double")).alias("keep_rate"),
    )


@query(
    "fuzzy_name_match",
    oracle="""
    WITH vars AS (
      SELECT c_custkey AS id, c_name AS key,
             unnest(list_prepend(c_name,
               list_transform(generate_series(1, length(c_name)),
                 i -> substr(c_name, 1, i-1) || substr(c_name, i+1, length(c_name))))) AS v
      FROM customer),
    sized AS (SELECT *, COUNT(*) OVER (PARTITION BY v) AS bn FROM vars),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                    a.key AS key_a, b.key AS key_b
             FROM sized a JOIN sized b ON a.v = b.v AND a.id < b.id
             WHERE a.bn <= 1000 AND b.bn <= 1000)
    SELECT id_a, id_b, CAST(levenshtein(key_a, key_b) AS BIGINT) AS distance
    FROM cand WHERE levenshtein(key_a, key_b) <= 1
    """,
    doc="Fuzzy key matching / entity resolution: SYMMETRIC-DELETION "
    "candidates (SymSpell scheme — every key plus each single-char "
    "deletion variant, pairs sharing a variant) verified by exact "
    "Levenshtein <= 1. The deletion neighborhood has EXACT recall at "
    "distance 1 (no probabilistic miss, unlike q-gram thresholds); "
    "candidates are an equi-join on the variant, never an all-pairs "
    "product, with the same hot-bucket skew guard as the LSH bands. "
    "On the customer fixture the distance-1 pairs are the names "
    "differing in one serial digit — the dirty-key join every "
    "ingest/catalog pipeline needs.",
)
def fuzzy_name_match(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    return D.fuzzy_key_pairs(c, "c_custkey", "c_name", max_distance=1)


@query(
    "repeated_spans",
    oracle=f"""
    WITH win AS (
      SELECT doc_id, unnest({D.shingles_sql("text", 20)}) AS span
      FROM documents),
    h AS (SELECT doc_id, {hash64_sql("span")} AS span_hash FROM win)
    SELECT span_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS first_doc
    FROM h GROUP BY span_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    doc="Cross-document repeated spans — the distributed analog of "
    "suffix-array exact-substring dedup (Lee et al. 2022, "
    "arXiv:2107.06499): 20-token rolling window hashes grouped "
    "corpus-wide; spans in >= 2 distinct docs are boilerplate/"
    "quotation duplication that document-level near-dup scoring "
    "misses. Only the 64-bit span hash ever shuffles (the exact-dedup "
    "digest discipline — span text stays at the scan); explode + "
    "map-side partial agg + one shuffle on the hash.",
)
def repeated_spans(spark: SparkSession, sf: str) -> DataFrame:
    return D.cross_doc_spans(t(spark, sf, "documents"), "doc_id", "text", window=20)


@query(
    "exact_substr_spans",
    bench=True,
    oracle=f"""
    WITH sh AS (SELECT doc_id, {D.shingles_sql("text", 20)} AS s FROM documents),
    win AS (SELECT doc_id, i.i - 1 AS pos, s[i.i] AS span
            FROM sh, unnest(generate_series(1, len(s))) AS i(i)),
    h AS (SELECT doc_id, pos, {hash64_sql("span")} AS wh FROM win),
    sized AS (SELECT *, COUNT(*) OVER (PARTITION BY wh) AS bn FROM h),
    hits AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
                    b.pos - a.pos AS diff
             FROM sized a JOIN sized b ON a.wh = b.wh AND a.doc_id < b.doc_id
             WHERE a.bn <= 200 AND b.bn <= 200),
    runs AS (SELECT *, pos_a - ROW_NUMBER() OVER (
                 PARTITION BY id_a, id_b, diff ORDER BY pos_a) AS rid
             FROM hits),
    sp AS (SELECT id_a, id_b, diff, rid, MIN(pos_a) AS s, MAX(pos_a) AS e
           FROM runs GROUP BY id_a, id_b, diff, rid)
    SELECT id_a, id_b, CAST(s AS BIGINT) AS start_a,
           CAST(s + diff AS BIGINT) AS start_b,
           CAST(e - s + 20 AS BIGINT) AS span_len
    FROM sp
    """,
    doc="ExactSubstr dedup at the PUBLISHED granularity (Lee et al. "
    "2022, arXiv:2107.06499): maximal duplicated token spans per doc "
    "pair, not fixed windows — repeated_spans' window hits merged by "
    "window-hash chaining (constant alignment diff + consecutive "
    "offsets = one gaps-and-islands run; a shared substring of L >= "
    "20 tokens chains into exactly one span of L tokens). The span "
    "removal step every C4/FineWeb-class recipe cites, as one "
    "equi-join on the window hash (hot-boilerplate bucket cap 200) "
    "plus one windowed chaining pass; span text never shuffles.",
)
def exact_substr_spans(spark: SparkSession, sf: str) -> DataFrame:
    return D.max_shared_spans(t(spark, sf, "documents"), "doc_id", "text", window=20)


@query(
    "exact_substr_dedup",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {D.shingles_sql("text", 20)} AS s FROM documents),
    win AS (SELECT doc_id, i.i - 1 AS pos, s[i.i] AS span
            FROM sh, unnest(generate_series(1, len(s))) AS i(i)),
    h AS (SELECT doc_id, pos, {hash64_sql("span")} AS wh FROM win),
    sized AS (SELECT *, COUNT(*) OVER (PARTITION BY wh) AS bn FROM h),
    hits AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a,
                    b.pos - a.pos AS diff
             FROM sized a JOIN sized b ON a.wh = b.wh AND a.doc_id < b.doc_id
             WHERE a.bn <= 200 AND b.bn <= 200),
    runs AS (SELECT *, pos_a - ROW_NUMBER() OVER (
                 PARTITION BY id_a, id_b, diff ORDER BY pos_a) AS rid
             FROM hits),
    sp AS (SELECT id_a, id_b, diff, rid, MIN(pos_a) AS s, MAX(pos_a) AS e
           FROM runs GROUP BY id_a, id_b, diff, rid),
    cuts AS (SELECT id_b AS doc_id, s + diff AS cs, e + diff + 20 AS ce FROM sp),
    ordd AS (SELECT *, MAX(ce) OVER (PARTITION BY doc_id ORDER BY cs, ce
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
             FROM cuts),
    isl AS (SELECT *, SUM(CASE WHEN rm IS NULL OR cs > rm THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY cs, ce
                       ROWS UNBOUNDED PRECEDING) AS g
            FROM ordd),
    mrg AS (SELECT doc_id, g, MIN(cs) AS cs, MAX(ce) AS ce
            FROM isl GROUP BY doc_id, g),
    rem AS (SELECT doc_id, SUM(ce - cs) AS n_removed FROM mrg GROUP BY doc_id),
    tok AS (SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents)
    SELECT tk.doc_id, tk.n_tokens,
           CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(tk.n_tokens - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept
    FROM tok tk LEFT JOIN rem r ON r.doc_id = tk.doc_id
    """,
    doc="ExactSubstr REMOVAL (Lee et al. 2022's actual dedup step, "
    "completing exact_substr_spans): every maximal shared span is cut "
    "from the LATER document so the earliest occurrence survives; a "
    "doc's cut ranges from all its pairs UNION-merge via the "
    "running-max gaps-and-islands pass, so overlapping spans never "
    "double-count. Per-doc shrinkage report (n_tokens / n_removed / "
    "n_kept) — what a curation pipeline thresholds before rebuilding "
    "text. Oracle replays the full chain including the interval "
    "merge, so an off-by-window cut length or a double-counted "
    "overlap moves a sum.",
)
def exact_substr_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return D.exact_substr_removal(
        t(spark, sf, "documents"), "doc_id", "text", window=20
    )


# --- generalized suffix array (prefix doubling) -------------------------------

#: suffixes as strings with a below-every-token separator: chr(1) <
#: every token character, so byte order on the joined string EQUALS
#: token-wise order with shorter-prefix-first — the oracle's
#: independent sort never sees the doubling algorithm
_SUFFIX_CTE = f"""
    toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS tk FROM documents),
    suf AS (SELECT doc_id, i.i - 1 AS pos,
              array_to_string(list_slice(tk, i.i, len(tk)), chr(1)) AS s
            FROM toks, unnest(generate_series(1, len(tk))) i(i)),
    rk AS MATERIALIZED (
      SELECT doc_id, pos, RANK() OVER (ORDER BY s) AS rank FROM suf)
"""


def _suffix_index(spark: SparkSession, sf: str) -> str:
    from hadoop_main_spark.operators.suffix import build_suffix_index

    idx = _index_dir(sf, "suffixarr", table="documents")
    if not (
        os.path.exists(f"{idx}/ranks/_SUCCESS")
        and os.path.exists(f"{idx}/classes/_SUCCESS")
    ):
        build_suffix_index(t(spark, sf, "documents"), idx)
    return idx


@query(
    "suffix_array_ranks",
    oracle=f"""
    WITH {_SUFFIX_CTE}
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(rank AS BIGINT) AS rank
    FROM rk ORDER BY doc_id, pos
    """,
    doc="Distributed GENERALIZED SUFFIX ARRAY over the corpus tokens "
    "(operators/suffix.py:suffix_ranks — Manber & Myers prefix "
    "doubling with COMPETITION-rank refinement): every (doc_id, pos) "
    "suffix gets the corpus-global RANK() of its token sequence — "
    "one initial global_rank over the 16-token prefix string "
    "(TotalOrder-style sampled split points, never an unpartitioned "
    "window), then log2(maxlen/16) doubling rounds that are each ONE "
    "(doc, pos+2^k) self-equi-join + ONE class-keyed prefix-sum "
    "window (competition ranks make sub-class ranks class-local: "
    "rank + smaller-members-in-class — no per-round global re-rank). "
    "This is the index the published ExactSubstr dedup builds (Lee "
    "et al. 2022 §4; dedup.py's window-hash chaining is the "
    "probabilistic alternative, this is the exact-order substrate). "
    "Identical cross-doc suffixes share a rank — the duplicated-"
    "document signal. The rank table persists via build_suffix_index "
    "(build-if-absent on the documents fingerprint, the "
    "knn_graph_indexed discipline; one-time build ~13s at sf0.1 for "
    "270k suffixes) and the query reads ONLY the index. The oracle "
    "is an INDEPENDENT verification, not a replay: it sorts the "
    "materialized suffix strings directly (chr(1) separator makes "
    "byte order == token-wise order), so the doubling algebra is "
    "checked against ground truth at every scale.",
)
def suffix_array_ranks(spark: SparkSession, sf: str) -> DataFrame:
    idx = _suffix_index(spark, sf)
    return spark.read.parquet(f"{idx}/ranks").orderBy("doc_id", "pos")


@query(
    "suffix_array_repeats",
    bench=True,
    oracle=f"""
    WITH {_SUFFIX_CTE},
    reps AS MATERIALIZED (SELECT rank, doc_id, pos FROM (
        SELECT rank, doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY rank ORDER BY doc_id, pos) AS rn
        FROM rk) WHERE rn = 1),
    adj AS (SELECT a.rank AS rank, a.doc_id AS doc_a, a.pos AS pos_a,
                   LEAD(a.doc_id) OVER (ORDER BY a.rank) AS doc_b,
                   LEAD(a.pos) OVER (ORDER BY a.rank) AS pos_b
            FROM reps a),
    sl AS (SELECT adj.rank, doc_a, pos_a, doc_b, pos_b,
             list_slice(ta.tk, pos_a + 1, len(ta.tk)) AS sa,
             list_slice(tb.tk, pos_b + 1, len(tb.tk)) AS sb
           FROM adj JOIN toks ta ON ta.doc_id = adj.doc_a
                    JOIN toks tb ON tb.doc_id = adj.doc_b
           WHERE doc_b IS NOT NULL),
    l AS (SELECT rank, doc_a, pos_a, doc_b, pos_b,
            -- list_position / array_position agree across engines on
            -- the not-found sentinel: both return 0
            CASE WHEN list_position(list_transform(
                   generate_series(1, least(len(sa), len(sb))),
                   i -> sa[i] = sb[i]), false) = 0
                 THEN least(len(sa), len(sb))
                 ELSE list_position(list_transform(
                   generate_series(1, least(len(sa), len(sb))),
                   i -> sa[i] = sb[i]), false) - 1 END AS lcp
          FROM sl)
    SELECT CAST(rank AS BIGINT) AS rank, CAST(lcp AS BIGINT) AS lcp,
           doc_a, CAST(pos_a AS BIGINT) AS pos_a,
           doc_b, CAST(pos_b AS BIGINT) AS pos_b
    FROM l WHERE lcp >= 5 ORDER BY rank
    """,
    doc="Adjacent-class LCP repeats over the generalized suffix array "
    "(operators/suffix.py:suffix_repeats_indexed): every maximal "
    "repeated token run of length L >= 5 surfaces as suffix-array-"
    "adjacent classes with LCP >= L — the exact-order repeat report "
    "ExactSubstr-style dedup reads off the array. Competition ranks "
    "make the successor class ``rank + class size``, so adjacency is "
    "ONE equi-join (no window, no sort); each class is represented "
    "by its minimum (doc_id, pos) suffix and the LCP compares just "
    "the two bounded token slices in one codegen zip_with expression "
    "over |classes|-1 rows — never a corpus-quadratic pass. Runs off "
    "the SAME persisted rank table as suffix_array_ranks (build-if-"
    "absent, one build serves both). Oracle recomputes ranks by "
    "direct suffix-string sort, adjacency by LEAD, and the LCP by "
    "first-mismatch position (list_position/array_position both "
    "return 0 on not-found, the pinned cross-engine sentinel).",
)
def suffix_array_repeats(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.suffix import suffix_repeats_indexed

    idx = _suffix_index(spark, sf)
    return suffix_repeats_indexed(
        spark, idx, t(spark, sf, "documents"), min_lcp=5
    ).orderBy("rank")


@query(
    "domain_mix_apply",
    oracle=f"""
    WITH {_MIX_SRC_CTE},
    budget AS (
      SELECT source, n_docs,
             least(n_docs, (weight * n_total) // w_total) AS kept_target
      FROM src CROSS JOIN tot),
    ranked AS (
      SELECT d.doc_id, d.source, b.n_docs, b.kept_target,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY {hash64_sql('d.doc_id', 'mix')},
                        d.doc_id) AS rn
      FROM documents d JOIN budget b USING (source))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS sampled_docs,
           MAX(kept_target) AS kept_target,
           MAX(n_docs) AS n_docs,
           MIN(doc_id) AS min_sampled_doc
    FROM ranked WHERE rn <= kept_target
    GROUP BY source
    """,
    doc="Applies domain_mix_weights' budgets as a DETERMINISTIC "
    "sample: rank each source's documents by a salted hash of doc_id "
    "(a reproducible shuffle), keep exactly the first kept_target per "
    "source — the sampled set is EXACTLY the target size, stable "
    "across runs and partitionings, and recomputable by anyone with "
    "the doc ids (the train_split_assign discipline applied to "
    "mixture resampling). One join against the tiny per-source budget "
    "table + one per-source window; at 100 TB the window partitions "
    "by source, so parallelism == number of domains — for few huge "
    "domains switch to the grouped_prefix_sum two-phase rank, same "
    "contract.",
)
def domain_mix_apply(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    budget = _domain_budgets(d).select(
        "source",
        "n_docs",
        F.least(F.col("n_docs"), F.expr("(weight * n_total) div w_total")).alias(
            "kept_target"
        ),
    )
    w = Window.partitionBy("source").orderBy(
        hash64("doc_id", "mix"), F.col("doc_id")
    )
    ranked = (
        d.select("doc_id", "source")
        .join(F.broadcast(budget), "source")
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.filter(F.col("rn") <= F.col("kept_target"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("sampled_docs"),
            F.max("kept_target").alias("kept_target"),
            F.max("n_docs").alias("n_docs"),
            F.min("doc_id").alias("min_sampled_doc"),
        )
    )


def _decon_bloom_oracle() -> str:
    from hadoop_main_spark.functions.sketches import BLOOM_K, BLOOM_M

    bits = "\n      UNION ALL\n      ".join(
        f"SELECT DISTINCT {j} AS j, {hash64_sql('gh', f'bloom{j}')} % {BLOOM_M} AS bit FROM bg"
        for j in range(BLOOM_K)
    )
    pos = "\n      UNION ALL\n      ".join(
        f"SELECT gh, {j} AS j, {hash64_sql('gh', f'bloom{j}')} % {BLOOM_M} AS bit FROM tgd"
        for j in range(BLOOM_K)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
         g5 AS (SELECT DISTINCT doc_id,
                       unnest(list_transform(
                         generate_series(1, greatest(len(tk) - 4, 0)),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                              || ' ' || tk[i+3] || ' ' || tk[i+4])) AS g
                FROM toks),
         gh5 AS (SELECT doc_id, {hash64_sql('g')} AS gh FROM g5),
         bg AS (SELECT DISTINCT gh FROM gh5 WHERE doc_id % 97 = 0),
         tg AS (SELECT doc_id, gh FROM gh5 WHERE doc_id % 97 <> 0),
         tgd AS (SELECT DISTINCT gh FROM tg),
         bits AS (
           {bits}
         ),
         pos AS (
           {pos}
         ),
         maybe AS (
           SELECT gh FROM (
             SELECT u.gh, COUNT(*) AS h FROM (
               SELECT DISTINCT pos.gh, pos.j FROM pos JOIN bits USING (j, bit)) u
             GROUP BY u.gh)
           WHERE h = {BLOOM_K}),
         bloom_docs AS (SELECT DISTINCT tg.doc_id FROM tg JOIN maybe USING (gh)),
         exact_docs AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gh))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COUNT(CASE WHEN e.doc_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_exact,
           CAST(COUNT(CASE WHEN bl.doc_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_bloom,
           CAST(COUNT(CASE WHEN bl.doc_id IS NOT NULL AND e.doc_id IS NULL THEN 1 END) AS BIGINT) AS n_false_positive,
           CAST(COUNT(CASE WHEN e.doc_id IS NOT NULL AND bl.doc_id IS NULL THEN 1 END) AS BIGINT) AS n_false_negative
    FROM documents d
    LEFT JOIN exact_docs e ON e.doc_id = d.doc_id
    LEFT JOIN bloom_docs bl ON bl.doc_id = d.doc_id
    WHERE d.doc_id % 97 <> 0
    """


@query(
    "decontaminate_bloom",
    oracle=_decon_bloom_oracle(),
    doc="Decontamination at UNBROADCASTABLE eval-set scale: the eval "
    "5-gram hashes compress into a Bloom sketch (bounded at k*m rows "
    "no matter how many grams — the state that still broadcasts when "
    "the exact gram set no longer does), training grams probe it, and "
    "a doc is flagged if ANY gram is bloom-maybe. The verdict row "
    "compares against the exact-join flags: ZERO false negatives "
    "(guaranteed — nothing contaminated slips through) and a counted "
    "false-positive overhang (the price of bounded state; rescrub "
    "flagged docs exactly if it matters). Companion to decontaminate "
    "(exact broadcast path) and bloom_membership (the sketch's own "
    "verdict oracle).",
)
def decontaminate_bloom(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.functions.sketches import bloom_bits, bloom_probe

    d = t(spark, sf, "documents")
    g5 = d.select(
        "doc_id",
        F.explode(F.array_distinct(D.word_shingles("text", 5))).alias("g"),
    ).select("doc_id", hash64("g").alias("gh"))
    # materialize the hashed-gram table ONCE per action (lazy local
    # checkpoint, 2 ints/row): the shingle-explode+md5 subtree feeds
    # FOUR consumers (sketch build, probe, exact-verify join, doc
    # join) and the final plan otherwise re-evaluates it per consumer
    # (optimization r11: 13 Generate nodes in the executed plan,
    # 4.4 s -> 2.2 s at sf0.1). One materialization ~= one shuffle of
    # the same rows — the standard price of sharing an intermediate.
    g5 = g5.localCheckpoint(eager=False)
    bench = g5.filter(F.col("doc_id") % 97 == 0).select("gh").distinct()
    train = g5.filter(F.col("doc_id") % 97 != 0)
    bits = bloom_bits(bench, "gh")
    verdict = bloom_probe(bits, train.select("gh").distinct(), "gh")
    # exact verify runs ONLY on bloom-maybe grams (no-false-negative
    # property: exact grams are a subset of maybe grams) — the dominant
    # train-side shingle subtree is evaluated twice (probe + doc join),
    # not three times, and the exact join touches the small maybe set.
    # The ORACLE computes exact containment from the FULL independent
    # join, so a bloom false negative would surface as a value mismatch.
    # no broadcast() hints here: the query's premise is an eval set too
    # big to broadcast, and a saturated sketch can make the maybe set
    # as large as the train grams — AQE picks the strategy per scale
    gram_flags = (
        verdict.filter("bloom_maybe")
        .join(bench.withColumn("__in_bench", F.lit(True)), "gh", "left")
        .select("gh", F.coalesce("__in_bench", F.lit(False)).alias("is_exact"))
    )
    doc_flags = (
        train.join(gram_flags, "gh")
        .groupBy("doc_id")
        .agg(F.max("is_exact").alias("__ex"))
        .withColumn("__bl", F.lit(True))
    )
    base = (
        d.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id")
        .join(doc_flags, "doc_id", "left")
    )
    return base.agg(
        F.count("*").cast("bigint").alias("n_train"),
        F.count(F.when(F.col("__ex"), 1)).cast("bigint").alias("n_exact"),
        F.count(F.when(F.col("__bl"), 1)).cast("bigint").alias("n_bloom"),
        F.count(F.when(F.col("__bl") & ~F.col("__ex"), 1))
        .cast("bigint")
        .alias("n_false_positive"),
        F.count(F.when(F.col("__ex") & F.col("__bl").isNull(), 1))
        .cast("bigint")
        .alias("n_false_negative"),
    )


@query(
    "semantic_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SEM_CAND_CTE},
    pairs AS (
      SELECT id_a, id_b FROM {_SEM_SCORED}
      WHERE cosine >= 0.95 AND NOT isnan(cosine)),
    und AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
    comp AS (SELECT a AS vec_id, MIN(b) AS canonical_id FROM reach GROUP BY a)
    SELECT vec_id, canonical_id,
           CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT) AS cluster_size
    FROM comp
    """,
    doc="Semantic duplicate CLUSTERS: SemDeDup within-cluster pairs "
    "resolved into connected components (pointer-jumping min-label "
    "propagation, O(log diameter) shuffles) with the canonical (min) "
    "vec_id per cluster and the cluster size — the keep-one decision "
    "the pair list feeds. Pair semantics come from the SAME shared "
    "fragment/builder as semantic_dedup, so the clusters view can "
    "never disagree with the pairs view it resolves. Same iterative "
    "operator dedup_clusters verifies for MinHash pairs, here "
    "verified against a recursive CTE over the semantic pair set.",
)
def semantic_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.operators.dedup import connected_components

    pairs = _semantic_pairs(spark, sf).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").alias("vec_id"), F.col("component").alias("canonical_id")
    )
    return comp.select(
        "vec_id",
        "canonical_id",
        F.count("*")
        .over(Window.partitionBy("canonical_id"))
        .cast("bigint")
        .alias("cluster_size"),
    )


def _incremental_oracle() -> str:
    bands_side = lambda side, pred: (
        "\n      UNION ALL\n      ".join(
            f"SELECT doc_id, {b} AS band, {_band_sig_sql(b)} AS band_sig FROM sig WHERE {pred}"
            for b in range(B)
        )
    )
    return (
        "WITH"
        + _SHINGLE_CTE
        + ","
        + _SIG_CTE
        + f""",
    bn AS (
      {bands_side('new', 'doc_id % 10 = 0')}
    ),
    bc AS (
      {bands_side('cor', 'doc_id % 10 <> 0')}
    ),
    sn AS (SELECT *, COUNT(*) OVER (PARTITION BY band, band_sig) AS bucket_n FROM bn),
    sc AS (SELECT *, COUNT(*) OVER (PARTITION BY band, band_sig) AS bucket_n FROM bc),
    cand AS (
      SELECT DISTINCT n.doc_id AS id_new, c.doc_id AS id_corpus
      FROM sn n JOIN sc c ON n.band = c.band AND n.band_sig = c.band_sig
      WHERE n.bucket_n <= 1000 AND c.bucket_n <= 1000)
    SELECT id_new, id_corpus,
           CAST(({_AGREE}) AS DOUBLE) / {float(J)} AS est_jaccard
    FROM cand JOIN sig a ON a.doc_id = id_new JOIN sig b ON b.doc_id = id_corpus
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5
    """
    )


@query(
    "incremental_dedup",
    oracle=_incremental_oracle(),
    doc="INCREMENTAL ingest dedup: the arriving batch (doc_id % 10 == "
    "0 plays the new snapshot) signature-joins against the persisted "
    "corpus signatures — the corpus is NEVER re-shingled (its "
    "signatures were materialized at ingest; "
    "materialize_minhash_signatures is the write side), so per-batch "
    "cost is the batch's own signature pass plus one banded equi-join "
    "with per-side hot-bucket guards. Emits every (new, corpus) "
    "near-dup pair so the caller chooses drop-new vs supersede-old. "
    "The production companion to dedup_minhash_lsh's full-corpus "
    "self-join.",
)
def incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    sig_new = D.minhash_signature(new, "doc_id", "text")
    sig_cor = D.minhash_signature(corpus, "doc_id", "text")
    return D.lsh_pairs_across(sig_new, sig_cor, "doc_id", min_est_jaccard=0.5)


@query(
    "dup_ngram_fraction",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest({D.shingles_sql("text", 5)}) AS g FROM documents),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_ngrams, COUNT(DISTINCT g) AS n_distinct
      FROM sh GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(n_ngrams, 0) AS n_ngrams,
           coalesce(n_distinct, 0) AS n_distinct,
           CASE WHEN coalesce(n_ngrams, 0) > 0
                THEN CAST(n_ngrams - n_distinct AS DOUBLE) / n_ngrams
                ELSE 0.0 END AS dup_frac
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc="WITHIN-document repeated-5-gram fraction (the Gopher "
    "repetition signals, Rae et al. 2021 arXiv:2112.11446 §A1.1: "
    "high duplicate-n-gram fraction marks boilerplate/spam). One "
    "shingle explode + per-doc COUNT vs COUNT DISTINCT — partial "
    "aggregation on (doc_id) keeps the shuffle at one row per doc; "
    "the fraction is a single exact-int division (bit-portable). "
    "Docs shorter than 5 tokens score 0.0 (no n-grams, explode_outer "
    "keeps the row).",
)
def dup_ngram_fraction(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    sh = d.select("doc_id", F.explode_outer(D.word_shingles("text", 5)).alias("g"))
    per = sh.groupBy("doc_id").agg(
        F.count("g").alias("n_ngrams"),
        F.count_distinct("g").alias("n_distinct"),
    )
    return per.select(
        "doc_id",
        "n_ngrams",
        "n_distinct",
        F.when(
            F.col("n_ngrams") > 0,
            (F.col("n_ngrams") - F.col("n_distinct")).cast("double")
            / F.col("n_ngrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


@query(
    "inverted_index",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pos AS (
      SELECT doc_id, unnest(tk) AS term,
             unnest(generate_series(1, len(tk))) - 1 AS pos
      FROM toks)
    SELECT term, doc_id, COUNT(*) AS tf, MIN(pos) AS first_pos
    FROM pos GROUP BY term, doc_id
    """,
    doc="Inverted-index build (the classic second MapReduce example "
    "after WordCount: term -> postings with in-document positions): "
    "posexplode keeps token offsets, one partial-agg groupBy emits "
    "(term, doc_id, tf, first_pos). At 100 TB this is the shape a "
    "search/index bulk build uses — the shuffle key is (term, doc) "
    "so no single term funnels a task, and writing "
    "partitionBy(prefix) gives the lexicon layout.",
)
def inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    pos = d.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "term")
    )
    return pos.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.min("pos").cast("bigint").alias("first_pos"),
    )


@query(
    "pmi_topk",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    w AS (SELECT unnest(tk) AS w FROM toks),
    uni AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
    n AS (SELECT COUNT(*) AS n_tot FROM w),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> tk[i] || ' ' || tk[i+1])) AS bigram
           FROM toks),
    p AS (SELECT bigram, COUNT(*) AS cxy FROM bg
          GROUP BY bigram HAVING COUNT(*) >= 5)
    SELECT bigram, cxy,
           CAST(cxy * n_tot AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS pmi_ratio
    FROM p CROSS JOIN n
    JOIN uni u1 ON u1.w = split_part(bigram, ' ', 1)
    JOIN uni u2 ON u2.w = split_part(bigram, ' ', 2)
    ORDER BY pmi_ratio DESC, bigram LIMIT 20
    """,
    doc="Collocation strength via a PMI RATIO — p(x,y)/(p(x)p(y)) = "
    "cxy*N/(cx*cy) — kept as one division of exact BIGINT products "
    "(< 2^53, so the double is engine-identical; no log needed for "
    "RANKING since log is monotone — the token_rarity libm-free "
    "discipline). Unigram and bigram counts partial-aggregate from "
    "the same token stream; the two unigram joins key on the term "
    "WITHOUT a broadcast hint (vocabulary-sized build side — the "
    "tfidf_top_terms lesson); only the one-row total broadcasts. "
    "min-count 5 is the standard collocation support cut.",
)
def pmi_topk(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("w"))
    # LAZY checkpoint of the vocabulary table: it feeds BOTH unigram
    # joins (w1 and w2) plus the corpus total, and the branches get
    # different pushed filters so ReusedExchange never dedupes the
    # tokenize+explode derivation (4 corpus scans measured). The
    # total is the exact sum of unigram counts, read from the same
    # checkpointed blocks: 4 token explosions -> 1 (+ the bigram one).
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint

    uni = supersede_checkpoint(
        "pmi_topk.uni",
        toks.groupBy("w").agg(F.count("*").alias("c")).localCheckpoint(eager=False),
    )
    n_tot = uni.agg(F.sum("c").alias("__n"))
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram"))
    pairs = (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("cxy"))
        .filter(F.col("cxy") >= 5)
        .withColumn("__w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("__w2", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
    )
    joined = (
        pairs.join(uni.select(F.col("w").alias("__w1"), F.col("c").alias("__c1")), "__w1")
        .join(uni.select(F.col("w").alias("__w2"), F.col("c").alias("__c2")), "__w2")
        .crossJoin(F.broadcast(n_tot))
    )
    return (
        joined.select(
            "bigram",
            "cxy",
            (
                (F.col("cxy") * F.col("__n")).cast("double")
                / (F.col("__c1") * F.col("__c2")).cast("double")
            ).alias("pmi_ratio"),
        )
        .orderBy(F.desc("pmi_ratio"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "triangle_count",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> [tk[i], tk[i+1]])) AS pr
           FROM toks),
    e AS (SELECT DISTINCT least(pr[1], pr[2]) AS a, greatest(pr[1], pr[2]) AS b
          FROM bg WHERE pr[1] <> pr[2])
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    """,
    doc="Triangle counting over the token co-occurrence graph (nodes "
    "= tokens, edges = distinct adjacent pairs) — the canonical "
    "chained-MapReduce graph benchmark as ONE plan. The operator "
    "orients edges by (degree, node) before the wedge join "
    "(operators/graph.py:triangle_count) so per-node oriented "
    "out-degree stays O(sqrt(m)) even on hub tokens — the id-ordered "
    "form the ORACLE uses is count-equivalent but would wedge-explode "
    "quadratically on a hub at scale; the count is orientation-"
    "independent, which is exactly why the cheap oracle can verify "
    "the scalable plan.",
)
def triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.graph import canonical_edges, triangle_count as tc

    d = t(spark, sf, "documents")
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram")).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    # LAZY checkpoint of the (vocabulary-bounded) edge list: the
    # triangle plan consumes it from 5 join branches with DIFFERENT
    # pushed filters, so ReusedExchange can never dedupe the
    # scan+explode+distinct derivation (11 corpus scans measured).
    # eager=False keeps build() side-effect free — the edges
    # materialize once at first action and every branch reads the
    # checkpointed blocks.
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint

    return tc(
        supersede_checkpoint(
            "triangle_count.edges",
            canonical_edges(bg, "w1", "w2").localCheckpoint(eager=False),
        )
    )


_PR_SCALE = 10**12
_PR_BASE = 15 * _PR_SCALE // 100


@query(
    "pagerank_top20",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> [tk[i], tk[i+1]])) AS pr
           FROM toks),
    e AS (SELECT DISTINCT pr[1] AS src, pr[2] AS dst FROM bg WHERE pr[1] <> pr[2]),
    nodes AS (SELECT DISTINCT unnest(tk) AS v FROM toks),
    n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT v, {_PR_SCALE} // n_nodes AS r FROM nodes CROSS JOIN n),
    c1 AS (SELECT dst AS v, SUM(r0.r // deg.d) AS s
           FROM e JOIN deg USING (src) JOIN r0 ON r0.v = e.src GROUP BY dst),
    r1 AS (SELECT nodes.v,
                  {_PR_BASE} // n_nodes + (85 * coalesce(s, 0)) // 100 AS r
           FROM nodes LEFT JOIN c1 USING (v) CROSS JOIN n),
    c2 AS (SELECT dst AS v, SUM(r1.r // deg.d) AS s
           FROM e JOIN deg USING (src) JOIN r1 ON r1.v = e.src GROUP BY dst),
    r2 AS (SELECT nodes.v,
                  {_PR_BASE} // n_nodes + (85 * coalesce(s, 0)) // 100 AS r
           FROM nodes LEFT JOIN c2 USING (v) CROSS JOIN n)
    SELECT v AS token, CAST(r AS BIGINT) AS rank
    FROM r2 ORDER BY r DESC, v LIMIT 20
    """,
    doc="PageRank (2 iterations, damping 0.85) over the DIRECTED "
    "token-adjacency graph — the second canonical chained-MapReduce "
    "graph benchmark. Ranks are BIGINT micro-units with every step an "
    "integer division (operators/graph.py:pagerank_int), so iterated "
    "values are bit-identical across engines (the kmeans micro-grid "
    "discipline — float PageRank drifts by ulps per iteration and "
    "flips top-k order). Each iteration = one src-keyed join + one "
    "dst-keyed partial-agg shuffle; the node total rides as a one-row "
    "broadcast, nothing collects to the driver.",
)
def pagerank_top20(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.graph import pagerank_int
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram")).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("src"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("dst"),
    )
    # lazy-checkpointed like triangle_count's edges: the iteration
    # joins consume edges/nodes from many branches with differing
    # pushdowns (10 corpus scans measured without it); both tables
    # are vocabulary-bounded
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint

    edges = supersede_checkpoint(
        "pagerank_top20.edges",
        bg.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=False),
    )
    nodes = supersede_checkpoint(
        "pagerank_top20.nodes",
        d.select(F.explode(tokenize("text")).alias("v")).distinct().localCheckpoint(eager=False),
    )
    ranked = pagerank_int(edges, nodes, iterations=2, scale=_PR_SCALE)
    return (
        ranked.select(F.col("v").alias("token"), F.col("rank").cast("bigint").alias("rank"))
        .orderBy(F.desc("rank"), F.asc("token"))
        .limit(20)
    )


@query(
    "graph_shortest_paths",
    oracle=f"""
    WITH RECURSIVE toks AS (SELECT {_TOKS} AS tk FROM documents),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> [tk[i], tk[i+1]])) AS pr
           FROM toks),
    e AS (SELECT DISTINCT pr[1] AS src, pr[2] AS dst FROM bg WHERE pr[1] <> pr[2]),
    lms AS (SELECT src AS lm FROM (SELECT DISTINCT src FROM e)
            ORDER BY src LIMIT 3),
    reach(lm, v, d) AS (
      SELECT lm, lm, 0 FROM lms
      UNION
      SELECT r.lm, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.v
      WHERE r.d < 6
    )
    SELECT lm, v AS token, CAST(MIN(d) AS BIGINT) AS dist
    FROM reach GROUP BY lm, v
    """,
    doc="Multi-source BFS shortest paths (operators/graph.py:"
    "bfs_distances — the other classic chained-MapReduce graph "
    "benchmark beside pagerank_top20; GraphFrames' shortestPaths "
    "landmarks): hop distances from the 3 lexicographically-smallest "
    "source tokens over the SAME directed token-adjacency graph "
    "PageRank uses, bounded at 6 hops. Each round is ONE "
    "frontier-keyed equi-join + one (landmark, node) min partial-agg "
    "with per-round lineage flattening — the textbook distributed "
    "BFS step. The oracle is a depth-bounded recursive CTE closure "
    "with MIN over arrival depths, which equals BFS by definition.",
)
def graph_shortest_paths(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint
    from hadoop_main_spark.operators.graph import bfs_distances

    d = t(spark, sf, "documents")
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram")).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("src"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("dst"),
    )
    edges = supersede_checkpoint(
        "graph_shortest_paths.edges",
        bg.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=False),
    )
    lms = edges.select("src").distinct().orderBy("src").limit(3).select(
        F.col("src").alias("lm")
    )
    out = bfs_distances(edges, lms, max_hops=6)
    return out.select("lm", F.col("v").alias("token"), F.col("dist").cast("bigint").alias("dist"))


@query(
    "bpe_pair_counts",
    oracle=r"""
    WITH w AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    ),
    p AS (
      SELECT substr(w.word, CAST(i AS INTEGER), 1) AS left_sym,
             substr(w.word, CAST(i AS INTEGER) + 1, 1) AS right_sym, w.freq
      FROM w, LATERAL (SELECT unnest(generate_series(1, length(w.word) - 1)) AS i) t
    )
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS cnt
    FROM p GROUP BY left_sym, right_sym
    ORDER BY cnt DESC, left_sym, right_sym LIMIT 20
    """,
    doc="BPE tokenizer-training statistic (Sennrich et al., "
    "arXiv:1508.07909): adjacent-character pair counts weighted by "
    "word frequency over the whitespace-pretokenized vocabulary — the "
    "exact inner aggregation of every BPE merge iteration "
    "(operators/bpe.py:pair_counts; the full iterative trainer "
    "bpe_train is pinned merge-for-merge against an independent "
    "pure-Python reference in pytest). The corpus collapses once to "
    "the (word, freq) table, so pair counting shuffles vocabulary- "
    "not corpus-sized rows with map-side partial agg; top-20 is a "
    "1-task TakeOrderedAndProject under the (cnt desc, left, right) "
    "total order (deterministic at the LIMIT boundary).",
)
def bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators import bpe as B

    vocab = B.word_vocab(t(spark, sf, "documents")).select(
        B.chars_col("word").alias("toks"), "freq"
    )
    return (
        B.pair_counts(vocab)
        .select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "left_sym", "right_sym")
        .limit(20)
    )


# Hand-pinned BPE merge list for the encode gate (the robots_url_filter
# pattern: the oracle carries the same literals, so the APPLY machinery
# is what is under test — bpe_train's own merge choice is pinned
# merge-for-merge against a pure-Python reference in pytest). Chosen
# from the corpus's real top pair statistics, with a two-level chain
# (t+h, then th+e) so replay ORDER is exercised.
_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("s", "t"),
    ("o", "r"),
    ("o", "w"),
    ("a", "n"),
]


def _bpe_encode_oracle() -> str:
    """DuckDB SQL replaying _BPE_MERGES over every corpus word.

    Representation: token sequence t1..tn as '\\x1f't1'\\x1f''\\x1f't2...
    (each token wrapped in chr(31) on BOTH sides), so one merge is ONE
    non-overlapping left-to-right replace() of '\\x1fL\\x1f\\x1fR\\x1f'
    with '\\x1fLR\\x1f' — token boundaries cannot false-match inside a
    longer token, and consecutive merge sites don't share delimiter
    characters. A single replace() pass equals BPE's one greedy pass,
    which is exhaustive for one merge (the fused token differs from
    both halves, so no new site of the SAME pair can appear).
    """
    d = "chr(31)"
    expr = f"regexp_replace(word, '(.)', {d} || '\\1' || {d}, 'g')"
    for l_, r_ in _BPE_MERGES:
        pat = f"{d} || '{l_}' || {d} || {d} || '{r_}' || {d}"
        rep = f"{d} || '{l_}{r_}' || {d}"
        expr = f"replace({expr}, {pat}, {rep})"
    return rf"""
    WITH w AS (
      SELECT word FROM (
        SELECT unnest(regexp_split_to_array(text, '\s+')) AS word FROM documents
      ) WHERE word <> ''
    ),
    enc AS (SELECT {expr} AS s FROM w),
    toks AS (
      SELECT unnest(string_split(trim(s, chr(31)), chr(31) || chr(31))) AS token
      FROM enc
    )
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks GROUP BY token
    ORDER BY cnt DESC, token LIMIT 50
    """


@query(
    "bpe_encode_stats",
    oracle=_bpe_encode_oracle(),
    doc="BPE tokenizer APPLY over the corpus (operators/bpe.py:"
    "bpe_apply — the encode pass a training pipeline runs after "
    "bpe_train): every document word is encoded by replaying the "
    "pinned 8-merge list in order (greedy left-to-right per merge, "
    "the Sennrich/GPT-2 apply contract; includes the two-level "
    "t+h -> th+e chain so replay ORDER is verified), Arrow-batched "
    "with a per-worker distinct-word memo; output is the resulting "
    "token distribution's top-50 under the (cnt desc, token) total "
    "order. The oracle replays the SAME merges in pure SQL via "
    "delimiter-wrapped non-overlapping replace() — so the greedy "
    "merge semantics themselves are cross-verified on every word of "
    "the corpus. Merge-list literals are hand-pinned (the "
    "robots_url_filter pattern); the trainer's merge CHOICE is "
    "separately pinned merge-for-merge against a pure-Python "
    "reference in pytest.",
)
def bpe_encode_stats(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators import bpe as B

    docs = t(spark, sf, "documents")
    enc = B.bpe_apply(docs, [(l_, r_, 0) for l_, r_ in _BPE_MERGES])
    return (
        enc.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(50)
    )


@query(
    "train_shuffle_order",
    oracle=f"""
    SELECT doc_id,
           ROW_NUMBER() OVER (
             ORDER BY {hash64_sql('doc_id', 'shuffle')}, doc_id) AS shuffle_pos
    FROM documents
    """,
    doc="Deterministic global training-data shuffle: every document "
    "gets a reproducible epoch position = its global rank under "
    "(hash64(doc_id, 'shuffle'), doc_id) — the standard "
    "hash-then-sort shuffle that makes epoch order independent of "
    "file layout and partition count. The rank is the scalable "
    "TotalOrderPartitioner path (operators/sorting.py:global_rank — "
    "literal split points + bucket-local row_number + tiny offset "
    "broadcast), NEVER a single-task global window; the oracle is the "
    "one-task ROW_NUMBER the small engine can afford.",
)
def train_shuffle_order(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.operators.sorting import global_rank

    d = t(spark, sf, "documents").select(
        "doc_id", hash64("doc_id", "shuffle").alias("__h")
    )
    ranked = global_rank(d, "__h", "doc_id", rank_col="shuffle_pos")
    return ranked.select("doc_id", F.col("shuffle_pos").cast("bigint").alias("shuffle_pos"))


@query(
    "bigram_lm_topk",
    oracle="""
    WITH bg AS (
      SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
             COUNT(*) AS c12
      FROM (
        SELECT w[i] || ' ' || w[i+1] AS b FROM (
          SELECT list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
          FROM documents) d,
        LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t)
      GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM bg GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1b FROM bg GROUP BY w2),
    tot AS (SELECT COUNT(*) AS ttypes FROM bg)
    SELECT w1, w2, c12,
           (CAST(c12 AS DOUBLE) - CAST(0.75 AS DOUBLE)) / CAST(c1 AS DOUBLE)
           + ((CAST(0.75 AS DOUBLE) * CAST(n1f AS DOUBLE)) / CAST(c1 AS DOUBLE))
             * (CAST(n1b AS DOUBLE) / CAST(ttypes AS DOUBLE)) AS p
    FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot
    ORDER BY p DESC, w1, w2 LIMIT 20
    """,
    doc="Count-based bigram language model with interpolated absolute "
    "discounting (the Kneser-Ney family: discounted bigram ML "
    "probability backed off to the CONTINUATION unigram — how many "
    "distinct contexts each word follows): P(w2|w1) = (c12 - d)/c1 + "
    "d*N1+(w1,.)/c1 * N1+(.,w2)/T with d = 0.75. Every input count "
    "is an exact BIGINT aggregate and the float expression is the "
    "IDENTICAL operation tree in both engines (0.75 is binary-exact), "
    "so probabilities are bit-equal. Scale shape: one bigram "
    "explosion (partial agg), three derived vocabulary-sized "
    "aggregates joined UNHINTED on their keys (the tfidf discipline), "
    "the 1-row type total broadcast; top-20 is a "
    "TakeOrderedAndProject.",
)
def bigram_lm_topk(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    # the explicit isNotNull filters make every consumer's view of
    # this subtree canonical-identical (a join would otherwise push
    # isnotnull(w1) into SOME branches only, breaking ReusedExchange
    # — the NOTES trap), so the expensive scan+explode+partial-agg
    # runs ONCE and ctx/cont/tot re-aggregate from the reused shuffle
    bg = (
        d.select(F.explode(D.word_shingles("text", 2)).alias("b"))
        .select(
            F.split_part(F.col("b"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("b"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    # context/continuation statistics as WINDOWS over the aggregated
    # bigram table, not three derived-aggregate self-joins: Catalyst
    # prunes each join branch's aggregate differently (cont's keeps
    # functions=[]), so canonical equality — and ReusedExchange — is
    # unrecoverable in the join form and every branch re-scans and
    # re-explodes the corpus (measured 61.6s at 50k docs). Windows
    # partition by w1/w2 over vocabulary-bounded groups of the
    # ALREADY-AGGREGATED table; only the 1-row type total remains a
    # second (unavoidable) branch: 4 corpus scans -> 2.
    from pyspark.sql import Window

    w1win = Window.partitionBy("w1")
    w2win = Window.partitionBy("w2")
    scored = bg.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(w1win).alias("c1"),
        F.count("*").over(w1win).alias("n1f"),
        F.count("*").over(w2win).alias("n1b"),
    )
    # the trivially-true c12 > 0 guard stops column pruning from
    # collapsing this branch's aggregate to functions=[] (which made
    # its exchange canonically different from scored's and re-ran the
    # corpus explode — the bigram_surprise guard, applied here too;
    # optimization r11: 2 corpus explodes -> 1, ReusedExchange fires)
    tot = bg.where(F.col("c12") > 0).agg(F.count("*").alias("ttypes"))
    dd = F.lit(0.75)
    p = (F.col("c12").cast("double") - dd) / F.col("c1").cast("double") + (
        (dd * F.col("n1f").cast("double")) / F.col("c1").cast("double")
    ) * (F.col("n1b").cast("double") / F.col("ttypes").cast("double"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", p.alias("p"))
        .orderBy(F.desc("p"), "w1", "w2")
        .limit(20)
    )


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
    cnt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY term),
    rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS r FROM cnt),
    ag AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                  CAST(COUNT(*) AS BIGINT) AS n_types,
                  CAST(SUM(CASE WHEN r <= 10 THEN c ELSE 0 END) AS BIGINT) AS k10,
                  CAST(SUM(CASE WHEN r <= 25 THEN c ELSE 0 END) AS BIGINT) AS k25,
                  CAST(SUM(CASE WHEN r <= 100 THEN c ELSE 0 END) AS BIGINT) AS k100,
                  CAST(SUM(CASE WHEN r <= 20000 THEN c ELSE 0 END) AS BIGINT) AS k20000
           FROM rk)
    SELECT k, covered_tokens, total_tokens, n_types,
           CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS coverage
    FROM (
      SELECT 10 AS k, k10 AS covered_tokens, total AS total_tokens, n_types FROM ag
      UNION ALL SELECT 25, k25, total, n_types FROM ag
      UNION ALL SELECT 100, k100, total, n_types FROM ag
      UNION ALL SELECT 20000, k20000, total, n_types FROM ag)
    ORDER BY k
    """,
    doc="Top-k vocabulary coverage — the tokenizer-design statistic "
    "(what fraction of corpus TOKENS do the k most frequent TYPES "
    "cover, k in {10, 25, 100, 20k}): term counts (one token "
    "explosion, partial agg), an exact global rank of the "
    "vocabulary-bounded count table via the TotalOrderPartitioner "
    "machinery (global_rank — never an unpartitioned window, which "
    "would funnel the whole vocabulary through ONE task), then ONE "
    "aggregation pass computes the total and every k-threshold "
    "conditional sum together; the 4-row long format is exploded "
    "from that single row. Coverage is an exact-BIGINT ratio cast "
    "to double — bit-identical across engines.",
)
def vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.sorting import global_rank
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    tok = fan_out(d.select("doc_id", "text"), ["doc_id"]).select(
        F.explode(tokenize("text")).alias("term")
    )
    cnt = tok.groupBy("term").agg(F.count("*").alias("c"))
    ranked = global_rank(cnt, F.desc("c"), F.asc("term"), rank_col="r")
    ks = [10, 25, 100, 20000]
    ag = ranked.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_types"),
        *[
            F.sum(F.when(F.col("r") <= k, F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"k{k}")
            for k in ks
        ],
    )
    rows = ag.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"), F.col(f"k{k}").alias("covered_tokens")
                    )
                    for k in ks
                ]
            )
        ).alias("kv"),
        F.col("total").alias("total_tokens"),
        "n_types",
    )
    return rows.select(
        F.col("kv.k").alias("k"),
        F.col("kv.covered_tokens").alias("covered_tokens"),
        "total_tokens",
        "n_types",
        (
            F.col("kv.covered_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("coverage"),
    ).orderBy("k")


@query(
    "jaccard_prefix_join",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
           FROM toks),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS i
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE 3 * i >= 1 * (sa.sz + sb.sz)
    ORDER BY id_a, id_b
    """,
    doc="EXACT-threshold Jaccard similarity join (prefix filtering, "
    "AllPairs/PPJoin family — operators/dedup.py:prefix_jaccard_pairs)"
    " at t = 1/2 over distinct word 3-grams. The oracle is a "
    "BRUTE-FORCE all-pairs join, so a green row PROVES the "
    "no-false-negatives contract that separates this from the "
    "MinHash-LSH candidates (which trade recall for scale). Scale "
    "shape: candidates join only on each doc's rarest-token prefix "
    "(length s - ceil(t*s) + 1 under the global document-frequency "
    "order), every prune is integer arithmetic, and the final "
    "jaccard is one division of exact BIGINTs.",
)
def jaccard_prefix_join(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return (
        D.prefix_jaccard_pairs(d, "doc_id", "text", n=3, t_num=1, t_den=2)
        .orderBy("id_a", "id_b")
    )


@query(
    "edit_distance_join",
    oracle="""
    WITH s AS (SELECT doc_id AS id, substring(text, 1, 40) AS s
               FROM documents WHERE length(substring(text, 1, 40)) >= 3),
    grams AS (SELECT id, p.p AS pos, substring(s, p.p, 3) AS g
              FROM s, LATERAL (SELECT unnest(generate_series(1, length(s) - 2)) AS p) p),
    df AS (SELECT g, COUNT(DISTINCT id) AS df FROM grams GROUP BY g),
    kept AS (SELECT grams.id, grams.pos, grams.g, df.df
             FROM grams JOIN df USING (g) WHERE df.df <= 400),
    sel AS (SELECT id, pos, g FROM (
              SELECT id, pos, g, ROW_NUMBER() OVER (
                PARTITION BY id ORDER BY df, g, pos) AS r
              FROM kept)
            WHERE r <= 7),
    sh AS (SELECT id, length(s) AS len FROM (
             SELECT id, s, ROW_NUMBER() OVER (
               PARTITION BY length(s) ORDER BY id) AS r
             FROM s WHERE length(s) <= 10)
           WHERE r <= 400),
    cand AS (SELECT DISTINCT id_a, id_b FROM (
             SELECT a.id AS id_a, b.id AS id_b
             FROM sel a JOIN kept b ON a.g = b.g AND a.id < b.id
                  AND abs(a.pos - b.pos) <= 2
             UNION ALL
             SELECT a.id, b.id
             FROM sh a JOIN sh b
               ON b.len BETWEEN a.len - 2 AND a.len + 2 AND a.id < b.id))
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(sa.s, sb.s) AS BIGINT) AS edit_dist
    FROM cand c JOIN s sa ON sa.id = c.id_a JOIN s sb ON sb.id = c.id_b
    WHERE levenshtein(sa.s, sb.s) <= 2
    ORDER BY id_a, id_b
    """,
    doc="EXACT edit-distance similarity join (Gravano et al. VLDB'01 "
    "q-gram filtering + the frequency-ordered prefix selection of "
    "Chaudhuri et al. ICDE'06 — the string-METRIC member of the "
    "similarity-join family beside the set-similarity "
    "jaccard_prefix_join and the fuzzy_key_pairs blocking join): "
    "document pairs whose 40-char prefixes are within Levenshtein "
    "distance 2, candidates from ONE trigram-keyed equi-join of each "
    "lower-id doc's q*d+1 globally RAREST grams (d edits destroy at "
    "most q*d grams, so any q*d+1 of them contain a survivor, found "
    "in the partner at position offset <= d) against the full gram "
    "table, hot grams (>400 docs) dropped under the LSH-bucket skew "
    "discipline, then the exact integer levenshtein verify. Rarity "
    "ordering is the fixture's latency win (verdict r10 next-round "
    "#3): first-POSITION grams are template boilerplate and paired "
    "2.8M candidates for 256 true pairs at ~7s; rarest-gram "
    "selection with the 400-doc cap finds the SAME 256 pairs in "
    "~4.5s at sf0.1. Engine-exact on the ASCII corpus (DuckDB's "
    "levenshtein is byte-based; the Spark operator is char-correct "
    "generally).",
)
def edit_distance_join(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    out = D.edit_distance_join(d, "doc_id", "text", max_bucket=400)
    # LAZY checkpoint before the deterministic sort: orderBy's range
    # sampling would otherwise re-execute the narrow verify tail
    # (the levenshtein pass over every candidate) a second time —
    # the checkpoint materializes the tiny verified pair set once,
    # INSIDE the timed action (eager would move the cost to build
    # time and cheat the bench)
    return out.localCheckpoint(eager=False).orderBy("id_a", "id_b")


#: DSIR bucket count and integer ratio scale — shared by the Spark
#: build and the oracle text
_DSIR_BUCKETS = 4096
_DSIR_SCALE = 1_000_000
_DSIR_TARGET = "src1"


@query(
    "dsir_importance",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS tk FROM documents),
    bgr AS (SELECT doc_id, source,
                   {hash64_sql('bigram')} % {_DSIR_BUCKETS} AS b
            FROM (SELECT doc_id, source,
                         unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
                                               i -> tk[i] || ' ' || tk[i+1])) AS bigram
                  FROM toks)),
    buck AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_raw,
                    CAST(SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
             FROM bgr GROUP BY b),
    sc AS (SELECT doc_id,
                  CAST(SUM(({_DSIR_SCALE} * (c_tgt + 1)) // (c_raw + 1)) AS BIGINT) AS score_sum,
                  CAST(COUNT(*) AS BIGINT) AS n_grams
           FROM bgr JOIN buck USING (b) GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(score_sum, 0) AS score_sum,
           COALESCE(n_grams, 0) AS n_grams,
           CASE WHEN COALESCE(n_grams, 0) > 0
                THEN CAST(score_sum AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END AS mean_score
    FROM documents d LEFT JOIN sc USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="DSIR-shaped importance weighting (Data Selection via "
    "Importance Resampling, arXiv:2302.03169): documents are scored "
    "by how much their hashed-bigram distribution resembles a TARGET "
    "domain (source 'src1') relative to the raw corpus. The paper's "
    "per-feature log-ratio sum is replaced by the libm-free integer "
    "ratio floor(SCALE*(c_target+1)/(c_raw+1)) per bucket occurrence "
    "(add-one smoothed, the token_rarity discipline) — exact BIGINTs "
    "in both engines, same ordering semantics for selection. Scale "
    "shape: ONE bigram explosion; bucket counts are a "
    "4096-row conditional aggregate (both target and raw counts in "
    "one shuffle — the target side is a CASE, not a second scan); "
    "the score join keys on the bucket id against the bucket table "
    "broadcast (bounded at 4096 rows BY CONSTRUCTION, unlike the "
    "unbounded tfidf vocabulary).",
)
def dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.operators.partitioning import fan_out

    d = t(spark, sf, "documents")
    # ONE explosion: compress occurrences to per-(doc, source, bucket)
    # counts first; both downstream consumers (the 4096-row bucket
    # aggregate and the score join) then read the SAME shuffle via
    # ReusedExchange. The explicit isNotNull makes the two branches
    # canonical-identical (the join would otherwise push isnotnull(b)
    # into the probe branch only — the NOTES ReusedExchange trap).
    # NO fan_out here: the groupBy's own exchange — fed by map-side
    # partial aggregation of the exploded bigrams — is the SHARED
    # subtree both consumers reuse at runtime, so the explosion + md5
    # run ONCE and only compressed (doc, source, bucket, count) rows
    # shuffle. The explicit isNotNull filters mirror the pushdowns
    # each consumer would otherwise inject into its branch alone
    # (the NOTES ReusedExchange trap), keeping the subtrees
    # canonical-identical.
    pb = (
        d.select("doc_id", "source", "text")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "source", F.explode(D.word_shingles("text", 2)).alias("g"))
        .select("doc_id", "source", (hash64("g") % _DSIR_BUCKETS).alias("b"))
        .filter(F.col("b").isNotNull())
        .groupBy("doc_id", "source", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    buck = pb.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("c_raw"),
        F.sum(F.when(F.col("source") == _DSIR_TARGET, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("c_tgt"),
    )
    sc = (
        pb.join(F.broadcast(buck), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("c") * F.expr(f"({_DSIR_SCALE} * (c_tgt + 1)) div (c_raw + 1)")
            )
            .cast("bigint")
            .alias("score_sum"),
            F.sum("c").cast("bigint").alias("n_grams"),
        )
    )
    return (
        d.select("doc_id")
        .join(sc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score_sum", F.lit(0)).alias("score_sum"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.col("score_sum").cast("double") / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mean_score"),
        )
        .orderBy("doc_id")
    )


#: integer squared-L2 between two BIGINT lists (oracle fragment) —
#: order-free because the terms are exact integers
_SQ_L2_INT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_zip({a}, {b}), "
    "p -> CAST((p[1] - p[2]) * (p[1] - p[2]) AS BIGINT))), (acc, x) -> acc + x)"
)


@query(
    "pq_topk",
    bench=True,
    oracle=f"""
    WITH emb AS (SELECT vec_id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.q, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, q FROM emb WHERE vec_id < 16) s CROSS JOIN mm),
    enc AS (SELECT vec_id, m, code FROM (
              SELECT e.vec_id, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.q, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM emb e CROSS JOIN cb)
            WHERE rn = 1),
    dt AS (SELECT qv.vec_id AS query_id, cb.m, cb.code,
                  {_SQ_L2_INT.format(a='list_slice(qv.q, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')} AS d
           FROM (SELECT vec_id, q FROM emb WHERE vec_id < 5) qv CROSS JOIN cb),
    sc AS (SELECT dt.query_id, enc.vec_id, CAST(SUM(dt.d) AS BIGINT) AS pq_d2
           FROM enc JOIN dt ON enc.m = dt.m AND enc.code = dt.code
           GROUP BY 1, 2)
    SELECT query_id, vec_id, pq_d2, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pq_d2, vec_id) AS rn
      FROM sc)
    WHERE rn <= 10
    ORDER BY query_id, rn
    """,
    doc="Product-quantization ANN (Jegou et al., TPAMI'11): vectors "
    "compress to m=4 codebook codes (operators/similarity.py:"
    "pq_encode — per-subspace argmin over 16 codes on the exact "
    "integer micro-grid, an Arrow kernel at ~1024 madds/row), then "
    "top-10 per query by ASYMMETRIC distance: each query's m x k "
    "distance table broadcasts and every vector scores as m integer "
    "lookups summed — the memory shape that makes 100 TB ANN "
    "feasible (codes, not floats, at rest; reuse across queries). "
    "Every distance is exact BIGINT arithmetic, so codes, scores, "
    "and ranks are bit-identical across engines (no accumulation-"
    "order machinery needed). The final per-query window is bounded "
    "by the query-batch size, the ADC batch contract.",
)
def pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    cb, _ = SIM.pq_codebook(e)
    enc = SIM.pq_encode(e, cb)
    qs = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 5).collect()
    ]
    sc = SIM.pq_adc_scores(enc, qs, cb)
    w = Window.partitionBy("query_id").orderBy("pq_d2", "vec_id")
    return (
        sc.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 10)
        .orderBy("query_id", "rn")
    )


def _opq_oracle(sf_dir: str) -> str:
    """FULL-PIPELINE oracle for opq_pq_topk (closes the registry's one
    r9 oracle hole). Only the rotation TRAINING (exact covariance →
    eigendecomposition → eigenvalue allocation, property-pinned in
    pytest) stays outside SQL: this template derives the identical
    rotation Spark-free (similarity.opq_rotation_local — pyarrow +
    numpy over the same parquet, bit-equal R pinned by pytest), snaps
    it to the 2^-20 fixed-point grid, injects the int64 matrix as SQL
    literals, and replays EVERYTHING downstream — fixed-point
    rotation, per-subspace trained k-means (3 unrolled Lloyd
    iterations, the ann_ivf_trained centroid discipline), PQ encode,
    broadcast-ADC scoring, top-k — as a CTE chain over the base
    embeddings view. Every rotated component is an exact integer
    (s = Rq @ q in BIGINT, floor((s + half) / 2^shift) — power-of-two
    division is exact in DOUBLE), so both engines proceed from
    bit-identical micro-grid values."""
    from hadoop_main_spark.operators.similarity import (
        ROT_SHIFT,
        opq_rotation_local,
        quantize_rotation,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    Rq = quantize_rotation(opq_rotation_local(path, m=4))
    half, denom = 1 << (ROT_SHIFT - 1), float(1 << ROT_SHIFT)
    rq_rows = ",\n      ".join(
        f"({i}, [{', '.join(str(int(v)) for v in Rq[i])}])"
        for i in range(Rq.shape[0])
    )
    idot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_zip(r.rv, e.q), "
        "p -> CAST(p[1] * p[2] AS BIGINT))), (acc, x) -> acc + x)"
    )
    sql = f"""
    WITH rq(i, rv) AS (VALUES
      {rq_rows}),
    emb AS (SELECT vec_id, list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
            FROM embeddings),
    rotc AS (SELECT e.vec_id, r.i,
               CAST(floor(({idot} + {half}) / {denom}) AS BIGINT) AS c
             FROM emb e CROSS JOIN rq r),
    rotv AS (SELECT vec_id, list(c ORDER BY i) AS q FROM rotc GROUP BY vec_id),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS mi),
    isubs AS (SELECT v.vec_id, mm.mi,
                     list_slice(v.q, mm.mi * 16 + 1, mm.mi * 16 + 16) AS iv
              FROM rotv v CROSS JOIN mm),
    fsubs AS (SELECT vec_id, mi,
                     list_transform(iv, v -> CAST(v AS DOUBLE) / 10000) AS sv
              FROM isubs),
    seedids AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
                FROM (SELECT vec_id FROM rotv ORDER BY vec_id LIMIT 16)),
    cb0 AS (SELECT sd.vec_id AS cluster, sd.code, f.mi, f.sv AS cent
            FROM seedids sd JOIN fsubs f ON f.vec_id = sd.vec_id)"""
    prev = "cb0"
    for it in (1, 2, 3):
        sql += f""",
    d{it} AS (SELECT s.vec_id, s.mi, c.cluster,
                {_SQ_L2.format(a='s.sv', b='c.cent')} AS d2
              FROM fsubs s JOIN {prev} c ON c.mi = s.mi),
    a{it} AS (SELECT vec_id, mi, cluster FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY vec_id, mi ORDER BY d2, cluster) AS rn
                FROM d{it}) WHERE rn = 1),
    cd{it} AS (SELECT a.cluster, a.mi, ii.i AS dimn,
                CAST(((SUM(CAST(floor(CAST(s.sv[ii.i] AS DOUBLE) * 10000000 + 0.5) AS BIGINT))
                       + COUNT(*) * 160000000) // COUNT(*)) - 160000000 AS DOUBLE)
                / 10000000 AS comp
               FROM a{it} a JOIN fsubs s ON s.vec_id = a.vec_id AND s.mi = a.mi,
                    unnest(generate_series(1, 16)) AS ii(i)
               GROUP BY a.cluster, a.mi, ii.i),
    cm{it} AS (SELECT cluster, mi, list(comp ORDER BY dimn) AS cent
               FROM cd{it} GROUP BY cluster, mi),
    cb{it} AS (SELECT p.cluster, p.code, p.mi, COALESCE(n.cent, p.cent) AS cent
               FROM {prev} p LEFT JOIN cm{it} n
                 ON n.cluster = p.cluster AND n.mi = p.mi)"""
        prev = f"cb{it}"
    sql += f""",
    cbf AS (SELECT mi, code,
                   list_transform(cent, c -> CAST(floor(c * 10000 + 0.5) AS BIGINT)) AS icent
            FROM {prev}),
    enc AS (SELECT vec_id, mi, code FROM (
              SELECT s.vec_id, s.mi, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.mi
                       ORDER BY {_SQ_L2_INT.format(a='s.iv', b='cb.icent')}, cb.code) AS rn
              FROM isubs s JOIN cbf cb ON cb.mi = s.mi)
            WHERE rn = 1),
    dt AS (SELECT qv.vec_id AS query_id, cb.mi, cb.code,
                  {_SQ_L2_INT.format(a='qv.iv', b='cb.icent')} AS d
           FROM (SELECT * FROM isubs WHERE vec_id < 5) qv
                JOIN cbf cb ON cb.mi = qv.mi),
    sc AS (SELECT dt.query_id, enc.vec_id, CAST(SUM(dt.d) AS BIGINT) AS pq_d2
           FROM enc JOIN dt ON dt.mi = enc.mi AND dt.code = enc.code
           GROUP BY 1, 2)
    SELECT query_id, vec_id, pq_d2, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pq_d2, vec_id) AS rn
      FROM sc)
    WHERE rn <= 10
    ORDER BY query_id, rn
    """
    return sql


@query(
    "opq_pq_topk",
    oracle=_opq_oracle,
    doc="OPQ-rotated product quantization (Ge et al. CVPR'13, the "
    "FAISS 'OPQ{m},PQ{m}' index string — completes the ANN matrix's "
    "TRAINING axis beside pq_trained_codebook and ann_ivf_trained): "
    "the parametric OPQ_P rotation — PCA basis from the EXACT "
    "distributed covariance (similarity.gram_matrix_exact, dim^2 "
    "BIGINT cells), eigenvalue allocation balancing per-subspace "
    "variance products — snaps to a 2^-20 FIXED-POINT grid "
    "(similarity.quantize_rotation; <=5e-7 per entry, recall "
    "unchanged) and applies corpus-side as an exact int64 matmul "
    "(similarity.rotate_vectors_exact), landing every rotated "
    "component back on the 1e-4 micro-grid; trained per-subspace "
    "codebooks (pq_trained_codebook) then encode the rotated "
    "vectors, and queries share the same rotated values before the "
    "standard broadcast ADC scoring. FULLY ORACLE-GATED since r10 "
    "(_opq_oracle): only the eigendecomposition is derived outside "
    "SQL — Spark-free via opq_rotation_local, bit-equality with the "
    "distributed path pinned in pytest — and the entire downstream "
    "(rotation, 3-iteration trained k-means, encode, ADC, top-k) "
    "replays as a CTE chain in exact arithmetic.",
)
def opq_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    R = SIM.opq_rotation(e, m=4)
    rotq = SIM.rotate_vectors_exact(e, SIM.quantize_rotation(R))
    # back to the standard micro-grid floats: v/1e4 is correctly
    # rounded IEEE division, identical in Spark and the oracle, and
    # floor(x*1e4+0.5) recovers the exact integer everywhere downstream
    rot = rotq.select(
        "vec_id",
        F.transform(
            "qvec", lambda v: v.cast("double") / F.lit(10000.0)
        ).alias("embedding"),
    ).localCheckpoint()  # the codebook TRAINING loop scans rot per
    # iteration; without this each scan replays the rotation lineage
    # (localCheckpoint, not persist — cache-manager hygiene)
    cb, _ = SIM.pq_trained_codebook_all(rot, k=16, m=4, max_iter=3)
    enc = SIM.pq_encode(rot, cb)
    qs = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in rot.filter(F.col("vec_id") < 5).collect()
    ]
    sc = SIM.pq_adc_scores(enc, qs, cb)
    w = Window.partitionBy("query_id").orderBy("pq_d2", "vec_id")
    return (
        sc.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 10)
        .orderBy("query_id", "rn")
    )


def _nnd_oracle(k: int = 10, iters: int = 2) -> str:
    """NN-Descent full-trajectory oracle: seeds + every iteration's
    candidate expansion, scoring, and top-k replayed as a CTE chain
    (the ann_ivf_trained discipline, one level deeper)."""
    l2 = _SQ_L2_INT.format(a="qa.q", b="qb.q")
    sql = f"""
    WITH emb AS (SELECT vec_id AS id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    nn AS (SELECT COUNT(*) AS n FROM emb),
    ranked AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS r FROM emb),
    slots AS (SELECT id, unnest(generate_series(0, {k - 1})) AS j FROM emb),
    seeds AS (SELECT s.id,
                ({hash64_sql("s.id || '#' || s.j", 'nnd')} % nn.n) + 1 AS tr
              FROM slots s CROSS JOIN nn),
    nbr0 AS (SELECT DISTINCT s.id, rk.id AS nbr
             FROM seeds s JOIN ranked rk ON rk.r = s.tr
             WHERE s.id <> rk.id)"""
    prev = "nbr0"
    for i in range(1, iters + 1):
        sql += f"""
 , rev{i} AS (SELECT nbr AS id, id AS nbr FROM {prev}),
   nn{i} AS (SELECT a.id, b.nbr FROM {prev} a JOIN {prev} b ON a.nbr = b.id),
   cand{i} AS (SELECT DISTINCT id, nbr FROM (
       SELECT id, nbr FROM {prev}
       UNION ALL SELECT id, nbr FROM rev{i}
       UNION ALL SELECT id, nbr FROM nn{i}) WHERE id <> nbr),
   sc{i} AS (SELECT c.id, c.nbr, CAST({l2} AS BIGINT) AS d2
             FROM cand{i} c
             JOIN emb qa ON qa.id = c.id JOIN emb qb ON qb.id = c.nbr),
   top{i} AS (SELECT id, nbr, d2,
                ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, nbr) AS rn
              FROM sc{i}),
   nbr{i} AS (SELECT id, nbr FROM top{i} WHERE rn <= {k})"""
        prev = f"nbr{i}"
    sql += f"""
    SELECT id, CAST(rn AS BIGINT) AS rank, nbr AS nbr_id, d2
    FROM top{iters} WHERE rn <= {k}
    """
    return sql


def _nnd_search_oracle(
    k: int = 10,
    iters: int = 2,
    beam: int = 20,
    hops: int = 3,
    entries: int = 4,
    q_lo: int = 0,
    q_hi: int = 5,
) -> str:
    """Graph build (NN-Descent CTEs) + beam-search trajectory in one
    chain: fixed entry points, per-hop expand/score/beam-cut, final
    top-k with self-exclusion — every hop bit-exact."""
    base = _nnd_oracle(k, iters)
    # keep the CTE chain, drop the final SELECT of the build oracle
    chain = base[: base.rindex("\n    SELECT id,")]
    l2q = _SQ_L2_INT.format(a="qn.q", b="qv.qq")
    sql = chain + f"""
 , qv AS (SELECT id AS query_id, q AS qq FROM emb
          WHERE id >= {q_lo} AND id < {q_hi}),
   entry AS (SELECT id AS node FROM ranked WHERE r <= {entries}),
   pool0 AS (SELECT qv.query_id, e.node FROM qv CROSS JOIN entry e)"""
    prev = "pool0"
    for h in range(1, hops + 1):
        sql += f"""
 , nb{h} AS (SELECT p.query_id, g.nbr AS node
             FROM {prev} p JOIN nbr{iters} g ON g.id = p.node),
   u{h} AS (SELECT DISTINCT query_id, node FROM (
       SELECT query_id, node FROM {prev}
       UNION ALL SELECT query_id, node FROM nb{h})),
   sc_s{h} AS (SELECT u.query_id, u.node, CAST({l2q} AS BIGINT) AS d2
               FROM u{h} u JOIN emb qn ON qn.id = u.node
               JOIN qv ON qv.query_id = u.query_id),
   pool{h} AS (SELECT query_id, node, d2 FROM (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2, node) AS rn
       FROM sc_s{h}) WHERE rn <= {beam})"""
        prev = f"pool{h}"
    sql += f"""
    SELECT query_id, node AS neighbor_id, d2, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2, node) AS rn
      FROM pool{hops} WHERE node <> query_id)
    WHERE rn <= {k}
    """
    return sql


def _nnd_layered_oracle(
    k: int = 10,
    iters: int = 2,
    beam: int = 20,
    hops: int = 2,
    sample_mod: int = 4,
    l1_k: int = 8,
    l1_iters: int = 2,
    l1_beam: int = 20,
    l1_hops: int = 3,
    l1_entries: int = 2,
    entries: int = 10,
    q_lo: int = 5,
    q_hi: int = 10,
) -> str:
    """TWO-LAYER graph-ANN trajectory, replayed whole: the layer-0
    NN-Descent build, the hash-sampled layer-1 subgraph's OWN
    NN-Descent build, each query's layer-1 beam search (fixed lowest
    sampled entries), and the layer-0 beam search from the routed
    entry pool — four trajectories in one CTE chain."""
    base = _nnd_oracle(k, iters)
    chain = base[: base.rindex("\n    SELECT id,")]
    l2 = _SQ_L2_INT.format(a="qa.q", b="qb.q")
    l2q = _SQ_L2_INT.format(a="qn.q", b="qv.qq")
    # layer-1 build over the hash-sampled base (the deterministic HNSW
    # level assignment), same NN-Descent recipe with l1-prefixed CTEs
    sql = chain + f"""
 , l1b AS (SELECT id, q FROM emb
           WHERE {hash64_sql("CAST(id AS VARCHAR)", 'l1')} % {sample_mod} = 0),
   l1n AS (SELECT COUNT(*) AS n FROM l1b),
   l1rk AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS r FROM l1b),
   l1sl AS (SELECT id, unnest(generate_series(0, {l1_k - 1})) AS j FROM l1b),
   l1sd AS (SELECT s.id,
              ({hash64_sql("s.id || '#' || s.j", 'nnd')} % l1n.n) + 1 AS tr
            FROM l1sl s CROSS JOIN l1n),
   l1nbr0 AS (SELECT DISTINCT s.id, rk.id AS nbr
              FROM l1sd s JOIN l1rk rk ON rk.r = s.tr
              WHERE s.id <> rk.id)"""
    prev = "l1nbr0"
    for i in range(1, l1_iters + 1):
        sql += f"""
 , l1rev{i} AS (SELECT nbr AS id, id AS nbr FROM {prev}),
   l1nn{i} AS (SELECT a.id, b.nbr FROM {prev} a JOIN {prev} b ON a.nbr = b.id),
   l1cand{i} AS (SELECT DISTINCT id, nbr FROM (
       SELECT id, nbr FROM {prev}
       UNION ALL SELECT id, nbr FROM l1rev{i}
       UNION ALL SELECT id, nbr FROM l1nn{i}) WHERE id <> nbr),
   l1sc{i} AS (SELECT c.id, c.nbr, CAST({l2} AS BIGINT) AS d2
               FROM l1cand{i} c
               JOIN emb qa ON qa.id = c.id JOIN emb qb ON qb.id = c.nbr),
   l1top{i} AS (SELECT id, nbr, d2,
                  ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, nbr) AS rn
                FROM l1sc{i}),
   l1nbr{i} AS (SELECT id, nbr FROM l1top{i} WHERE rn <= {l1_k})"""
        prev = f"l1nbr{i}"
    # layer-1 search: route each query through the sampled subgraph
    sql += f"""
 , qv AS (SELECT id AS query_id, q AS qq FROM emb
          WHERE id >= {q_lo} AND id < {q_hi}),
   l1ent AS (SELECT id AS node FROM l1rk WHERE r <= {l1_entries}),
   lp0 AS (SELECT qv.query_id, e.node FROM qv CROSS JOIN l1ent e)"""
    prev_p = "lp0"
    for h in range(1, l1_hops + 1):
        sql += f"""
 , lnb{h} AS (SELECT p.query_id, g.nbr AS node
              FROM {prev_p} p JOIN l1nbr{l1_iters} g ON g.id = p.node),
   lu{h} AS (SELECT DISTINCT query_id, node FROM (
       SELECT query_id, node FROM {prev_p}
       UNION ALL SELECT query_id, node FROM lnb{h})),
   lsc{h} AS (SELECT u.query_id, u.node, CAST({l2q} AS BIGINT) AS d2
              FROM lu{h} u JOIN emb qn ON qn.id = u.node
              JOIN qv ON qv.query_id = u.query_id),
   lp{h} AS (SELECT query_id, node, d2 FROM (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2, node) AS rn
       FROM lsc{h}) WHERE rn <= {l1_beam})"""
        prev_p = f"lp{h}"
    # routed entry pool = layer-1 top-`entries` (self excluded),
    # then the standard layer-0 trajectory from it
    sql += f"""
 , pool0 AS (SELECT query_id, node FROM (
       SELECT query_id, node,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY d2, node) AS rn
       FROM lp{l1_hops} WHERE node <> query_id)
     WHERE rn <= {entries})"""
    prev_p = "pool0"
    for h in range(1, hops + 1):
        sql += f"""
 , nb{h} AS (SELECT p.query_id, g.nbr AS node
             FROM {prev_p} p JOIN nbr{iters} g ON g.id = p.node),
   u{h} AS (SELECT DISTINCT query_id, node FROM (
       SELECT query_id, node FROM {prev_p}
       UNION ALL SELECT query_id, node FROM nb{h})),
   sc_s{h} AS (SELECT u.query_id, u.node, CAST({l2q} AS BIGINT) AS d2
               FROM u{h} u JOIN emb qn ON qn.id = u.node
               JOIN qv ON qv.query_id = u.query_id),
   pool{h} AS (SELECT query_id, node, d2 FROM (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2, node) AS rn
       FROM sc_s{h}) WHERE rn <= {beam})"""
        prev_p = f"pool{h}"
    sql += f"""
    SELECT query_id, node AS neighbor_id, d2, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d2, node) AS rn
      FROM pool{hops} WHERE node <> query_id)
    WHERE rn <= {k}
    """
    return sql


def _graph_stream_oracle(
    k: int = 5, iters: int = 2, beam: int = 12, hops: int = 2, entries: int = 4
) -> str:
    """The streaming-graph-insert trajectory, replayed whole: base
    NN-Descent build over vec_id >= 40, then TWO insert waves
    (id < 20, then 20 <= id < 40), each wave's beam search running
    over the graph AS OF that wave (base + prior waves' forward AND
    reverse edges, entry points re-derived from the grown node set) —
    the deepest CTE chain in the registry, and exactly what
    knn_graph_stream_parquet computes batch by batch."""
    l2 = _SQ_L2_INT.format(a="qa.q", b="qb.q")
    l2q = _SQ_L2_INT.format(a="qn.q", b="qv.qq")
    sql = f"""
    WITH emb AS (SELECT vec_id AS id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    base AS (SELECT id, q FROM emb WHERE id >= 40),
    nn AS (SELECT COUNT(*) AS n FROM base),
    ranked AS (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS r FROM base),
    slots AS (SELECT id, unnest(generate_series(0, {k - 1})) AS j FROM base),
    seeds AS (SELECT s.id,
                ({hash64_sql("s.id || '#' || s.j", 'nnd')} % nn.n) + 1 AS tr
              FROM slots s CROSS JOIN nn),
    nbr0 AS (SELECT DISTINCT s.id, rk.id AS nbr
             FROM seeds s JOIN ranked rk ON rk.r = s.tr
             WHERE s.id <> rk.id)"""
    prev = "nbr0"
    for i in range(1, iters + 1):
        sql += f"""
 , rev{i} AS (SELECT nbr AS id, id AS nbr FROM {prev}),
   nn{i} AS (SELECT a.id, b.nbr FROM {prev} a JOIN {prev} b ON a.nbr = b.id),
   cand{i} AS (SELECT DISTINCT id, nbr FROM (
       SELECT id, nbr FROM {prev}
       UNION ALL SELECT id, nbr FROM rev{i}
       UNION ALL SELECT id, nbr FROM nn{i}) WHERE id <> nbr),
   sc{i} AS (SELECT c.id, c.nbr, CAST({l2} AS BIGINT) AS d2
             FROM cand{i} c
             JOIN emb qa ON qa.id = c.id JOIN emb qb ON qb.id = c.nbr),
   top{i} AS (SELECT id, nbr, d2,
                ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, nbr) AS rn
              FROM sc{i}),
   nbr{i} AS (SELECT id, nbr FROM top{i} WHERE rn <= {k})"""
        prev = f"nbr{i}"
    sql += f"""
 , g0 AS (SELECT id, nbr FROM nbr{iters})"""
    waves = [(0, "id < 20", "id >= 40"), (1, "id >= 20 AND id < 40", "id >= 40 OR id < 20")]
    for w, qpred, node_pred in waves:
        sql += f"""
 , qv{w} AS (SELECT id AS query_id, q AS qq FROM emb WHERE {qpred}),
   ent{w} AS (SELECT id AS node FROM emb WHERE {node_pred}
              ORDER BY id LIMIT {entries}),
   p{w}_0 AS (SELECT qv.query_id, e.node FROM qv{w} qv CROSS JOIN ent{w} e)"""
        prev_p = f"p{w}_0"
        for h in range(1, hops + 1):
            sql += f"""
 , nb{w}_{h} AS (SELECT p.query_id, g.nbr AS node
                 FROM {prev_p} p JOIN g{w} g ON g.id = p.node),
   u{w}_{h} AS (SELECT DISTINCT query_id, node FROM (
       SELECT query_id, node FROM {prev_p}
       UNION ALL SELECT query_id, node FROM nb{w}_{h})),
   scs{w}_{h} AS (SELECT u.query_id, u.node, CAST({l2q} AS BIGINT) AS d2
                  FROM u{w}_{h} u JOIN emb qn ON qn.id = u.node
                  JOIN qv{w} qv ON qv.query_id = u.query_id),
   p{w}_{h} AS (SELECT query_id, node, d2 FROM (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2, node) AS rn
       FROM scs{w}_{h}) WHERE rn <= {beam})"""
            prev_p = f"p{w}_{h}"
        sql += f"""
 , res{w} AS (SELECT query_id, node, d2, rn FROM (
       SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY d2, node) AS rn
       FROM p{w}_{hops} WHERE node <> query_id)
     WHERE rn <= {k}),
   fr{w} AS (SELECT query_id AS id, rn AS rank, node AS nbr_id, d2 FROM res{w}
             UNION ALL
             SELECT node AS id, rn AS rank, query_id AS nbr_id, d2 FROM res{w}),
   g{w + 1} AS (SELECT id, nbr FROM g{w}
                UNION ALL SELECT id, nbr_id AS nbr FROM fr{w})"""
    sql += """
    SELECT CAST(0 AS BIGINT) AS batch, id, CAST(rank AS BIGINT) AS rank,
           nbr_id, d2 FROM fr0
    UNION ALL
    SELECT CAST(1 AS BIGINT), id, CAST(rank AS BIGINT), nbr_id, d2 FROM fr1
    """
    return sql


@query(
    "stream_graph_insert_roundtrip",
    oracle=_graph_stream_oracle(),
    doc="Streaming GRAPH-ANN ingest ON the driver gate (the tenth "
    "§2.12 certification, and the only driver-gated incremental ANN "
    "index maintenance): the base NN-Descent graph is built over "
    "vec_id >= 40, the remaining vectors replay as two mtime-ordered "
    "parquet waves through the production insert path (streaming/"
    "windows.py:knn_graph_stream_parquet — each wave beam-searches "
    "the graph AS OF that wave and lands forward + REVERSE edges "
    "under its batch partition), and the accumulated per-batch edge "
    "sets must equal the oracle's replay of BOTH trajectories — the "
    "graph build and every wave's search over the grown graph, "
    "entry points re-derived from the grown node set — the deepest "
    "CTE chain in the registry. A wave searching the wrong graph "
    "state, a lost reverse link, or a replayed batch moves a row. "
    "BUILD-COST NOTE: this builder EXECUTES the full streaming job "
    "at plan-build time. LOCAL-MODE CONTRACT: tempfile.mkdtemp().",
)
def stream_graph_insert_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from hadoop_main_spark.streaming.windows import knn_graph_stream_parquet

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    root = tempfile.mkdtemp(prefix="streamgraph_")
    idx = f"{root}/idx"
    SIM.build_knn_graph_index(
        e.filter(F.col("vec_id") >= 40), idx, k=5, iterations=2
    )
    src = f"{root}/src"
    os.makedirs(src)
    for w, pred in ((0, F.col("vec_id") < 20),
                    (1, (F.col("vec_id") >= 20) & (F.col("vec_id") < 40))):
        part = f"{root}/part{w}"
        e.filter(pred).coalesce(1).write.parquet(part)
        (pf,) = glob.glob(f"{part}/part-*.parquet")
        dst = f"{src}/w{w}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + w * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = knn_graph_stream_parquet(
        stream, idx, f"{root}/inc", f"{root}/ckpt",
        k=5, beam=12, hops=2, entries=4,
    )
    q.awaitTermination()
    return spark.read.parquet(f"{root}/inc/edges").select(
        F.col("batch").cast("bigint").alias("batch"),
        "id",
        F.col("rank").cast("bigint").alias("rank"),
        "nbr_id",
        "d2",
    )


def _write_parity_waves(df, root: str, order_col: str = "vec_id") -> str:
    """Two mtime-ordered single-file parquet waves (even ids then odd
    ids) for maxFilesPerTrigger=1 streaming fixtures — wave w holds
    rows with ``order_col % 2 == w``, so the oracle derives the batch
    id in closed form (id parity)."""
    import glob
    import os
    import shutil

    src = f"{root}/src"
    os.makedirs(src)
    for w in (0, 1):
        part = f"{root}/part{w}"
        df.filter(F.pmod(F.col(order_col), F.lit(2)) == w).coalesce(1).write.parquet(part)
        (pf,) = glob.glob(f"{part}/part-*.parquet")
        dst = f"{src}/w{w}.parquet"
        shutil.move(pf, dst)
        os.utime(dst, (1_700_000_000 + w * 60,) * 2)
    return src


@query(
    "stream_pq_codes_roundtrip",
    oracle=f"""
    WITH emb AS (SELECT vec_id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.q, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, q FROM emb WHERE vec_id < 16) s CROSS JOIN mm),
    enc AS (SELECT vec_id, m, code FROM (
              SELECT e.vec_id, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.q, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM emb e CROSS JOIN cb)
            WHERE rn = 1)
    SELECT CAST(vec_id % 2 AS BIGINT) AS batch, vec_id,
           CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
    FROM enc
    """,
    doc="Streaming PQ-code ingest ON the driver gate (r9 verdict "
    "missing#3 — the incremental-ANN-index ingest loop, previously "
    "stream==batch-pytest-only): the corpus replays as two "
    "mtime-ordered parity waves through the production path "
    "(streaming/windows.py:pq_codes_stream_parquet — each micro-batch "
    "encodes against the broadcast seeded codebook and lands under "
    "its batch=<id> partition), and the accumulated code table, WITH "
    "its batch lineage, must equal the oracle's seeded-codebook "
    "argmin replay with batch derived from id parity. A re-encoded "
    "corpus row, a wave landing in the wrong partition, or a replay "
    "that double-writes moves a row. BUILD-COST NOTE: executes the "
    "streaming job at plan-build time. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp().",
)
def stream_pq_codes_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import pq_codes_stream_parquet

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    cb, _ = SIM.pq_codebook(e)
    root = tempfile.mkdtemp(prefix="streampq_")
    src = _write_parity_waves(e, root)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = pq_codes_stream_parquet(stream, cb, f"{root}/codes", f"{root}/ckpt")
    q.awaitTermination()
    return (
        spark.read.parquet(f"{root}/codes")
        .select(
            F.col("batch").cast("bigint").alias("batch"),
            "vec_id",
            F.posexplode("codes").alias("m", "code"),
        )
        .select(
            "batch", "vec_id",
            F.col("m").cast("bigint").alias("m"),
            F.col("code").cast("bigint").alias("code"),
        )
    )


@query(
    "stream_residual_codes_roundtrip",
    oracle=f"""
    WITH emb AS (SELECT vec_id, label,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    comps AS (SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    centd AS (SELECT cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY cell, dim),
    qcent AS (SELECT cell,
                     list_transform(list(c ORDER BY dim),
                       c -> CAST(floor(c * 10000 + 0.5) AS BIGINT)) AS qc
              FROM centd GROUP BY cell),
    remb AS (SELECT e.vec_id, e.label,
                    list_transform(list_zip(e.q, x.qc), p -> p[1] - p[2]) AS rq
             FROM emb e JOIN qcent x ON x.cell = e.label),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.rq, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, rq FROM remb WHERE vec_id < 16) s CROSS JOIN mm),
    cent AS (SELECT cell, list(c ORDER BY dim) AS centroid
             FROM centd GROUP BY cell),
    assigned AS (SELECT vec_id, cell FROM (
                   SELECT e.vec_id, c.cell,
                          ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY {_SQ_L2.format(a='e.embedding', b='c.centroid')}, c.cell) AS rn
                   FROM embeddings e CROSS JOIN cent c)
                 WHERE rn = 1),
    semb AS (SELECT e.vec_id, a.cell,
                    list_transform(list_zip(e.q, x.qc), p -> p[1] - p[2]) AS rq
             FROM emb e JOIN assigned a ON a.vec_id = e.vec_id
                  JOIN qcent x ON x.cell = a.cell),
    enc AS (SELECT vec_id, cell, m, code FROM (
              SELECT e.vec_id, e.cell, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.rq, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM semb e CROSS JOIN cb)
            WHERE rn = 1)
    SELECT CAST(vec_id % 2 AS BIGINT) AS batch, vec_id,
           CAST(cell AS BIGINT) AS cell,
           CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
    FROM enc
    """,
    doc="Streaming TRUE-IVFADC ingest ON the driver gate (r9 verdict "
    "missing#3, the residual twin of stream_pq_codes_roundtrip): the "
    "base index (per-cell DECIMAL-exact centroids + serialized "
    "seed-residual codebook) is built once, then the corpus replays "
    "as two parity waves through streaming/windows.py:"
    "residual_codes_stream_parquet — each micro-batch routes through "
    "the coarse quantizer (kmeans_assign against the PERSISTED "
    "centroids), residual-encodes against the SERIALIZED codebook, "
    "and lands cell-keyed codes under batch=<id>. The accumulated "
    "codes_inc table with batch lineage must equal the oracle's "
    "replay of the full chain: exact centroid means -> integer "
    "residuals -> seed-residual codebook -> per-subspace argmin, "
    "batch from id parity. A wrong cell route (centroid drift), a "
    "residual computed against the wrong centroid grid, or a replay "
    "double-write moves a row. BUILD-COST NOTE: builds the index AND "
    "executes the streaming job at plan-build time. LOCAL-MODE "
    "CONTRACT: tempfile.mkdtemp().",
)
def stream_residual_codes_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import residual_codes_stream_parquet

    e = t(spark, sf, "embeddings")
    root = tempfile.mkdtemp(prefix="streamres_")
    idx = f"{root}/idx"
    SIM.build_ivfpq_residual_index(e, idx, "label")
    src = _write_parity_waves(e.select("vec_id", "embedding"), root)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = residual_codes_stream_parquet(stream, idx, f"{root}/ckpt")
    q.awaitTermination()
    return (
        spark.read.parquet(f"{idx}/codes_inc")
        .select(
            F.col("batch").cast("bigint").alias("batch"),
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.posexplode("codes").alias("m", "code"),
        )
        .select(
            "batch", "vec_id", "cell",
            F.col("m").cast("bigint").alias("m"),
            F.col("code").cast("bigint").alias("code"),
        )
    )


@query(
    "knn_graph_search",
    oracle=_nnd_search_oracle(),
    doc="Graph-ANN SEARCH — beam search over the NN-Descent k-NN "
    "graph (similarity.knn_graph_search; HNSW layer-0 search, Malkov "
    "& Yashunin TPAMI'18 §4, in deterministic batch form — build + "
    "search is the complete graph-index story beside knn_graph_"
    "nndescent): every query starts at the same 4 fixed entry points "
    "(lowest ids), 3 hops of expand-by-graph-neighbors / exact "
    "BIGINT grid-L2 scoring / beam-20 cut, then top-10 of the final "
    "pool with self-exclusion. NEVER scans the corpus — each hop is "
    "one graph equi-join + one query-keyed window over a bounded "
    "pool, which is the entire point of a graph index at 100 TB. The "
    "oracle replays BOTH trajectories (the graph build and every "
    "search hop) as one CTE chain; RECALL.md pins recall per hop "
    "count (the routing curve). COST NOTE (~7.6s at sf0.1): the "
    "inline NN-Descent build (persisted, r10) plus three sequential "
    "hop windows are the cold-query fixture contract — the "
    "production path is knn_graph_indexed's persisted index at "
    "~1.1s, and the 10x gate pins ~1x growth (stage latency, not "
    "data, dominates here).",
)
def knn_graph_search(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    # checkpoint the inline build: every search hop joins the edge
    # table, and without this the iterative NN-Descent lineage replays
    # per hop (r9 verdict #6 — was the sweep's most expensive query;
    # the production path is knn_graph_indexed's persisted index).
    # localCheckpoint, not persist — cache-manager plan-matching would
    # leak the build into knn_graph_nndescent's measured plan
    g = SIM.nndescent_knn_graph(e, k=10, iterations=2).localCheckpoint()
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # stable ckpt tag: registry builders are rebuilt fresh before
    # every execution, so the next build may release this build's hop
    # checkpoints (the supersede contract)
    return SIM.knn_graph_search(
        g, e, qs, k=10, beam=20, hops=3, entries=4,
        ckpt_tag="q:knn_graph_search",
    )


@query(
    "knn_graph_indexed",
    oracle=_nnd_search_oracle(q_lo=10, q_hi=15),
    doc="Beam search over a MATERIALIZED k-NN graph "
    "(similarity.build_knn_graph_index / knn_graph_search_indexed — "
    "the persist-once shape every other ANN family here has): the "
    "NN-Descent build writes the edge table + node vectors at ingest "
    "(build-if-absent here, keyed on the data fingerprint), and the "
    "query path touches ONLY the persisted graph — no corpus scan, "
    "no rebuild. Distinct query set (vec_id 10..14) from "
    "knn_graph_search; identical trajectory oracle.",
)
def knn_graph_indexed(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    idx = _index_dir(sf, "knngraph")
    if not (
        os.path.exists(f"{idx}/graph/_SUCCESS")
        and os.path.exists(f"{idx}/nodes/_SUCCESS")
    ):
        SIM.build_knn_graph_index(e, idx, k=10, iterations=2)
    qs = e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.knn_graph_search_indexed(
        spark, idx, qs, k=10, beam=20, hops=3, entries=4,
        ckpt_tag="q:knn_graph_indexed",  # rebuilt fresh per execution
    )


@query(
    "knn_graph_layered",
    oracle=_nnd_layered_oracle(beam=32),
    doc="Graph-ANN search with a HIERARCHICAL ENTRY LAYER (verdict-r9 "
    "#4 — the actual HNSW upper-layer idea, Malkov & Yashunin §4.2, "
    "in deterministic form): layer 1 is the hash-sampled 1/4 "
    "subgraph (hash64(id,'l1') % 4 == 0 — the deterministic analog "
    "of HNSW's exponential level assignment) with its own NN-Descent "
    "k=8 graph; each query beam-searches layer 1 first (hops=3 on a "
    "4x-smaller graph — the cheap part) and its top-10 sampled nodes "
    "become the layer-0 entry pool (similarity."
    "hierarchical_entry_pool -> knn_graph_search entry_pool=...), so "
    "layer 0 needs only hops=2. At 100 TB this keeps layer-0 hop "
    "count CONSTANT: fixed lowest-id entries need ~O(log n) hops to "
    "escape their own neighborhood, routed entries start inside the "
    "query's region — RECALL.md pins layered hops-1/2/3 at "
    "0.53/0.90/0.93 (beam 32) vs fixed 0.38/0.71/0.88 (beam 20): "
    "layered hops-2 beats fixed hops-3, one fewer sequential hop "
    "for a wider parallel beam (the r9 directive's bar). "
    "The oracle replays all FOUR trajectories in one CTE chain: both "
    "graph builds, the layer-1 routing search, and every layer-0 "
    "hop.",
)
def knn_graph_layered(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    # MATERIALIZED two-layer index (build-if-absent, the
    # knn_graph_indexed discipline): both graph builds are ingest-side
    # work; the query path is pure bounded search over the persisted
    # layers — layer-1 routing (hops=3 on the 4x-smaller subgraph),
    # then hops=2 on layer 0 from the routed entries
    idx = _index_dir(sf, "knngraphl")
    if not (
        os.path.exists(f"{idx}/l0/graph/_SUCCESS")
        and os.path.exists(f"{idx}/l1/graph/_SUCCESS")
    ):
        SIM.build_knn_graph_index(e, f"{idx}/l0", k=10, iterations=2)
        sampled = e.filter(
            hash64(F.col("vec_id").cast("string"), "l1") % 4 == 0
        )
        SIM.build_knn_graph_index(sampled, f"{idx}/l1", k=8, iterations=2)
    qs = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # distinct ckpt tags per search SITE: both searches live in ONE
    # plan (the outer's entry_pool is the inner's result), so a shared
    # tag would let the outer registration forget the inner's
    # not-yet-materialized hop checkpoints (advice r11 #1)
    pool = SIM.knn_graph_search_indexed(
        spark, f"{idx}/l1", qs, k=10, beam=20, hops=3, entries=2,
        ckpt_tag="knn_graph_layered.l1",
    ).select("query_id", F.col("neighbor_id").alias("node"))
    g0 = spark.read.parquet(f"{idx}/l0/graph")
    n0 = spark.read.parquet(f"{idx}/l0/nodes")
    return SIM.knn_graph_search(
        g0, n0, qs, k=10, beam=32, hops=2, entry_pool=pool,
        ckpt_tag="knn_graph_layered.l0",
    )


@query(
    "knn_graph_nndescent",
    oracle=_nnd_oracle(),
    doc="k-NN GRAPH construction by NN-Descent (Dong et al. WWW'11 — "
    "the graph-based ANN paradigm, the batch analog of an HNSW/NSG "
    "index build and the one ANN family the compression x pruning "
    "matrix didn't cover): deterministic pseudo-random seed "
    "neighbors (the j-th seed of node v = the node at id-rank "
    "hash64(v||'#'||j) mod n — ranks via the TotalOrderPartitioner "
    "global_rank, no single-task window), then 2 iterations of "
    "'a neighbor of my neighbor is probably my neighbor': forward ∪ "
    "reverse ∪ neighbors-of-neighbors candidates (O(n·k²) edges, "
    "never all-pairs), exact BIGINT grid-L2 scoring in a JVM "
    "zip_with fold, per-node top-k. The oracle replays the ENTIRE "
    "trajectory — seeds, both candidate expansions, scoring, both "
    "top-k passes — as one CTE chain, so every hop is bit-exact. "
    "RECALL.md pins graph quality per iteration (the descent curve).",
)
def knn_graph_nndescent(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    return SIM.nndescent_knn_graph(e, k=10, iterations=2)


# --- C4-style exact line dedup (rebuild docs minus boilerplate lines) --------

LINE_LEN = 8  # tokens per pseudo-line (the corpus has no newlines)


@query(
    "line_dedup",
    bench=True,
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    nz AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
    seg AS (
      SELECT doc_id, i - 1 AS line_idx,
             array_to_string(tk[(i-1)*{LINE_LEN} + 1 : (i-1)*{LINE_LEN} + {LINE_LEN}], ' ') AS line_text
      FROM nz, unnest(generate_series(1, (len(tk) + {LINE_LEN - 1}) // {LINE_LEN})) AS u(i)),
    marked AS (
      SELECT doc_id, line_idx, line_text,
             row_number() OVER (PARTITION BY md5(line_text)
                                ORDER BY doc_id, line_idx) AS rn
      FROM seg),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_lines,
             SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS kept_lines,
             md5(coalesce(string_agg(CASE WHEN rn = 1 THEN line_text END,
                                     ' ' ORDER BY line_idx), '')) AS cleaned_md5
      FROM marked GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
           CAST(coalesce(kept_lines, 0) AS BIGINT) AS kept_lines,
           coalesce(cleaned_md5, md5('')) AS cleaned_md5
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc=f"C4-style exact line-level dedup: split every document into "
    f"non-overlapping {LINE_LEN}-token pseudo-lines (the corpus has no "
    f"newlines), keep only the globally FIRST occurrence of each "
    f"distinct line (min (doc_id, line_idx)), and rebuild each "
    f"document from its kept lines. Differs from repeated_spans "
    f"(detect-only): this is the REWRITE step that strips cross-site "
    f"boilerplate from training text. Scale shape: the first-occurrence "
    f"decision shuffles only (md5, doc_id, line_idx) — never line text "
    f"— and the rebuild re-slices tokens from the original documents "
    f"row, so text crosses exactly one shuffle (the doc-keyed join "
    f"with the kept-index arrays). Per-digest window groups are "
    f"bounded by the duplicate multiplicity of one line.",
)
def line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    out = D.line_dedup_rebuild(d, "doc_id", "text", line_len=LINE_LEN)
    # hash the rebuilt text so the compared rows stay narrow
    return out.select(
        "doc_id",
        "n_lines",
        "kept_lines",
        F.md5("cleaned_text").alias("cleaned_md5"),
    )


@query(
    "token_diversity",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
    per AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term),
    agg AS (
      SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_types,
             SUM(c * c) AS sumsq
      FROM per GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(n_types, 0) AS BIGINT) AS n_types,
           CAST(coalesce(n_types, 0) AS DOUBLE)
             / CAST(greatest(coalesce(n_tokens, 0), 1) AS DOUBLE) AS ttr,
           CAST(coalesce(n_tokens * n_tokens - sumsq, 0) AS DOUBLE)
             / CAST(greatest(coalesce(n_tokens * n_tokens, 0), 1) AS DOUBLE) AS gini
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc="Lexical-diversity quality signals, libm-free: per-doc "
    "type-token ratio and Gini impurity of the unigram distribution "
    "(1 - sum(c^2)/n^2 computed as the exact integer ratio "
    "(n^2 - sum c^2) / n^2 — the entropy-filter analog that needs no "
    "log, so it is bit-identical across engines). Low diversity flags "
    "looped/template text; the standard cheap companion to the Gopher "
    "rules. Two keyed partial aggregations, one corpus scan on the "
    "stats branch; empty docs report zeros via the left join.",
)
def token_diversity(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    tok = fan_out(d.select("doc_id", "text"), ["doc_id"]).select(
        "doc_id", F.explode(tokenize("text")).alias("term")
    )
    per = tok.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    agg = per.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("sumsq"),
    )
    n = F.coalesce(F.col("n_tokens"), F.lit(0))
    ty = F.coalesce(F.col("n_types"), F.lit(0))
    nsq = n * n
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        ty.cast("bigint").alias("n_types"),
        (ty.cast("double") / F.greatest(n, F.lit(1)).cast("double")).alias("ttr"),
        (
            F.coalesce(nsq - F.col("sumsq"), F.lit(0)).cast("double")
            / F.greatest(nsq, F.lit(1)).cast("double")
        ).alias("gini"),
    )


# --- winnowing fingerprints (MOSS) -------------------------------------------

from hadoop_main_spark.operators import winnowing as WN

_WINNOW_K = 4
_WINNOW_W = 5
_WINNOW_FPS = WN.winnow_fingerprints_sql(
    "documents", "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
)


@query(
    "winnow_fingerprints",
    oracle=f"""
    WITH fps AS ({_WINNOW_FPS}),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_selected,
             SUM(fp) AS fp_sum, MIN(fp) AS fp_min, MAX(fp) AS fp_max
      FROM fps GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n_selected, 0) AS BIGINT) AS n_selected,
           CAST(coalesce(fp_sum, 0) AS BIGINT) AS fp_sum,
           CAST(coalesce(fp_min, -1) AS BIGINT) AS fp_min,
           CAST(coalesce(fp_max, -1) AS BIGINT) AS fp_max
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
    doc="Winnowing fingerprint selection (Schleimer et al. SIGMOD'03, "
    "the MOSS algorithm): rightmost-minimum hash of every w=5 window "
    "over rolling 4-gram hash64 values, selected with ONE packed-BIGINT "
    "min() window (fp*2^20 + reversed pos encodes the tie rule). "
    "Per-doc summary keeps the compared rows narrow: count, exact sum, "
    "min, max of the selected 40-bit fingerprints — any selection "
    "divergence moves the sum. Scale shape: gram text is hashed at the "
    "scan; only (doc_id, pos, key) crosses the per-document window "
    "exchange, and the guarantee bounds density at ~2/(w+1) of grams.",
)
def winnow_fingerprints_q(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    fps = WN.winnow_fingerprints(d, "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W)
    agg = fps.groupBy("doc_id").agg(
        F.count("*").alias("n_selected"),
        F.sum("fp").alias("fp_sum"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
    )
    z = F.lit(0).cast("bigint")
    m = F.lit(-1).cast("bigint")
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_selected", z).alias("n_selected"),
        F.coalesce("fp_sum", z).alias("fp_sum"),
        F.coalesce("fp_min", m).alias("fp_min"),
        F.coalesce("fp_max", m).alias("fp_max"),
    )


@query(
    "winnow_dup_pairs",
    oracle=f"""
    WITH fps AS ({_WINNOW_FPS}),
    dfp AS (SELECT DISTINCT doc_id, fp FROM fps),
    sized AS (
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS bn FROM dfp)
      WHERE bn <= 1000),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM sized a JOIN sized b USING (fp)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
    FROM pairs WHERE n_shared >= 2
    """,
    doc="MOSS-style candidate match: document pairs sharing >= 2 "
    "distinct winnowing fingerprints, with the shared count. Any "
    "common substring of >= w + k - 1 = 8 tokens guarantees a shared "
    "fingerprint (the winnowing theorem), so near-dup candidates "
    "surface without all-pairs work. Scale shape: the join shuffles "
    "only the SELECTED fingerprints (~2/(w+1) of grams), equi-joined "
    "on fp with the standard hot-bucket guard (<= 1000 docs per "
    "fingerprint) — the minhash band-join discipline.",
)
def winnow_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return WN.winnow_pairs(
        d, "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W, min_shared=2
    ).select("id_a", "id_b", F.col("n_shared").cast("bigint").alias("n_shared"))


# --- deterministic weighted sampling (A-ES, libm-free) ------------------------

_WS_K = 20  # sample size
_WS_CAP = 32  # weight cap (bounds the per-row hash fan-out)


@query(
    "weighted_sample_topk",
    oracle=f"""
    WITH wdoc AS (
      SELECT doc_id, least(coalesce(n_chars, 0) // 200 + 1, {_WS_CAP}) AS w
      FROM documents),
    keys AS (
      SELECT doc_id, w,
             list_max(list_transform(generate_series(0, w - 1),
               r -> {hash64_sql("concat(CAST(doc_id AS VARCHAR), ':', CAST(r AS VARCHAR))", "wsample")}))
               AS sample_key
      FROM wdoc)
    SELECT doc_id, CAST(w AS BIGINT) AS weight, sample_key
    FROM keys ORDER BY sample_key DESC, doc_id LIMIT {_WS_K}
    """,
    doc="Deterministic weighted sampling WITHOUT replacement "
    "(Efraimidis-Spirakis A-ES, Inf. Proc. Letters 2006, made "
    "libm-free): instead of the float key u^(1/w), each row's key is "
    "the MAX of w independent hash64 draws — identical in "
    "distribution (P(max of w uniforms <= x) = x^w), integer-exact, "
    "and reproducible on any engine. Weight = document length "
    "(n_chars/200, capped at 32, so the per-row fan-out is bounded "
    "and NO explode happens — the draw list folds inside one "
    "projection). Top-k keys = the weighted sample; global top-k is "
    "TakeOrderedAndProject (per-partition heads, never a full sort). "
    "The training-data use: length/quality-weighted corpus "
    "subsampling that is stable across reruns and engines.",
)
def weighted_sample_topk(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64

    d = t(spark, sf, "documents")
    w = F.least(
        F.expr("coalesce(n_chars, 0) div 200") + 1, F.lit(_WS_CAP)
    ).alias("w")
    draws = F.transform(
        F.sequence(F.lit(0), F.col("w") - 1),
        lambda r: hash64(
            F.concat_ws(":", F.col("doc_id").cast("string"), r.cast("string")),
            "wsample",
        ),
    )
    return (
        d.select("doc_id", w)
        .select(
            "doc_id",
            F.col("w").cast("bigint").alias("weight"),
            F.array_max(draws).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_WS_K)
    )


# --- hashed-feature linear quality classifier ---------------------------------

_QC_BUCKETS = 4096


@query(
    "quality_classifier_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    feat AS (SELECT doc_id, {hash64_sql('term', 'qcls')} % {_QC_BUCKETS} AS bucket
             FROM tok),
    cnt AS (SELECT doc_id, bucket, COUNT(*) AS c FROM feat GROUP BY 1, 2),
    wt AS (SELECT r AS bucket, ({hash64_sql('r', 'qw')} % 17) - 8 AS wgt
           FROM generate_series(0, {_QC_BUCKETS - 1}) AS g(r)),
    sc AS (SELECT doc_id, SUM(c * wgt) AS score
           FROM cnt JOIN wt USING (bucket) GROUP BY doc_id)
    SELECT d.doc_id, CAST(coalesce(score, 0) AS BIGINT) AS score,
           coalesce(score, 0) > 0 AS kept
    FROM documents d LEFT JOIN sc USING (doc_id)
    """,
    doc="Model-based quality filtering, the fastText/CCNet linear-"
    "classifier shape (Joulin et al. arXiv:1607.01759; CCNet "
    "arXiv:1911.00359): tokens hash into a FIXED feature space "
    "(4096 buckets), a bounded weight table joins in, and the "
    "per-document score is the weighted bag-of-features sum. Weights "
    "here are hash-derived integers standing in for trained "
    "parameters (deterministic fake, so the verdict is engine-exact); "
    "the Spark-side plumbing — feature hashing at the scan, partial "
    "agg on (doc, bucket), an explicitly-broadcast model table "
    "(constant-size: the 100 TB contract is the MODEL is small, the "
    "corpus is not), and the left-join zero policy for empty docs — "
    "is the real production shape a trained coefficient vector drops "
    "into.",
)
def quality_classifier_score(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.operators.partitioning import fan_out
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    cnt = (
        fan_out(d.select("doc_id", "text"), ["doc_id"])
        .select("doc_id", F.explode(tokenize("text")).alias("term"))
        .select("doc_id", (hash64("term", "qcls") % _QC_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )
    weights = spark.range(_QC_BUCKETS).select(
        F.col("id").alias("bucket"),
        (hash64(F.col("id"), "qw") % 17 - 8).alias("wgt"),
    )
    sc = (
        cnt.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("wgt")).alias("score"))
    )
    z = F.lit(0).cast("bigint")
    score = F.coalesce(F.col("score"), z)
    return d.select("doc_id").join(sc, "doc_id", "left").select(
        "doc_id", score.alias("score"), (score > 0).alias("kept")
    )


# --- IVF-PQ (IVFADC): coarse cell pruning + asymmetric-distance codes ---------


@query(
    "ivfpq_topk",
    oracle=f"""
    WITH emb AS (SELECT vec_id, label, embedding,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.q, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, q FROM emb WHERE vec_id < 16) s CROSS JOIN mm),
    enc AS (SELECT vec_id, m, code FROM (
              SELECT e.vec_id, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.q, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM emb e CROSS JOIN cb)
            WHERE rn = 1),
    comps AS (SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    centd AS (SELECT cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY cell, dim),
    cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
    qv AS (SELECT vec_id AS query_id, embedding AS qvec, q AS qq
           FROM emb WHERE vec_id < 5),
    cellrank AS (SELECT query_id, cell, qq,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, cent),
    probe AS (SELECT query_id, cell, qq FROM cellrank WHERE crank <= 4),
    dt AS (SELECT p.query_id, cb.m, cb.code,
                  {_SQ_L2_INT.format(a='list_slice(p.qq, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')} AS d
           FROM (SELECT DISTINCT query_id, qq FROM probe) p CROSS JOIN cb),
    cand AS (SELECT p.query_id, e2.vec_id AS neighbor_id
             FROM emb e2 JOIN probe p ON e2.label = p.cell
             WHERE e2.vec_id <> p.query_id),
    sc AS (SELECT c.query_id, c.neighbor_id, CAST(SUM(dt.d) AS BIGINT) AS pq_d2
           FROM cand c
           JOIN enc ON enc.vec_id = c.neighbor_id
           JOIN dt ON dt.query_id = c.query_id AND dt.m = enc.m AND dt.code = enc.code
           GROUP BY 1, 2)
    SELECT query_id, neighbor_id, pq_d2, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pq_d2, neighbor_id) AS rn
      FROM sc)
    WHERE rn <= 10
    """,
    doc="IVF-PQ search (IVFADC — Jegou et al. TPAMI'11 §IV, the FAISS "
    "IndexIVFPQ shape): the coarse quantizer (decimal-exact per-label "
    "centroids, top-4 cells per query by cosine — past this the PQ "
    "code loss dominates probe loss per RECALL.md) prunes the scan, and "
    "within probed cells every vector scores by ASYMMETRIC distance — "
    "m=4 integer lookups into the query's broadcast m x k distance "
    "table against its PQ codes, never its floats. The full-scale "
    "composition: codes at rest, cell-pruned scan, constant broadcast "
    "state per query; distances are exact BIGINT so ranks are "
    "bit-identical across engines.",
)
def ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    cb, _ = SIM.pq_codebook(e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_topk(
        e, q, "label", cb, "vec_id", "embedding", "query_id", k=10, nprobe=4
    )


def _index_dir(sf: str, kind: str, table: str = "embeddings") -> str:
    """Deterministic per-sf-dir index location under the system temp
    dir, keyed on the SOURCE DATA FINGERPRINT (shared
    tables.data_fingerprint: relative-path + size + mtime of the
    embeddings parquet) — regenerated data at the same path gets a
    fresh key, so a build-if-absent check can never probe an index
    built from old data (review-r6). Stale sibling dirs of the same
    kind (previous fingerprints) are pruned here, so iterating on
    data generation never accumulates orphaned indexes in /tmp.
    LOCAL-MODE CONTRACT (same as avro_roundtrip_agg): driver and
    executors share one filesystem here; on a real cluster the index
    lives on the shared FS (S3/HDFS) and this helper is replaced by a
    real path — the build_*/probe operators themselves are
    path-agnostic."""
    import glob
    import hashlib
    import shutil
    import tempfile

    from hadoop_main_spark.tables import data_fingerprint

    src = os.path.join(os.path.abspath(sf), f"{table}.parquet")
    pathkey = hashlib.md5(src.encode()).hexdigest()[:8]
    fpkey = data_fingerprint(src) if os.path.exists(src) else "nodata"
    target = os.path.join(tempfile.gettempdir(), f"hms_{kind}_{pathkey}_{fpkey}")
    # prune only THIS path's stale fingerprints — sibling sf dirs keep
    # their indexes (one session legitimately probes several SFs)
    for stale in glob.glob(
        os.path.join(tempfile.gettempdir(), f"hms_{kind}_{pathkey}_*")
    ):
        if stale != target:
            shutil.rmtree(stale, ignore_errors=True)
    return target


def _ivfpq_index_dir(sf: str) -> str:
    return _index_dir(sf, "ivfpq")


@query(
    "ivfpq_indexed_topk",
    bench=True,
    oracle=f"""
    WITH emb AS (SELECT vec_id, label, embedding,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.q, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, q FROM emb WHERE vec_id < 16) s CROSS JOIN mm),
    enc AS (SELECT vec_id, m, code FROM (
              SELECT e.vec_id, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.q, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM emb e CROSS JOIN cb)
            WHERE rn = 1),
    comps AS (SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    centd AS (SELECT cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY cell, dim),
    cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
    qv AS (SELECT vec_id AS query_id, embedding AS qvec, q AS qq
           FROM emb WHERE vec_id >= 5 AND vec_id < 10),
    cellrank AS (SELECT query_id, cell, qq,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, cent),
    probe AS (SELECT query_id, cell, qq FROM cellrank WHERE crank <= 4),
    dt AS (SELECT p.query_id, cb.m, cb.code,
                  {_SQ_L2_INT.format(a='list_slice(p.qq, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')} AS d
           FROM (SELECT DISTINCT query_id, qq FROM probe) p CROSS JOIN cb),
    cand AS (SELECT p.query_id, e2.vec_id AS neighbor_id
             FROM emb e2 JOIN probe p ON e2.label = p.cell
             WHERE e2.vec_id <> p.query_id),
    sc AS (SELECT c.query_id, c.neighbor_id, CAST(SUM(dt.d) AS BIGINT) AS pq_d2
           FROM cand c
           JOIN enc ON enc.vec_id = c.neighbor_id
           JOIN dt ON dt.query_id = c.query_id AND dt.m = enc.m AND dt.code = enc.code
           GROUP BY 1, 2)
    SELECT query_id, neighbor_id, pq_d2, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pq_d2, neighbor_id) AS rn
      FROM sc)
    WHERE rn <= 10
    """,
    doc="IVFADC against a MATERIALIZED index (verdict-r5 next#3): "
    "centroids parquet + PQ codes partitionBy(cell) are built ONCE "
    "(build-if-absent here; at ingest in production) and the query "
    "path probes the persisted layout — reads the tiny centroid "
    "table, statically prunes the code scan to the probed cells "
    "(IN-list on the partition column; plan audit pins "
    "PartitionFilters), and never touches the float vectors. Same "
    "IVFADC semantics as ivfpq_topk (exact BIGINT asymmetric "
    "distances), different query set (vec_id 5..9). The 22.8 s "
    "per-call centroid rebuild the 1M smoke measured (NOTES r5d) is "
    "off the query path.",
)
def ivfpq_indexed_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    cb, _ = SIM.pq_codebook(e.select("vec_id", "embedding"))
    idx = _ivfpq_index_dir(sf)
    if not (
        os.path.exists(f"{idx}/centroids/_SUCCESS")
        and os.path.exists(f"{idx}/codes/_SUCCESS")
    ):
        SIM.build_ivfpq_index(e, idx, "label", cb)
    q = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_topk_indexed(spark, idx, q, cb, k=10, nprobe=4)


# --- entity resolution end-to-end: fuzzy pairs -> entity clusters -------------


def _cc_pointer_jump_sql(rounds: int) -> str:
    """Generate the ITERATIVE-DOUBLING connected-components oracle tail
    (verdict-r7 #2): expects an ``und`` CTE of symmetric (a, b) edges
    and emits ``l0..l{rounds}`` where each round is (1) a neighbor-min
    step (every node takes the least label in its closed neighborhood
    — one |E|-row join) and (2) a pointer jump (lab <- lab(lab) — one
    |V|-row join), the Spark connected_components shape in SQL. State
    is ONE ROW PER NODE per round, so total work is
    O(rounds * (|V| + |E|)) — unlike the recursive-CTE transitive
    closure, which materializes the full reachability relation and is
    QUADRATIC in component size (>1 CPU-hour on sf0.1's one giant
    distance-1 component, the round-1..7 holdout). The min label's
    reach at least doubles per round (neighbor-min extends it one hop,
    the jump then collapses chains), so ``rounds`` = 12 converges for
    any component diameter up to ~2^12; the fixture name graphs are
    Hamming-like with diameter < 20 at every sf."""
    # every CTE here is referenced TWICE downstream; DuckDB inlines
    # plain CTEs, so without AS MATERIALIZED the expression tree (and
    # the parquet re-scan count) doubles per round — exponential.
    parts = ["l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lab FROM und)"]
    for k in range(1, rounds + 1):
        parts.append(
            f"""m{k} AS MATERIALIZED (SELECT u.a AS id, LEAST(MIN(la.lab), MIN(lb.lab)) AS lab
           FROM und u JOIN l{k-1} la ON la.id = u.a JOIN l{k-1} lb ON lb.id = u.b
           GROUP BY u.a)"""
        )
        parts.append(
            f"""l{k} AS MATERIALIZED (SELECT m.id, LEAST(m.lab, j.lab) AS lab
           FROM m{k} m JOIN m{k} j ON j.id = m.lab)"""
        )
    return (
        ",\n    ".join(parts)
        + f""",
    comp AS (SELECT id AS entity_id, lab AS canonical_id FROM l{rounds})"""
    )


@query(
    "entity_clusters",
    oracle=f"""
    WITH vars AS (
      SELECT c_custkey AS id, c_name AS key,
             unnest(list_prepend(c_name,
               list_transform(generate_series(1, length(c_name)),
                 i -> substr(c_name, 1, i-1) || substr(c_name, i+1, length(c_name))))) AS v
      FROM customer),
    sized AS (SELECT *, COUNT(*) OVER (PARTITION BY v) AS bn FROM vars),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                    a.key AS key_a, b.key AS key_b
             FROM sized a JOIN sized b ON a.v = b.v AND a.id < b.id
             WHERE a.bn <= 1000 AND b.bn <= 1000),
    pairs AS (SELECT id_a, id_b FROM cand WHERE levenshtein(key_a, key_b) <= 1),
    und AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
    {_cc_pointer_jump_sql(12)}
    SELECT entity_id, canonical_id,
           COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
    FROM comp
    """,
    doc="Entity resolution END-TO-END: symmetric-deletion blocking + "
    "exact Levenshtein verify (dedup.fuzzy_key_pairs) resolved into "
    "entity CLUSTERS by connected components — the full dirty-key "
    "master-data pipeline (block, verify, cluster, pick canonical), "
    "composed from the same two primitives the document-dedup path "
    "uses. Scale shape inherits from both: variant equi-join with "
    "hot-bucket guard, one shuffle per CC hop with pointer jumping "
    "(O(log diameter)). The oracle mirrors the ITERATIVE algorithm "
    "(_cc_pointer_jump_sql: unrolled neighbor-min + pointer-jump "
    "rounds, one row per node per round) instead of a recursive-CTE "
    "transitive closure — the closure is quadratic in component size "
    "and took CPU-hours on sf0.1's one giant distance-1 component "
    "(the rounds-1..7 tri-scale holdout, now closed).",
)
def entity_clusters(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    pairs = D.fuzzy_key_pairs(c, "c_custkey", "c_name", max_distance=1)
    comp = D.connected_components(pairs)
    from pyspark.sql import Window

    return comp.select(
        F.col("id").alias("entity_id"),
        F.col("component").alias("canonical_id"),
    ).withColumn(
        "cluster_size",
        F.count("*").over(Window.partitionBy("canonical_id")).cast("bigint"),
    )


# --- estimator quality evaluation: MinHash-LSH vs the exact join --------------


@query(
    "lsh_quality_eval",
    oracle=_MINHASH_PREFIX
    + f"""
    , est AS (
    SELECT id_a, id_b
    FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5),
    dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM dsh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS i
              FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    exact AS (
      SELECT id_a, id_b FROM inter
      JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      WHERE 3 * i >= sa.sz + sb.sz),
    j AS (SELECT coalesce(e.id_a, m.id_a) AS id_a,
                 e.id_a IS NOT NULL AS in_exact,
                 m.id_a IS NOT NULL AS in_est
          FROM exact e FULL OUTER JOIN est m
            ON e.id_a = m.id_a AND e.id_b = m.id_b)
    SELECT CAST(SUM(CASE WHEN in_exact AND in_est THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN in_est AND NOT in_exact THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN in_exact AND NOT in_est THEN 1 ELSE 0 END) AS BIGINT) AS fn
    FROM j
    """,
    doc="Estimator quality harness: MinHash-LSH candidate pairs (est "
    "Jaccard >= 0.5 from 16 signature agreements) scored against the "
    "EXACT Jaccard >= 1/2 join over the same 3-gram shingles — "
    "tp/fp/fn in one row. This is the eval loop a production dedup "
    "pipeline runs on a sample before trusting LSH at full corpus "
    "scale: the exact side (prefix_jaccard_pairs) has no false "
    "negatives by construction, so fn counts true pairs LSH missed "
    "and fp counts estimation overshoot. Both pair sets reuse their "
    "registry operators unchanged; the comparison is one narrow "
    "full-outer join on the pair key.",
)
def lsh_quality_eval(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint

    d = t(spark, sf, "documents")
    # ONE tokenize+shingle pass for both estimators (optimization
    # r12, verdict-r11 #4): the LSH side's MinHash is invariant under
    # shingle de-duplication (min over distinct == min over multiset)
    # and the exact side consumes distinct grams by definition, so
    # both read the same lazily-checkpointed distinct-gram table
    # instead of re-tokenizing the corpus per side. Lazy: the pass
    # still runs fresh inside every timed action.
    grams = supersede_checkpoint(
        "lsh_quality.grams",
        D.distinct_grams(d, "doc_id", "text", n=3).localCheckpoint(eager=False),
    )
    est = D.lsh_pairs_from_signatures(
        D.minhash_signature_from_grams(grams, "doc_id"),
        "doc_id",
        min_est_jaccard=0.5,
    ).select("id_a", "id_b", F.lit(True).alias("in_est"))
    exact = D.prefix_jaccard_pairs(
        d, "doc_id", "text", n=3, t_num=1, t_den=2, grams=grams
    ).select("id_a", "id_b", F.lit(True).alias("in_exact"))
    j = exact.join(est, ["id_a", "id_b"], "full_outer").select(
        F.coalesce("in_exact", F.lit(False)).alias("in_exact"),
        F.coalesce("in_est", F.lit(False)).alias("in_est"),
    )
    b = lambda c: F.sum(c.cast("bigint")).cast("bigint")  # noqa: E731
    return j.agg(
        b(F.col("in_exact") & F.col("in_est")).alias("tp"),
        b(F.col("in_est") & ~F.col("in_exact")).alias("fp"),
        b(F.col("in_exact") & ~F.col("in_est")).alias("fn"),
    )


# --- end-to-end dedup cascade (the C4/FineWeb production recipe) --------------

_CASCADE_KEEP1 = """ keep1 AS (
      SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents) WHERE rn = 1),
    kept_docs AS (SELECT d.* FROM documents d JOIN keep1 USING (doc_id)),"""

# the survivor-subset LSH: every minhash CTE (shingles, signatures,
# bands, bucket guard) re-reads from kept_docs, so bucket sizes and
# candidates are computed over stage-1 SURVIVORS exactly as the Spark
# side does — restricting full-corpus pairs after the fact would get
# the hot-bucket guard wrong
_CASCADE_PREFIX = _MINHASH_PREFIX.replace("FROM documents", "FROM kept_docs").replace(
    "WITH", "WITH" + _CASCADE_KEEP1, 1
)


@query(
    "dedup_cascade",
    oracle=_CASCADE_PREFIX
    + f"""
    , pairs AS (
    SELECT id_a, id_b
    FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b
    WHERE CAST(({_AGREE}) AS DOUBLE) / {float(J)} >= 0.5),
    keep2 AS (SELECT doc_id FROM keep1
              WHERE doc_id NOT IN (SELECT id_b FROM pairs))
    SELECT 'a_corpus' AS stage, CAST(COUNT(*) AS BIGINT) AS docs_kept FROM documents
    UNION ALL
    SELECT 'b_exact_dedup', CAST(COUNT(*) AS BIGINT) FROM keep1
    UNION ALL
    SELECT 'c_near_dedup', CAST(COUNT(*) AS BIGINT) FROM keep2
    """,
    doc="END-TO-END dedup cascade — the production curation recipe "
    "(C4 arXiv:1910.10683 / FineWeb shape): stage 1 removes exact "
    "duplicates (lowest doc_id canonical per text), stage 2 runs "
    "MinHash-LSH over the SURVIVORS (signatures, band buckets, and "
    "the hot-bucket guard all computed on the reduced corpus — not "
    "filtered from full-corpus pairs, which would mis-size buckets) "
    "and greedily drops every doc with a smaller near-dup partner "
    "(est >= 0.5). One (stage, docs_kept) row per stage: the "
    "shrinkage report every curation run ships with. Scale shape "
    "inherits stagewise: digest-only exact dedup, banded LSH with "
    "skew guard, and an anti-join on the pair's id_b side.",
)
def dedup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    k1 = (
        D.exact_dedup(d, ["text"], "doc_id")
        .filter(~F.col("is_duplicate"))
        .select("doc_id")
    )
    survivors = d.join(k1, "doc_id")
    pairs = D.minhash_lsh_pairs(survivors, "doc_id", "text", min_est_jaccard=0.5)
    k2 = k1.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    b = lambda df, name: df.agg(  # noqa: E731
        F.lit(name).alias("stage"), F.count("*").cast("bigint").alias("docs_kept")
    )
    return b(d, "a_corpus").unionByName(b(k1, "b_exact_dedup")).unionByName(
        b(k2, "c_near_dedup")
    )


@query(
    "embedding_covariance",
    oracle="""
    WITH emb AS (SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    idx AS (SELECT i.i AS i, j.j AS j
            FROM generate_series(1, 64) i(i), generate_series(1, 64) j(j)
            WHERE i.i <= j.j)
    SELECT CAST(i - 1 AS INT) AS i, CAST(j - 1 AS INT) AS j,
           CAST(SUM(q[i] * q[j]) AS BIGINT) AS sum_xy,
           CAST(SUM(q[i]) AS BIGINT) AS sum_x,
           CAST(SUM(q[j]) AS BIGINT) AS sum_y,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM emb, idx GROUP BY i, j
    """,
    doc="One-pass EXACT covariance sufficient statistics over the "
    "embedding corpus (similarity.gram_matrix_exact): integer-grid "
    "X^T X per Arrow batch, dim x dim BIGINT partials shuffled "
    "(#batches x 2080 tiny rows), exact DECIMAL final sum — the "
    "aggregate-then-solve primitive behind distributed PCA / "
    "whitening / OPQ: 100 TB of vectors reduce to one 64x64 matrix "
    "and the eigen step runs driver-side (pytest does the full PCA "
    "round trip). The linreg/pearson moment discipline, one order "
    "higher.",
)
def embedding_covariance(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    return SIM.gram_matrix_exact(e, "embedding")


@query(
    "ivfpq_residual_topk",
    oracle=f"""
    WITH emb AS (SELECT vec_id, label, embedding,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    comps AS (SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    centd AS (SELECT cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY cell, dim),
    qcent AS (SELECT cell, list(c ORDER BY dim) AS centroid,
                     list_transform(list(c ORDER BY dim),
                       c -> CAST(floor(c * 10000 + 0.5) AS BIGINT)) AS qc
              FROM centd GROUP BY cell),
    remb AS (SELECT e.vec_id, e.label, e.q,
                    list_transform(list_zip(e.q, x.qc), p -> p[1] - p[2]) AS rq
             FROM emb e JOIN qcent x ON x.cell = e.label),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.rq, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, rq FROM remb WHERE vec_id < 16) s CROSS JOIN mm),
    enc AS (SELECT vec_id, m, code FROM (
              SELECT e.vec_id, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.rq, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM remb e CROSS JOIN cb)
            WHERE rn = 1),
    qv AS (SELECT e.vec_id AS query_id, e.embedding AS qvec, e.q AS qq
           FROM emb e WHERE e.vec_id < 5),
    cellrank AS (SELECT query_id, cell, qq,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, qcent),
    probe AS (SELECT query_id, cell, qq FROM cellrank WHERE crank <= 4),
    dt AS (SELECT p.query_id, p.cell, cb.m, cb.code,
                  {_SQ_L2_INT.format(a='list_slice(list_transform(list_zip(p.qq, x.qc), z -> z[1] - z[2]), cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')} AS d
           FROM probe p JOIN qcent x ON x.cell = p.cell CROSS JOIN cb),
    cand AS (SELECT p.query_id, p.cell, e2.vec_id AS neighbor_id
             FROM remb e2 JOIN probe p ON e2.label = p.cell
             WHERE e2.vec_id <> p.query_id),
    sc AS (SELECT c.query_id, c.neighbor_id, CAST(SUM(dt.d) AS BIGINT) AS pq_d2
           FROM cand c
           JOIN enc ON enc.vec_id = c.neighbor_id
           JOIN dt ON dt.query_id = c.query_id AND dt.cell = c.cell
                  AND dt.m = enc.m AND dt.code = enc.code
           GROUP BY 1, 2)
    SELECT query_id, neighbor_id, pq_d2, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pq_d2, neighbor_id) AS rn
      FROM sc)
    WHERE rn <= 10
    """,
    doc="TRUE IVFADC (Jegou et al. TPAMI'11 §IV-A, the FAISS "
    "IndexIVFPQ default; round-7 addition beside ivfpq_topk's "
    "raw-vector codes): PQ quantizes each vector's RESIDUAL to its "
    "coarse-cell centroid — the shape trained sub-quantizers plug "
    "into (with the fixture's deterministic seed codebooks the recall "
    "benefit does not materialize; measured within-probed-cell "
    "recall@10 at sf0.01: 0.32 vs raw-vector 0.38 — see the operator "
    "docstring). The asymmetric distance table becomes per-(query, "
    "probed cell) — the query residual differs per cell — still "
    "bounded at queries x nprobe x m x k broadcast rows. Everything "
    "stays on the integer micro-grid (quantized vector minus "
    "quantized centroid), so distances are exact BIGINT and ranks "
    "bit-identical across engines.",
)
def ivfpq_residual_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_residual_topk(
        e, q, "label", "vec_id", "embedding", "query_id", k=10, nprobe=4
    )


def _ivfpqres_index_dir(sf: str) -> str:
    return _index_dir(sf, "ivfpqres")


@query(
    "ivfpq_residual_indexed",
    oracle=f"""
    WITH emb AS (SELECT vec_id, label, embedding,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
    comps AS (SELECT label AS cell, i.i AS dim, embedding[i.i] AS x
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    centd AS (SELECT cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY cell, dim),
    qcent AS (SELECT cell, list(c ORDER BY dim) AS centroid,
                     list_transform(list(c ORDER BY dim),
                       c -> CAST(floor(c * 10000 + 0.5) AS BIGINT)) AS qc
              FROM centd GROUP BY cell),
    remb AS (SELECT e.vec_id, e.label, e.q,
                    list_transform(list_zip(e.q, x.qc), p -> p[1] - p[2]) AS rq
             FROM emb e JOIN qcent x ON x.cell = e.label),
    mm AS (SELECT unnest([0, 1, 2, 3]) AS m),
    cb AS (SELECT CAST(s.vec_id AS INT) AS code, mm.m,
                  list_slice(s.rq, mm.m * 16 + 1, mm.m * 16 + 16) AS cent
           FROM (SELECT vec_id, rq FROM remb WHERE vec_id < 16) s CROSS JOIN mm),
    enc AS (SELECT vec_id, m, code FROM (
              SELECT e.vec_id, cb.m, cb.code,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id, cb.m
                       ORDER BY {_SQ_L2_INT.format(a='list_slice(e.rq, cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')}, cb.code) AS rn
              FROM remb e CROSS JOIN cb)
            WHERE rn = 1),
    qv AS (SELECT e.vec_id AS query_id, e.embedding AS qvec, e.q AS qq
           FROM emb e WHERE e.vec_id >= 10 AND e.vec_id < 15),
    cellrank AS (SELECT query_id, cell, qq,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, qcent),
    probe AS (SELECT query_id, cell, qq FROM cellrank WHERE crank <= 4),
    dt AS (SELECT p.query_id, p.cell, cb.m, cb.code,
                  {_SQ_L2_INT.format(a='list_slice(list_transform(list_zip(p.qq, x.qc), z -> z[1] - z[2]), cb.m * 16 + 1, cb.m * 16 + 16)', b='cb.cent')} AS d
           FROM probe p JOIN qcent x ON x.cell = p.cell CROSS JOIN cb),
    cand AS (SELECT p.query_id, p.cell, e2.vec_id AS neighbor_id
             FROM remb e2 JOIN probe p ON e2.label = p.cell
             WHERE e2.vec_id <> p.query_id),
    sc AS (SELECT c.query_id, c.neighbor_id, CAST(SUM(dt.d) AS BIGINT) AS pq_d2
           FROM cand c
           JOIN enc ON enc.vec_id = c.neighbor_id
           JOIN dt ON dt.query_id = c.query_id AND dt.cell = c.cell
                  AND dt.m = enc.m AND dt.code = enc.code
           GROUP BY 1, 2)
    SELECT query_id, neighbor_id, pq_d2, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY pq_d2, neighbor_id) AS rn
      FROM sc)
    WHERE rn <= 10
    """,
    doc="TRUE IVFADC against a MATERIALIZED index: centroids + the "
    "SERIALIZED residual codebook + residual PQ codes "
    "partitionBy(cell) are built once (build-if-absent here; at "
    "ingest in production — FAISS persists the trained quantizer "
    "with the index for the same reason: the probe path must encode "
    "queries against exactly the codebook the corpus was coded "
    "with), and the probe reads only the probed cells' code "
    "partitions via the static IN-list prune. Same residual-IVFADC "
    "semantics as ivfpq_residual_topk (exact BIGINT per-cell "
    "asymmetric distances), different query set (vec_id 10..14).",
)
def ivfpq_residual_indexed(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    idx = _ivfpqres_index_dir(sf)
    if not (
        os.path.exists(f"{idx}/centroids/_SUCCESS")
        and os.path.exists(f"{idx}/codebook/_SUCCESS")
        and os.path.exists(f"{idx}/codes/_SUCCESS")
    ):
        SIM.build_ivfpq_residual_index(e, idx, "label")
    q = e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_residual_topk_indexed(spark, idx, q, k=10, nprobe=4)


@query(
    "bigram_surprise",
    bench=True,
    oracle="""
    WITH w AS (SELECT doc_id,
                      list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
               FROM documents),
    db AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
           FROM w, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t),
    dbc AS (SELECT doc_id, w1, w2, COUNT(*) AS dc FROM db GROUP BY 1, 2, 3),
    bg AS (SELECT w1, w2, SUM(dc) AS c12 FROM dbc GROUP BY 1, 2),
    ctx AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f FROM bg GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS n1b FROM bg GROUP BY w2),
    tot AS (SELECT COUNT(*) AS tt FROM bg),
    sc AS (SELECT d.doc_id, d.dc,
             CASE WHEN 1000 * ((4 * b.c12 - 3) * t.tt + 3 * x.n1f * c.n1b)
                       < 4 * x.c1 * t.tt
                  THEN d.dc ELSE 0 END AS rare_c
           FROM dbc d JOIN bg b ON b.w1 = d.w1 AND b.w2 = d.w2
                JOIN ctx x ON x.w1 = d.w1
                JOIN cont c ON c.w2 = d.w2
                CROSS JOIN tot t),
    ag AS (SELECT doc_id, CAST(SUM(dc) AS BIGINT) AS n_bigrams,
                  CAST(SUM(rare_c) AS BIGINT) AS n_rare
           FROM sc GROUP BY doc_id)
    SELECT dd.doc_id,
           CAST(COALESCE(ag.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(ag.n_rare, 0) AS BIGINT) AS n_rare,
           CAST(CASE WHEN COALESCE(ag.n_bigrams, 0) = 0 THEN 0
                ELSE (1000 * ag.n_rare) // ag.n_bigrams END AS BIGINT)
             AS rare_permille
    FROM documents dd LEFT JOIN ag ON ag.doc_id = dd.doc_id
    """,
    doc="Bigram-LM surprise quality filter (the CCNet-family LM filter "
    "at the bigram level, libm-free): every document is scored by the "
    "fraction of its bigram tokens whose corpus-wide Kneser-Ney "
    "probability P(w2|w1) = (c12 - 3/4)/c1 + (3/4)(n1f/c1)(n1b/T) "
    "falls below 1/1000 — the comparison is cross-multiplied to the "
    "EXACT integer inequality 1000*((4*c12-3)*T + 3*n1f*n1b) < "
    "4*c1*T, so no float (let alone libm log/exp, whose last-ulp "
    "behavior differs across engines) ever enters the score. "
    "Int64-range contract: exact while 4000*c1*T < 2^63; past that "
    "promote the comparison operands to DECIMAL(38,0). Scale shape: "
    "the per-(doc, bigram) aggregate is the shared exchange feeding "
    "both the corpus LM (second aggregate + vocabulary windows, the "
    "bigram_lm discipline) and the per-doc scoring join; per-doc "
    "counts re-aggregate on doc_id and left-join the documents spine "
    "(empty/one-token docs score 0).",
)
def bigram_surprise(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf, "documents")
    # ONE explicit (w1, w2) exchange below the doc-level aggregate
    # (bench r8: was 3 exchanges + zero reuse — the shingle explode
    # ran once per consumer). HashPartitioning(w1, w2) satisfies the
    # ClusteredDistribution of groupBy(doc_id, w1, w2) (a subset of
    # the grouping keys), so the aggregate runs in place, and BOTH
    # consumers — the corpus LM re-aggregate on (w1, w2) and the
    # per-doc scoring join on (w1, w2) — inherit the partitioning:
    # the scan + explode + shuffle of the corpus happens exactly once
    # (ReusedExchange, pinned by the plan audit).
    dbc = (
        d.select("doc_id", F.explode(D.word_shingles("text", 2)).alias("b"))
        .select(
            "doc_id",
            F.split_part(F.col("b"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("b"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        # doc_id isNotNull is semantically free but REQUIRED for the
        # exchange reuse below: the scoring join's left-outer parent
        # pushes isnotnull(doc_id) into its copy of this subtree, and
        # ReusedExchange needs canonically identical branches (the
        # negative_samples precedent)
        .filter(
            F.col("w1").isNotNull()
            & F.col("w2").isNotNull()
            & F.col("doc_id").isNotNull()
        )
        .repartition("w1", "w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("dc"))
    )
    bg = dbc.groupBy("w1", "w2").agg(F.sum("dc").alias("c12"))
    w1win, w2win = Window.partitionBy("w1"), Window.partitionBy("w2")
    stats = bg.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(w1win).alias("c1"),
        F.count("*").over(w1win).alias("n1f"),
        F.count("*").over(w2win).alias("n1b"),
    )
    # the trivially-true c12 > 0 guard stops column pruning from
    # collapsing this branch to distinct(w1, w2) straight off the
    # scan — keeping its subtree identical to stats' through the
    # shared (w1, w2) exchange, so ALL THREE consumers (LM stats,
    # total count, scoring join) reuse ONE corpus explode+shuffle
    tot = bg.where(F.col("c12") > 0).agg(F.count("*").alias("tt"))
    rare_c = F.when(
        F.lit(1000)
        * ((F.lit(4) * F.col("c12") - 3) * F.col("tt") + F.lit(3) * F.col("n1f") * F.col("n1b"))
        < F.lit(4) * F.col("c1") * F.col("tt"),
        F.col("dc"),
    ).otherwise(F.lit(0))
    ag = (
        dbc.join(stats, ["w1", "w2"])
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "dc", rare_c.alias("rare_c"))
        .groupBy("doc_id")
        .agg(
            F.sum("dc").cast("bigint").alias("n_bigrams"),
            F.sum("rare_c").cast("bigint").alias("n_rare"),
        )
    )
    return d.select("doc_id").join(ag, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("n_rare", F.lit(0)).cast("bigint").alias("n_rare"),
        F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
        .otherwise(F.expr("(1000 * n_rare) DIV n_bigrams"))
        .cast("bigint")
        .alias("rare_permille"),
    )


@query(
    "sq8_topk",
    oracle="""
    WITH mmx AS (SELECT i.i AS dim,
                        MIN(CAST(embedding[i.i] AS DOUBLE)) AS mn,
                        MAX(CAST(embedding[i.i] AS DOUBLE)) AS mx
                 FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)
                 GROUP BY i.i),
    enc AS (SELECT e.vec_id,
              list(CASE WHEN m.mx <= m.mn THEN CAST(0 AS BIGINT)
                   ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
                        floor((CAST(e.embedding[m.dim] AS DOUBLE) - m.mn)
                              * CAST(255 AS DOUBLE) / (m.mx - m.mn)
                              + CAST('0.5' AS DOUBLE)))) AS BIGINT)
                   END ORDER BY m.dim) AS codes
            FROM embeddings e, mmx m
            GROUP BY e.vec_id),
    qv AS (SELECT vec_id AS query_id, codes AS qc FROM enc WHERE vec_id < 5),
    sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(list_zip(e.codes, q.qc),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, x) -> a + x) AS sq_d2
           FROM enc e, qv q WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, CAST(sq_d2 AS BIGINT) AS sq_d2,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sq_d2, neighbor_id) AS rn
          FROM sc)
    WHERE rn <= 10
    """,
    doc="8-bit SCALAR quantization ANN (FAISS IndexScalarQuantizer "
    "QT_8bit — the simplest compressed index: 4x smaller at rest than "
    "float32 with HIGH recall (measured recall@10 vs exact float L2 "
    "at sf0.01: 0.88), no codebook to train: per-dim "
    "min/max from one aggregate pass, codes = floor((x-mn)*255/span "
    "+ 0.5) — the identical IEEE double expression in both engines — "
    "and distances are exact BIGINT sums of squared code deltas, so "
    "ranks are bit-identical. Completes the compression spectrum "
    "beside PQ/IVFPQ/residual-IVFPQ: SQ8 trades 4x compression for "
    "near-zero recall loss; PQ trades 32x for codebook-dependent "
    "recall. Kernel: brute_force_topk's combiner shape — per-batch "
    "local top-k, query codes in the closure.",
)
def sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.sq8_topk(e, q, "vec_id", "embedding", "query_id", k=10)


@query(
    "ivf_sq8_topk",
    oracle=f"""
    WITH mmx AS (SELECT i.i AS dim,
                        MIN(CAST(embedding[i.i] AS DOUBLE)) AS mn,
                        MAX(CAST(embedding[i.i] AS DOUBLE)) AS mx
                 FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)
                 GROUP BY i.i),
    enc AS (SELECT e.vec_id, e.label AS cell,
              list(CASE WHEN m.mx <= m.mn THEN CAST(0 AS BIGINT)
                   ELSE CAST(least(CAST(255 AS DOUBLE), greatest(CAST(0 AS DOUBLE),
                        floor((CAST(e.embedding[m.dim] AS DOUBLE) - m.mn)
                              * CAST(255 AS DOUBLE) / (m.mx - m.mn)
                              + CAST('0.5' AS DOUBLE)))) AS BIGINT)
                   END ORDER BY m.dim) AS codes
            FROM embeddings e, mmx m
            GROUP BY e.vec_id, e.label),
    centd AS (SELECT label AS cell, i.i AS dim,
                     CAST(SUM(CAST(embedding[i.i] AS DECIMAL(27,7))) AS DOUBLE)
                       / COUNT(*) AS c
              FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)
              GROUP BY label, i.i),
    cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
    qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    cellrank AS (SELECT query_id, cell,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, cent),
    probe AS (SELECT query_id, cell FROM cellrank WHERE crank <= 8),
    qc AS (SELECT vec_id AS query_id, codes AS qc FROM enc WHERE vec_id < 5),
    sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(list_zip(e.codes, q.qc),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, x) -> a + x) AS sq_d2
           FROM enc e JOIN probe p ON e.cell = p.cell
                JOIN qc q ON q.query_id = p.query_id
           WHERE e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, CAST(sq_d2 AS BIGINT) AS sq_d2,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY sq_d2, neighbor_id) AS rn
          FROM sc)
    WHERE rn <= 10
    """,
    doc="IVF-SQ8 (the FAISS 'IVF,SQ8' index string — the last cell "
    "of the compression x pruning matrix; sq8_topk is the full-scan "
    "form): the ann_ivf coarse quantizer picks the top-8 cells per "
    "query, and within them vectors score by exact BIGINT L2 over "
    "8-bit scalar codes — but unlike sq8_topk's Arrow kernel "
    "(every vector x every query amortizes the transfer), each "
    "probed vector meets ~1 query, so scoring is a JVM zip_with "
    "fold in whole-stage codegen (the _score_probed_cells x1-"
    "multiplier measurement). Query codes quantize on the same "
    "per-dim grid and ride a queries x nprobe broadcast.",
)
def ivf_sq8_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_sq8_topk(
        e, q, "label", "vec_id", "embedding", "query_id", k=10, nprobe=8
    )


@query(
    "bq_rerank_topk",
    oracle=f"""
    WITH comps AS (SELECT vec_id, i.i - 1 AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
                   FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    mn AS (SELECT dim, CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS mn
           FROM comps GROUP BY dim),
    words AS (SELECT c.vec_id, c.dim // 32 AS word,
                     SUM(CASE WHEN c.x > m.mn THEN (1::BIGINT << (c.dim % 32))
                         ELSE CAST(0 AS BIGINT) END) AS w
              FROM comps c JOIN mn m USING (dim) GROUP BY 1, 2),
    codes AS (SELECT vec_id, list(w ORDER BY word) AS codes FROM words GROUP BY vec_id),
    qc AS (SELECT vec_id AS query_id, codes AS qcodes FROM codes WHERE vec_id < 5),
    qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    ham AS (SELECT q.query_id, c.vec_id AS neighbor_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(list_zip(c.codes, q.qcodes),
                  p -> CAST(bit_count(xor(p[1], p[2])) AS BIGINT))), (a, x) -> a + x)
                AS hamming
            FROM codes c, qc q WHERE c.vec_id <> q.query_id),
    short AS (SELECT query_id, neighbor_id, hamming FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY hamming, neighbor_id) AS hr
                FROM ham) WHERE hr <= 50),
    rr AS (SELECT s.query_id, s.neighbor_id, s.hamming,
             {_cos("e.embedding", "v.qvec")} AS cosine
           FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
                JOIN qv v ON v.query_id = s.query_id)
    SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming, cosine,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM rr)
    WHERE rn <= 10
    """,
    doc="BINARY quantization + exact re-rank (the modern two-stage "
    "vector-store shape): 1-bit sign codes around the per-dim "
    "DECIMAL-exact mean, packed 32 dims per BIGINT word (32-bit "
    "packing keeps every word positive and identical across engines "
    "— bit 63 differs in sign interpretation), Hamming shortlist of "
    "k x 5 candidates via bit_count(xor) — 32x smaller than float32 "
    "and pure codegen, no Python — then EXACT sequential-fold cosine "
    "re-ranks only the shortlist. Hamming ties break on neighbor id, "
    "so the shortlist and final ranks are engine-exact end to end. "
    "At 100 TB the float vectors are read for k x oversample rows "
    "per query, never the corpus.",
)
def bq_rerank_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.bq_rerank_topk(e, q, "vec_id", "embedding", "query_id", k=10)


@query(
    "bq_ivf_rerank_topk",
    oracle=f"""
    WITH comps AS (SELECT vec_id, label, i.i - 1 AS dim,
                          CAST(embedding[i.i] AS DOUBLE) AS x
                   FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    mn AS (SELECT dim, CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS mn
           FROM comps GROUP BY dim),
    words AS (SELECT c.vec_id, c.label, c.dim // 32 AS word,
                     SUM(CASE WHEN c.x > m.mn THEN (1::BIGINT << (c.dim % 32))
                         ELSE CAST(0 AS BIGINT) END) AS w
              FROM comps c JOIN mn m USING (dim) GROUP BY 1, 2, 3),
    codes AS (SELECT vec_id, label AS cell, list(w ORDER BY word) AS codes
              FROM words GROUP BY vec_id, label),
    centd AS (SELECT label AS cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY label, dim),
    cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
    qc AS (SELECT vec_id AS query_id, codes AS qcodes FROM codes WHERE vec_id < 5),
    qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    cellrank AS (SELECT query_id, cell,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, cent),
    probe AS (SELECT query_id, cell FROM cellrank WHERE crank <= 8),
    ham AS (SELECT q.query_id, c.vec_id AS neighbor_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(list_zip(c.codes, q.qcodes),
                  p -> CAST(bit_count(xor(p[1], p[2])) AS BIGINT))), (a, x) -> a + x)
                AS hamming
            FROM codes c JOIN probe p ON c.cell = p.cell
                 JOIN qc q ON q.query_id = p.query_id
            WHERE c.vec_id <> q.query_id),
    short AS (SELECT query_id, neighbor_id, hamming FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY hamming, neighbor_id) AS hr
                FROM ham) WHERE hr <= 50),
    rr AS (SELECT s.query_id, s.neighbor_id, s.hamming,
             {_cos("e.embedding", "v.qvec")} AS cosine
           FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
                JOIN qv v ON v.query_id = s.query_id)
    SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming, cosine,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM rr)
    WHERE rn <= 10
    """,
    doc="IVF-pruned binary quantization + exact re-rank (verdict-r7 "
    "#3 — the last ANN variant whose candidate stage scanned the full "
    "corpus): the ann_ivf coarse quantizer ranks cells by "
    "query-centroid cosine, the top-8 cells' 1-bit codes are "
    "equi-joined to the Hamming shortlist (bit_count(xor), pure "
    "codegen — never a corpus-wide cross join), and exact "
    "sequential-fold cosine re-ranks only k x 5 candidates. With "
    "codes partitioned by cell this reads ~nprobe/ncells of the "
    "32x-compressed codes and touches float vectors only for the "
    "shortlist — the IVF prune composed over the BQ compression, "
    "completing the {{brute, IVF, PQ, IVFPQ, residual, SQ8, BQ}} x "
    "{{full-scan, cell-pruned}} matrix.",
)
def bq_ivf_rerank_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.bq_ivf_rerank_topk(
        e, q, "label", "vec_id", "embedding", "query_id", k=10, oversample=5, nprobe=8
    )


@query(
    "bq_ivf_indexed_topk",
    oracle=f"""
    WITH comps AS (SELECT vec_id, label, i.i - 1 AS dim,
                          CAST(embedding[i.i] AS DOUBLE) AS x
                   FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)),
    mn AS (SELECT dim, CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS mn
           FROM comps GROUP BY dim),
    words AS (SELECT c.vec_id, c.label, c.dim // 32 AS word,
                     SUM(CASE WHEN c.x > m.mn THEN (1::BIGINT << (c.dim % 32))
                         ELSE CAST(0 AS BIGINT) END) AS w
              FROM comps c JOIN mn m USING (dim) GROUP BY 1, 2, 3),
    codes AS (SELECT vec_id, label AS cell, list(w ORDER BY word) AS codes
              FROM words GROUP BY vec_id, label),
    centd AS (SELECT label AS cell, dim,
                     CAST(SUM(CAST(x AS DECIMAL(27,7))) AS DOUBLE) / COUNT(*) AS c
              FROM comps GROUP BY label, dim),
    cent AS (SELECT cell, list(c ORDER BY dim) AS centroid FROM centd GROUP BY cell),
    qc AS (SELECT vec_id AS query_id, codes AS qcodes FROM codes
           WHERE vec_id >= 5 AND vec_id < 10),
    qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
           WHERE vec_id >= 5 AND vec_id < 10),
    cellrank AS (SELECT query_id, cell,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY {_cos("centroid", "qvec")} DESC, cell) AS crank
                 FROM qv, cent),
    probe AS (SELECT query_id, cell FROM cellrank WHERE crank <= 8),
    ham AS (SELECT q.query_id, c.vec_id AS neighbor_id,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(list_zip(c.codes, q.qcodes),
                  p -> CAST(bit_count(xor(p[1], p[2])) AS BIGINT))), (a, x) -> a + x)
                AS hamming
            FROM codes c JOIN probe p ON c.cell = p.cell
                 JOIN qc q ON q.query_id = p.query_id
            WHERE c.vec_id <> q.query_id),
    short AS (SELECT query_id, neighbor_id, hamming FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY hamming, neighbor_id) AS hr
                FROM ham) WHERE hr <= 50),
    rr AS (SELECT s.query_id, s.neighbor_id, s.hamming,
             {_cos("e.embedding", "v.qvec")} AS cosine
           FROM short s JOIN embeddings e ON e.vec_id = s.neighbor_id
                JOIN qv v ON v.query_id = s.query_id)
    SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming, cosine,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM rr)
    WHERE rn <= 10
    """,
    doc="IVF-BQ against a MATERIALIZED index (build_bq_index: means + "
    "centroids + 1-bit codes partitionBy(cell) + float vectors "
    "partitionBy(cell)): the probe reads persisted centroids, "
    "statically prunes BOTH the Hamming code scan and the re-rank "
    "vector scan to the top-2 probed cells per query (IN-list on the "
    "partition column), and touches float vectors only for the k x 5 "
    "shortlist — binarization, centroid build, and the corpus code "
    "pass are all off the query path. Distinct query set (vec_id "
    "5..9) from bq_ivf_rerank_topk.",
)
def bq_ivf_indexed_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    idx = _index_dir(sf, "bqivf")
    if not (
        os.path.exists(f"{idx}/centroids/_SUCCESS")
        and os.path.exists(f"{idx}/codes/_SUCCESS")
        and os.path.exists(f"{idx}/vectors/_SUCCESS")
        and os.path.exists(f"{idx}/means/_SUCCESS")
    ):
        SIM.build_bq_index(e, idx, "label", "vec_id", "embedding")
    q = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.bq_ivf_rerank_topk_indexed(
        spark, idx, q, "vec_id", "embedding", "query_id", k=10, oversample=5, nprobe=8
    )


# --- crawl politeness: RFC 9309 robots decisions over a URL frontier ---------

#: fixed robots rule set (host, allow, pattern) — hosts h5/h6 publish
#: no robots at all (default-allow path). The ORACLE carries each
#: pattern's regex as a literal, so the Spark side's declarative
#: pattern->regex compiler (operators/crawl.robots_pattern_regex) is
#: what the comparison actually tests.
_ROBOTS_RULES = [
    ("h0", False, "/private"),
    ("h0", True, "/private/files"),
    ("h1", False, "/"),
    ("h1", True, "/articles/*.html$"),
    ("h2", False, "/tmp/*"),
    ("h3", False, "/private"),
    ("h3", True, "/privat"),
    ("h4", False, "/articles/"),
    ("h4", True, "/articles/"),
]

_ROBOTS_RULES_SQL = """(VALUES
    ('h0', FALSE, '/private',           '^/private'),
    ('h0', TRUE,  '/private/files',     '^/private/files'),
    ('h1', FALSE, '/',                  '^/'),
    ('h1', TRUE,  '/articles/*.html$',  '^/articles/.*\\.html$'),
    ('h2', FALSE, '/tmp/*',             '^/tmp/.*'),
    ('h3', FALSE, '/private',           '^/private'),
    ('h3', TRUE,  '/privat',            '^/privat'),
    ('h4', FALSE, '/articles/',         '^/articles/'),
    ('h4', TRUE,  '/articles/',         '^/articles/')
  ) AS r(host, allow, pattern, rx)"""

_ROBOTS_PATHS_SQL = """CASE i % 6
      WHEN 0 THEN '/public/page' || i
      WHEN 1 THEN '/private/data' || i
      WHEN 2 THEN '/private/files/readme.html'
      WHEN 3 THEN '/tmp/cache' || i % 10
      WHEN 4 THEN '/articles/' || i || '.html'
      ELSE '/' END"""


@query(
    "robots_url_filter",
    oracle=f"""
    WITH urls AS (SELECT doc_id AS url_id, 'h' || (doc_id % 7) AS host,
                         {_ROBOTS_PATHS_SQL} AS path
                  FROM (SELECT doc_id AS i, doc_id FROM documents)),
    rules AS (SELECT * FROM {_ROBOTS_RULES_SQL}),
    cand AS (SELECT u.url_id, r.allow, r.pattern,
                    CAST(octet_length(encode(r.pattern)) AS BIGINT) AS plen
             FROM urls u JOIN rules r ON r.host = u.host
             WHERE regexp_matches(u.path, r.rx)),
    best AS (SELECT url_id, allow, pattern, plen FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY url_id
                 ORDER BY plen DESC, allow DESC, pattern) AS rn
               FROM cand) WHERE rn = 1)
    SELECT u.url_id, u.host, u.path,
           COALESCE(b.allow, TRUE) AS allowed,
           COALESCE(b.pattern, '') AS matched_pattern,
           CAST(COALESCE(b.plen, 0) AS BIGINT) AS matched_len
    FROM urls u LEFT JOIN best b ON b.url_id = u.url_id
    """,
    doc="RFC 9309 robots-exclusion decisions over a URL frontier — "
    "the crawl-politeness filter between the frontier and the "
    "WARC-fetch tier (operators/crawl.py): patterns compile to "
    "anchored regexes with one JVM-side regexp_replace chain "
    "(metachar escape, * -> .*, trailing $ -> end anchor), matching "
    "rules arrive by host equi-join, and the decision is the RFC's "
    "most-specific-match (longest pattern in octets, allow wins "
    "ties, no-match and no-robots-hosts default to allowed). The "
    "oracle carries HAND-WRITTEN regex literals per rule, so the "
    "declarative pattern compiler itself is under test. Fixture "
    "frontier covers prefix hits, wildcard spans, $-anchored "
    "extensions, allow-overrides-disallow, exact-length ties, and "
    "two no-robots hosts.",
)
def robots_url_filter(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.crawl import robots_decide

    d = t(spark, sf, "documents").select("doc_id")
    urls = d.select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        F.expr(
            _ROBOTS_PATHS_SQL.replace("i %", "doc_id %").replace("|| i", "|| doc_id")
        ).alias("path"),
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "host string, allow boolean, pattern string"
    )
    return robots_decide(urls, F.broadcast(rules))


#: raw robots.txt bodies whose PARSED, group-selected rules for
#: product token 'hms-bot' equal _ROBOTS_RULES exactly — exercising
#: exact-vs-* group precedence, shared-agent groups, case-insensitive
#: keys/agents, comments, blank lines, unknown directives, empty
#: Disallow no-ops, and a rule-less / absent robots.txt.
_ROBOTS_TXT = [
    (
        "h0",
        "# h0 robots\n"
        "User-Agent: hms-bot\n"
        "Disallow: /private\n"
        "Allow: /private/files\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /everything-else\n",  # shadowed: exact group wins
    ),
    (
        "h1",
        "User-agent: *\n"
        "Crawl-delay: 10\n"  # unknown directive ignored
        "Disallow: /\n"
        "Allow: /articles/*.html$\n",
    ),
    (
        "h2",
        "User-agent: HMS-BOT\n"  # agents case-insensitive
        "User-agent: otherbot\n"  # shared group
        "Disallow: /tmp/*  # temp junk\n"
        "\n"
        "User-agent: *\n"
        "Disallow:\n",  # empty Disallow = no rule
    ),
    (
        "h3",
        "user-agent: *\n"
        "disallow: /private\n"
        "allow: /privat\n",
    ),
    (
        "h4",
        "User-agent: hms-bot\n"
        "Disallow: /articles/\n"
        "Allow: /articles/\n",
    ),
    ("h5", "User-agent: *\nCrawl-delay: 5\n"),  # group with no rules
    ("h6", None),  # no robots.txt at all
]


@query(
    "robots_txt_pipeline",
    oracle=f"""
    WITH urls AS (SELECT doc_id AS url_id, 'h' || (doc_id % 7) AS host,
                         {_ROBOTS_PATHS_SQL} AS path
                  FROM (SELECT doc_id AS i, doc_id FROM documents)),
    rules AS (SELECT * FROM {_ROBOTS_RULES_SQL}),
    cand AS (SELECT u.url_id, r.allow, r.pattern,
                    CAST(octet_length(encode(r.pattern)) AS BIGINT) AS plen
             FROM urls u JOIN rules r ON r.host = u.host
             WHERE regexp_matches(u.path, r.rx)),
    best AS (SELECT url_id, allow, pattern, plen FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY url_id
                 ORDER BY plen DESC, allow DESC, pattern) AS rn
               FROM cand) WHERE rn = 1)
    SELECT u.url_id, u.host, u.path,
           COALESCE(b.allow, TRUE) AS allowed,
           COALESCE(b.pattern, '') AS matched_pattern,
           CAST(COALESCE(b.plen, 0) AS BIGINT) AS matched_len
    FROM urls u LEFT JOIN best b ON b.url_id = u.url_id
    """,
    doc="robots.txt END TO END (the completion of robots_url_filter, "
    "which starts from a rules table): RAW robots.txt text per host "
    "-> RFC 9309 §2.2 line parse (case-insensitive keys and agents, "
    "shared User-agent groups, comments, unknown directives, empty-"
    "Disallow no-ops, rule-less groups) -> §2.2.1 group selection "
    "for product token 'hms-bot' (exact group beats *, no group "
    "means crawl-allowed) -> the declarative most-specific-match "
    "decision over the same URL frontier. The fixture bodies are "
    "crafted so the selected rules equal robots_url_filter's literal "
    "table, so the oracle is shared — any parser or group-selection "
    "bug desynchronizes the decisions.",
)
def robots_txt_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.crawl import (
        robots_decide,
        robots_rules_from_txt,
    )

    d = t(spark, sf, "documents").select("doc_id")
    urls = d.select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        F.expr(
            _ROBOTS_PATHS_SQL.replace("i %", "doc_id %").replace("|| i", "|| doc_id")
        ).alias("path"),
    )
    robots = spark.createDataFrame(_ROBOTS_TXT, "host string, body string")
    rules = robots_rules_from_txt(robots, "hms-bot")
    return robots_decide(urls, F.broadcast(rules))


@query(
    "crawl_schedule",
    oracle="""
    WITH f AS (SELECT 'https://h' || (doc_id % 40) || '.example/p' || doc_id AS url,
                      'h' || (doc_id % 40) AS host, doc_id % 40 AS h
               FROM documents),
    d AS (SELECT url, host,
                 CASE WHEN h % 5 = 0 THEN (h % 3 + 1) * 1000
                      WHEN h % 11 = 0 THEN 1000
                      ELSE (h % 7) * 500 END AS delay_ms
          FROM f)
    SELECT url, host, CAST(delay_ms AS BIGINT) AS delay_ms,
           CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) - 1)
                * delay_ms AS BIGINT) AS fetch_offset_ms
    FROM d
    """,
    doc="Crawl politeness SCHEDULING — the hop between the robots-"
    "filtered frontier and the fetcher fleet (operators/crawl.py:"
    "parse_robots_delays/select_crawl_delay/fetch_schedule): "
    "group-scoped Crawl-delay parsing (the de-facto extension "
    "Bing/Yandex honor — decimal seconds stored as EXACT integer "
    "milliseconds, exact-token group beats *, malformed and negative "
    "values skip to the crawler's default interval; a Crawl-delay "
    "line closes a group exactly like a rule line), then per-host "
    "FIFO fetch offsets at that host's spacing — ONE host-keyed "
    "window, host-bounded delay table broadcast. The fixture plants "
    "all the parser traps (comments on delay lines, 'oops' and "
    "negative values, exact-vs-* precedence) and the oracle "
    "recomputes every offset in closed form.",
)
def crawl_schedule(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.crawl import (
        crawl_delays_from_txt,
        fetch_schedule,
    )

    rows = []
    for h in range(40):
        if h % 5 == 0:
            body = (
                f"User-agent: hms-bot\nCrawl-delay: {h % 3 + 1}\nDisallow: /x\n"
                "\nUser-agent: *\nCrawl-delay: 9\n"
            )
        elif h % 11 == 0:
            body = (
                "User-agent: *\nDisallow: /private\n"
                "Crawl-delay: oops\nCrawl-delay: -3\n"
            )
        else:
            body = f"User-agent: *\nCrawl-delay: {(h % 7) * 0.5:.1f} # be nice\n"
        rows.append((f"h{h}", body))
    robots = spark.createDataFrame(rows, "host string, body string")
    delays = crawl_delays_from_txt(robots, "hms-bot")
    d = t(spark, sf, "documents").select("doc_id")
    frontier = d.select(
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit(".example/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("doc_id") % 40).cast("string")).alias("host"),
    )
    return fetch_schedule(frontier, delays, default_delay_ms=1000)


@query(
    "sitemap_url_frontier",
    oracle=f"""
    WITH docs AS (SELECT doc_id AS i, 'h' || (doc_id % 7) AS host,
                         CASE WHEN doc_id % 3 = 0
                              THEN '/private/data' || doc_id
                              ELSE '/articles/' || doc_id || '.html' END AS path,
                         strftime(DATE '2024-01-01'
                                  + INTERVAL (doc_id % 365) DAY, '%Y-%m-%d')
                           AS lastmod,
                         CAST(doc_id % 10 AS DOUBLE) / 10.0 AS priority
                  FROM documents),
    rules AS (SELECT * FROM {_ROBOTS_RULES_SQL}),
    cand AS (SELECT d.i, r.allow,
                    CAST(octet_length(encode(r.pattern)) AS BIGINT) AS plen,
                    r.pattern
             FROM docs d JOIN rules r ON r.host = d.host
             WHERE regexp_matches(d.path, r.rx)),
    best AS (SELECT i, allow FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY i
                 ORDER BY plen DESC, allow DESC, pattern) AS rn
               FROM cand) WHERE rn = 1)
    SELECT d.i AS url_id, d.host,
           'https://' || d.host || d.path AS loc,
           d.lastmod, d.priority,
           COALESCE(b.allow, TRUE) AS allowed
    FROM docs d LEFT JOIN best b ON b.i = d.i
    """,
    doc="Sitemap-driven URL discovery chained into robots decisions "
    "— the frontier SOURCE side of the crawl family: per host a "
    "two-level sitemap tree is BUILT (a /sitemap.xml sitemapindex "
    "naming two child sitemaps, each child a urlset whose <url> "
    "blocks carry <loc>/<lastmod>/<priority> for that host's docs — "
    "deterministic halves, sorted string_agg) and then PARSED BACK "
    "fully declaratively (regexp_extract_all over <sitemap>/<url> "
    "blocks, per-block field extraction, explode — no Python "
    "anywhere), and the recovered frontier runs through the RFC "
    "9309 decision operator against the shared robots rule set. The "
    "oracle reconstructs the expected frontier + decisions straight "
    "from documents, so any index-recursion, XML-extraction, field-"
    "parse, or politeness bug moves rows. One doc in three sits "
    "under /private, so h0/h1/h3 disallow parts of their frontiers.",
)
def sitemap_url_frontier(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.crawl import robots_decide

    d = t(spark, sf, "documents").select("doc_id")
    urls = d.select(
        F.col("doc_id").alias("url_id"),
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("/private/data"), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("/articles/"), F.col("doc_id").cast("string"), F.lit(".html")
            )
        )
        .alias("path"),
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 365).cast("int")),
            "yyyy-MM-dd",
        ).alias("lastmod"),
        ((F.col("doc_id") % 10).cast("double") / 10.0).alias("priority"),
    )
    # BUILD the two-level sitemap tree: each host's docs split into
    # two child urlsets (by url_id parity), plus a /sitemap.xml index
    url_xml = urls.select(
        "host",
        (F.col("url_id") % 2).alias("half"),
        F.col("url_id").alias("uid"),
        F.concat(
            F.lit("<url><loc>https://"), F.col("host"), F.col("path"),
            F.lit("</loc><lastmod>"), F.col("lastmod"),
            F.lit("</lastmod><priority>"), F.col("priority").cast("string"),
            F.lit("</priority></url>"),
        ).alias("u"),
    )
    child = url_xml.groupBy("host", "half").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("uid", "u"))),
                    lambda s: s.getField("u"),
                ),
            ),
            F.lit("</urlset>"),
        ).alias("xml"),
        F.concat(F.lit("/sm/"), F.col("half").cast("string"), F.lit(".xml")).alias(
            "path"
        ),
    )
    index = child.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><sitemapindex>'),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.concat(
                                F.lit("<sitemap><loc>https://"), F.col("host"),
                                F.col("path"), F.lit("</loc></sitemap>"),
                            )
                        )
                    ),
                    lambda s: s,
                ),
            ),
            F.lit("</sitemapindex>"),
        ).alias("xml")
    )
    # PARSE BACK, declaratively: index -> child paths -> join child
    # xml -> <url> blocks -> fields
    child_refs = index.select(
        "host",
        F.explode(
            F.expr(
                "regexp_extract_all(xml, '<sitemap><loc>https://[^/]+(/[^<]*)</loc></sitemap>', 1)"
            )
        ).alias("path"),
    )
    blocks = child_refs.join(child, ["host", "path"]).select(
        "host",
        F.explode(
            F.expr("regexp_extract_all(xml, '<url>(.*?)</url>', 1)")
        ).alias("b"),
    )
    parsed = blocks.select(
        "host",
        F.regexp_extract("b", "<loc>https://[^/]+(/[^<]*)</loc>", 1).alias("path"),
        F.regexp_extract("b", "<loc>(https://[^<]*)</loc>", 1).alias("loc"),
        F.regexp_extract("b", "<lastmod>([^<]*)</lastmod>", 1).alias("lastmod"),
        F.regexp_extract("b", "<priority>([^<]*)</priority>", 1)
        .cast("double")
        .alias("priority"),
    )
    # recover url_id from the loc's trailing doc id (both path forms
    # end in the id before an optional .html suffix)
    parsed = parsed.withColumn(
        "url_id",
        F.regexp_extract("path", r"(\d+)(\.html)?$", 1).cast("bigint"),
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES, "host string, allow boolean, pattern string"
    )
    decided = robots_decide(
        parsed.select("url_id", "host", "path", "loc", "lastmod", "priority"),
        F.broadcast(rules),
    )
    return decided.select(
        "url_id", "host", "loc", "lastmod", "priority", "allowed"
    )


@query(
    "redirect_frontier",
    oracle=f"""
    WITH ids AS (SELECT doc_id AS i FROM documents),
    e AS (SELECT i AS src, CASE WHEN i % 10 = 8 THEN i + 1 ELSE i - 1 END AS dst
          FROM ids WHERE i % 10 IN (1, 2, 3, 8, 9)),
    h0 AS (SELECT i AS url_id, i AS cur, CAST(0 AS BIGINT) AS hops FROM ids),
    h1 AS (SELECT url_id, COALESCE(e.dst, h0.cur) AS cur,
                      hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
               FROM h0 LEFT JOIN e ON e.src = h0.cur),
    h2 AS (SELECT url_id, COALESCE(e.dst, h1.cur) AS cur,
                      hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
               FROM h1 LEFT JOIN e ON e.src = h1.cur),
    h3 AS (SELECT url_id, COALESCE(e.dst, h2.cur) AS cur,
                      hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
               FROM h2 LEFT JOIN e ON e.src = h2.cur),
    h4 AS (SELECT url_id, COALESCE(e.dst, h3.cur) AS cur,
                      hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
               FROM h3 LEFT JOIN e ON e.src = h3.cur),
    h5 AS (SELECT url_id, COALESCE(e.dst, h4.cur) AS cur,
                      hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
               FROM h4 LEFT JOIN e ON e.src = h4.cur),
    fin AS (SELECT h5.url_id, h5.cur, h5.hops, s.src IS NULL AS resolved
            FROM h5 LEFT JOIN (SELECT DISTINCT src FROM e) s ON s.src = h5.cur),
    canon AS (SELECT url_id,
                     CASE WHEN resolved THEN 'https://h' || CAST(cur % 7 AS VARCHAR)
                          || '.example.com/page/' || CAST(cur AS VARCHAR) END AS final_url,
                     hops AS n_hops, resolved
              FROM fin)
    SELECT url_id, final_url, n_hops, resolved,
           resolved AND url_id = MIN(url_id) OVER (PARTITION BY final_url) AS fetch
    FROM canon
    """,
    doc="HTTP 3xx redirect-chain resolution + canonical dedup — the "
    "missing hop between sitemap_url_frontier and WARC ingest: a "
    "synthetic Location edge set (url_id mod 10 in 1..3 chains down "
    "1-3 hops to a terminal; 8 and 9 redirect at each other, a "
    "permanent 2-cycle) resolves through resolve_redirects "
    "(operators/crawl.py — max_hops=5 unrolled left equi-joins, the "
    "bounded pointer-jump; a chain still holding an outgoing edge "
    "after 5 hops is unresolved = loop detection without visited-set "
    "state, the curl --max-redirs contract), the FINAL url runs "
    "through the url_canonicalize regex chain (scheme/case/www/"
    "fragment/utm normalization), and the frontier dedups on it: "
    "fetch = resolved and first url_id per canonical final url. The "
    "oracle recomputes chains/loops/canonical forms in closed form, "
    "so an off-by-one hop, a missed loop, or a canon regex bug moves "
    "rows.",
)
def redirect_frontier(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from hadoop_main_spark.operators.crawl import resolve_redirects

    d = t(spark, sf, "documents").select(F.col("doc_id").alias("url_id"))
    m = F.col("url_id") % 10
    edges = d.filter(m.isin(1, 2, 3, 8, 9)).select(
        F.col("url_id").alias("src"),
        F.when(m == 8, F.col("url_id") + 1)
        .otherwise(F.col("url_id") - 1)
        .alias("dst"),
    )
    res = resolve_redirects(d, edges, url_col="url_id", max_hops=5)
    raw = F.concat(
        F.lit("HTTPS://WWW.h"),
        (F.col("final_url") % 7).cast("string"),
        F.lit(".Example.COM/page/"),
        F.col("final_url").cast("string"),
        F.lit("?utm_source=r&ref=x#frag"),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(raw), "#.*$", ""),
                "(utm_[a-z]+|ref)=[^&]*&?",
                "",
            ),
            "[?&]+$",
            "",
        ),
        "^https://www\\.",
        "https://",
    )
    out = res.select(
        "url_id",
        F.when(F.col("resolved"), canon).alias("final_url"),
        F.col("n_hops").cast("bigint").alias("n_hops"),
        "resolved",
    )
    w = Window.partitionBy("final_url")
    return out.withColumn(
        "fetch", F.col("resolved") & (F.col("url_id") == F.min("url_id").over(w))
    )


def _cdc_oracle() -> str:
    """DuckDB twin of dedup.cdc_chunks + the per-lang dedup stats:
    the 16-term polynomial window hash unrolled with precomputed
    B^e mod M weights (every ord cast to BIGINT — INT32 products
    overflow), cuts where H %% divisor == 0 plus end-of-document,
    chunks by LAG over the cut positions, then per-(lang, digest)
    counts."""
    from hadoop_main_spark.operators.dedup import (
        CDC_BASE,
        CDC_DIVISOR,
        CDC_MOD,
        CDC_WINDOW,
    )

    terms = " + ".join(
        f"ord(substr(t, i + {j}, 1))::BIGINT * "
        f"{pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD)}"
        for j in range(CDC_WINDOW)
    )
    return f"""
    WITH d AS (SELECT doc_id, lang, COALESCE(text, '') AS t
               FROM documents WHERE length(COALESCE(text, '')) > 0),
    pos AS (SELECT doc_id, t, g.i AS i
            FROM d, LATERAL (SELECT unnest(generate_series(
                 1, length(t) - {CDC_WINDOW - 1})) AS i) g
            WHERE length(t) >= {CDC_WINDOW}),
    h AS (SELECT doc_id, i + {CDC_WINDOW - 1} AS cut,
                 ({terms}) % {CDC_MOD} AS hh
          FROM pos),
    cuts AS (SELECT doc_id, cut FROM h WHERE hh % {CDC_DIVISOR} = 0
             UNION SELECT doc_id, length(t) FROM d),
    seg AS (SELECT doc_id, cut AS e,
                   COALESCE(LAG(cut) OVER (PARTITION BY doc_id
                                           ORDER BY cut), 0) AS s
            FROM cuts),
    ck AS (SELECT d.lang, md5(substr(d.t, s + 1, e - s)) AS dg,
                  CAST(e - s AS BIGINT) AS ln
           FROM seg JOIN d USING (doc_id)),
    per AS (SELECT lang, dg, CAST(COUNT(*) AS BIGINT) AS cnt,
                   MIN(ln) AS ln
            FROM ck GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) AS BIGINT) AS n_unique_chunks,
           CAST(SUM(cnt * ln) AS BIGINT) AS chars_total,
           CAST(SUM((cnt - 1) * ln) AS BIGINT) AS chars_dedup
    FROM per GROUP BY lang ORDER BY lang
    """


@query(
    "cdc_chunk_dedup",
    bench=True,
    oracle=lambda sf_dir: _cdc_oracle(),
    doc="CONTENT-DEFINED CHUNKING dedup (LBFS, Muthitacharoen et al. "
    "SOSP'01 — the STORAGE-level dedup mechanism, a new modality "
    "beside the similarity family: exact_substr finds shared spans, "
    "CDC makes shared content storable ONCE): every document is cut "
    "where a 16-codepoint polynomial rolling hash hits 0 mod 64, so "
    "a shared region chunks identically in every document REGARDLESS "
    "OF OFFSET (the shift resistance fixed-size blocks lack); chunk "
    "md5s then dedup corpus-wide. Per language: chunk count, unique "
    "chunks, total chars, and the chars a chunk store would save — "
    "the mass-duplicated corpus makes the signal real. Arrow-batched "
    "kernel (one vectorized pass per doc, text never shuffles; only "
    "~60-byte digest rows do); the oracle replays the hash "
    "position-independently with unrolled B^e mod M weights, both "
    "trajectories exact.",
)
def cdc_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    ch = D.cdc_chunks(
        d.select("doc_id", "text").repartition(
            spark.sparkContext.defaultParallelism
        )
    )
    per = (
        ch.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "chunk_md5")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.min("chunk_len").cast("bigint").alias("ln"),
        )
    )
    return (
        per.groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.count("*").cast("bigint").alias("n_unique_chunks"),
            F.sum(F.col("cnt") * F.col("ln")).cast("bigint").alias("chars_total"),
            F.sum((F.col("cnt") - 1) * F.col("ln"))
            .cast("bigint")
            .alias("chars_dedup"),
        )
        .orderBy("lang")
    )


@query(
    "weighted_doc_sample",
    oracle="""
    WITH w AS (SELECT doc_id, lang, CAST(n_chars + 1 AS BIGINT) AS wt
               FROM documents),
    c AS (SELECT doc_id, lang, wt,
                 SUM(wt) OVER (ORDER BY doc_id) AS cw
          FROM w),
    t AS (SELECT CAST(SUM(wt) AS BIGINT) AS tot FROM w)
    SELECT doc_id, lang,
           CAST((cw * 37) // tot AS BIGINT) AS pick,
           CAST((cw * 37) // tot - ((cw - wt) * 37) // tot AS BIGINT)
             AS n_picks
    FROM c, t
    WHERE (cw * 37) // tot > ((cw - wt) * 37) // tot
    ORDER BY doc_id
    """,
    doc="EXACT-integer PPS SYSTEMATIC sample (Madow '49 — the "
    "data-mixing primitive beside domain_mix_weights and "
    "train_split: draw k=37 documents with inclusion probability "
    "proportional to size, here n_chars+1): rows in doc-id order "
    "accumulate integer weights and a row is selected iff its "
    "cumulative weight crosses one of the 37 equally spaced "
    "thresholds (n_picks = thresholds crossed: a row above total/k weight draws with multiplicity, sum(n_picks) == k exactly) — floor crossing in pure int64, so unlike float-key "
    "weighted reservoir sampling (Efraimidis-Spirakis) the draw "
    "replays bit-identically on any engine. The prefix sum is the "
    "two-phase range-bucketed grouped_prefix_sum (driver-held split "
    "points, never an unpartitioned window over the corpus); the "
    "total rides a broadcast one-row cross join. Exactly 37 rows.",
)
def weighted_doc_sample(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.transforms import (
        weighted_systematic_sample,
    )

    d = t(spark, sf, "documents").select(
        "doc_id", "lang", (F.col("n_chars") + 1).cast("bigint").alias("wt")
    )
    return (
        weighted_systematic_sample(d, "wt", k=37, order_col="doc_id")
        .select("doc_id", "lang", "pick", "n_picks")
        .orderBy("doc_id")
    )


@query(
    "stream_cdc_roundtrip",
    oracle=lambda sf_dir: _cdc_oracle(),
    doc="Streaming CDC ingest ON the driver gate (the chunk-store "
    "twin of stream_warc/pdf_roundtrip, and the streaming half of "
    "cdc_chunk_dedup): documents replay as two mtime-ordered parity "
    "waves through streaming/windows.py:cdc_chunks_stream_parquet — "
    "the SAME rolling-hash boundary kernel as the batch operator, "
    "exactly-once file sink — and the ACCUMULATED chunk table's "
    "per-language dedup stats must equal the batch closed-form "
    "oracle VERBATIM: a chunk lost at a batch boundary, a replayed "
    "double-write, or any stream-vs-batch boundary divergence moves "
    "a count. BUILD-COST NOTE: executes the streaming job at "
    "plan-build time. LOCAL-MODE CONTRACT: tempfile.mkdtemp().",
)
def stream_cdc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import cdc_chunks_stream_parquet

    d = t(spark, sf, "documents")
    root = tempfile.mkdtemp(prefix="streamcdc_")
    src = _write_parity_waves(d.select("doc_id", "text"), root, "doc_id")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cdc_chunks_stream_parquet(stream, f"{root}/out", f"{root}/ckpt")
    q.awaitTermination()
    ch = spark.read.parquet(f"{root}/out")
    per = (
        ch.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "chunk_md5")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.min("chunk_len").cast("bigint").alias("ln"),
        )
    )
    return (
        per.groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.count("*").cast("bigint").alias("n_unique_chunks"),
            F.sum(F.col("cnt") * F.col("ln")).cast("bigint").alias("chars_total"),
            F.sum((F.col("cnt") - 1) * F.col("ln"))
            .cast("bigint")
            .alias("chars_dedup"),
        )
        .orderBy("lang")
    )


def _cdc_delta_oracle() -> str:
    """DuckDB twin of cdc_delta_transfer: the CDC chunking replayed
    TWICE — crawl 1 on the raw text, crawl 2 with every 3rd doc
    prefixed 'v2 ' — then crawl 2's chunks anti-joined against crawl
    1's distinct digest store."""
    from hadoop_main_spark.operators.dedup import (
        CDC_BASE,
        CDC_DIVISOR,
        CDC_MOD,
        CDC_WINDOW,
    )

    terms = " + ".join(
        f"ord(substr(t, i + {j}, 1))::BIGINT * "
        f"{pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD)}"
        for j in range(CDC_WINDOW)
    )

    def chain(n: str, src: str) -> str:
        return f"""
    pos{n} AS (SELECT doc_id, t, g.i AS i
            FROM {src}, LATERAL (SELECT unnest(generate_series(
                 1, length(t) - {CDC_WINDOW - 1})) AS i) g
            WHERE length(t) >= {CDC_WINDOW}),
    h{n} AS (SELECT doc_id, i + {CDC_WINDOW - 1} AS cut,
                 ({terms}) % {CDC_MOD} AS hh
          FROM pos{n}),
    cuts{n} AS (SELECT doc_id, cut FROM h{n} WHERE hh % {CDC_DIVISOR} = 0
             UNION SELECT doc_id, length(t) FROM {src}),
    seg{n} AS (SELECT doc_id, cut AS e,
                   COALESCE(LAG(cut) OVER (PARTITION BY doc_id
                                           ORDER BY cut), 0) AS s
            FROM cuts{n}),
    ck{n} AS (SELECT d.doc_id, d.lang, md5(substr(d.t, s + 1, e - s)) AS dg,
                  CAST(e - s AS BIGINT) AS ln
           FROM seg{n} JOIN {src} d USING (doc_id))"""

    return f"""
    WITH d1 AS (SELECT doc_id, lang, COALESCE(text, '') AS t
               FROM documents WHERE length(COALESCE(text, '')) > 0),
    d2 AS (SELECT doc_id, lang,
                  CASE WHEN doc_id % 3 = 0
                       THEN 'v2 ' || COALESCE(text, '')
                       ELSE COALESCE(text, '') END AS t
           FROM documents
           WHERE length(CASE WHEN doc_id % 3 = 0
                             THEN 'v2 ' || COALESCE(text, '')
                             ELSE COALESCE(text, '') END) > 0),
    {chain('1', 'd1')},
    {chain('2', 'd2')},
    store AS (SELECT DISTINCT dg FROM ck1),
    per AS (SELECT lang, dg, CAST(COUNT(*) AS BIGINT) AS cnt, MIN(ln) AS ln,
                   CAST(dg NOT IN (SELECT dg FROM store) AS BIGINT) AS is_new
            FROM ck2 GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_chunks,
           CAST(SUM(is_new) AS BIGINT) AS n_new_chunks,
           CAST(SUM(cnt * ln) AS BIGINT) AS chars_total,
           CAST(SUM(is_new * ln) AS BIGINT) AS chars_uploaded
    FROM per GROUP BY lang ORDER BY lang
    """


@query(
    "cdc_delta_transfer",
    oracle=lambda sf_dir: _cdc_delta_oracle(),
    doc="INCREMENTAL TRANSFER over a content-addressed chunk store "
    "(the rsync/casync mechanism — CDC's operational payoff, "
    "composing cdc_chunks with the versioned snapshot sink the way "
    "recrawl_maintenance composes revisit records with incremental "
    "clustering): crawl 1's distinct chunk digests commit as a "
    "versioned store snapshot; the recrawl (every 3rd doc changed "
    "with a 'v2 ' prefix) re-chunks and uploads ONLY digests absent "
    "from the store. Because CDC boundaries are shift-resistant, a "
    "changed document re-uploads just the chunks its edit actually "
    "touched — per language the output pins total chars vs uploaded "
    "chars (the delta-transfer win, typically a few chunks per "
    "changed doc), and the oracle replays BOTH chunkings plus the "
    "store anti-join closed-form. LOCAL-MODE CONTRACT: "
    "tempfile.mkdtemp() snapshot dir.",
)
def cdc_delta_transfer(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.sources.versioned import read_version, write_version

    par = spark.sparkContext.defaultParallelism
    d = t(spark, sf, "documents")
    c1 = D.cdc_chunks(
        d.select("doc_id", "text").repartition(par)
    )
    snap = tempfile.mkdtemp(prefix="cdcstore_")
    write_version(
        c1.select(F.col("chunk_md5").alias("dg")).distinct(), snap
    )
    t2 = F.when(
        F.pmod(F.col("doc_id"), F.lit(3)) == 0,
        F.concat(F.lit("v2 "), F.coalesce(F.col("text"), F.lit(""))),
    ).otherwise(F.col("text"))
    c2 = D.cdc_chunks(
        d.select("doc_id", t2.alias("text")).repartition(par)
    )
    store = read_version(spark, snap).select(
        F.col("dg").alias("chunk_md5"), F.lit(True).alias("__in_store")
    )
    per = (
        c2.join(d.select("doc_id", "lang"), "doc_id")
        .join(store, "chunk_md5", "left")
        .groupBy("lang", "chunk_md5")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.min("chunk_len").cast("bigint").alias("ln"),
            F.max(F.col("__in_store").isNull().cast("bigint")).alias("is_new"),
        )
    )
    return (
        per.groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.sum("is_new").cast("bigint").alias("n_new_chunks"),
            F.sum(F.col("cnt") * F.col("ln")).cast("bigint").alias("chars_total"),
            F.sum(F.col("is_new") * F.col("ln"))
            .cast("bigint")
            .alias("chars_uploaded"),
        )
        .orderBy("lang")
    )


_HITS_SCALE = 10**6
_HITS_BOUND = (2**63 - 1) // _HITS_SCALE


@query(
    "hits_top20",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> [tk[i], tk[i+1]])) AS pr
           FROM toks),
    e AS (SELECT DISTINCT pr[1] AS src, pr[2] AS dst FROM bg WHERE pr[1] <> pr[2]),
    nodes AS (SELECT DISTINCT unnest(tk) AS v FROM toks),
    a1r AS (SELECT dst AS v, SUM(CAST({_HITS_SCALE} AS BIGINT)) AS ar
            FROM e GROUP BY dst),
    a1m AS (SELECT MAX(ar) AS m FROM a1r),
    a1 AS (SELECT nodes.v,
                  CASE WHEN coalesce(m, 0) <= 0 THEN 0
                       ELSE (coalesce(ar, 0) * {_HITS_SCALE}) // m END AS a
           FROM nodes LEFT JOIN a1r USING (v) CROSS JOIN a1m),
    h1r AS (SELECT e.src AS v, SUM(a1.a) AS hr
            FROM e JOIN a1 ON a1.v = e.dst GROUP BY e.src),
    h1m AS (SELECT MAX(hr) AS m FROM h1r),
    h1 AS (SELECT nodes.v,
                  CASE WHEN coalesce(m, 0) <= 0 THEN 0
                       ELSE (coalesce(hr, 0) * {_HITS_SCALE}) // m END AS h
           FROM nodes LEFT JOIN h1r USING (v) CROSS JOIN h1m),
    a2r AS (SELECT e.dst AS v, SUM(h1.h) AS ar
            FROM e JOIN h1 ON h1.v = e.src GROUP BY e.dst),
    a2m AS (SELECT MAX(ar) AS m FROM a2r),
    a2 AS (SELECT nodes.v,
                  CASE WHEN coalesce(m, 0) <= 0 THEN 0
                       ELSE (coalesce(ar, 0) * {_HITS_SCALE}) // m END AS a
           FROM nodes LEFT JOIN a2r USING (v) CROSS JOIN a2m),
    h2r AS (SELECT e.src AS v, SUM(a2.a) AS hr
            FROM e JOIN a2 ON a2.v = e.dst GROUP BY e.src),
    h2m AS (SELECT MAX(hr) AS m FROM h2r),
    h2 AS (SELECT nodes.v,
                  CASE WHEN coalesce(m, 0) <= 0 THEN 0
                       ELSE (coalesce(hr, 0) * {_HITS_SCALE}) // m END AS h
           FROM nodes LEFT JOIN h2r USING (v) CROSS JOIN h2m)
    SELECT a2.v AS token, CAST(a2.a AS BIGINT) AS auth,
           CAST(h2.h AS BIGINT) AS hub
    FROM a2 JOIN h2 ON a2.v = h2.v
    ORDER BY auth DESC, token LIMIT 20
    """,
    doc="HITS hubs/authorities (Kleinberg JACM'99, 2 iterations) over "
    "the directed token-adjacency graph — the link-analysis scorer "
    "beside pagerank_top20, completing the classic pair. Kleinberg's "
    "L2 normalization needs a sqrt, so this uses the L-INFINITY norm "
    "(max rescaled to exactly 1e6 per half-step; any p-norm preserves "
    "the fixpoint direction) and every intermediate stays a BIGINT "
    "both engines compute bit-identically (operators/graph.py:"
    "hits_int). The rescale multiply is overflow-GUARDED with "
    "raise_error — non-ANSI Spark would wrap silently to a wrong "
    "answer; a float HITS would drift by ulps per iteration. Each "
    "half-iteration = one edge-keyed join + one partial-agg shuffle; "
    "the L-inf max rides as a one-row broadcast.",
)
def hits_top20(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint
    from hadoop_main_spark.operators.graph import hits_int
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram")).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("src"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("dst"),
    )
    # lazy-checkpointed like pagerank_top20's tables: the 4 half-step
    # joins consume edges/nodes from many branches with differing
    # pushdowns; both tables are vocabulary-bounded
    edges = supersede_checkpoint(
        "hits_top20.edges",
        bg.filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False),
    )
    nodes = supersede_checkpoint(
        "hits_top20.nodes",
        d.select(F.explode(tokenize("text")).alias("v"))
        .distinct()
        .localCheckpoint(eager=False),
    )
    scored = hits_int(edges, nodes, iterations=2, scale=_HITS_SCALE)
    return (
        scored.select(
            F.col("v").alias("token"),
            F.col("auth").cast("bigint").alias("auth"),
            F.col("hub").cast("bigint").alias("hub"),
        )
        .orderBy(F.desc("auth"), F.asc("token"))
        .limit(20)
    )


@query(
    "phrase_search",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    tri AS (SELECT unnest(list_transform(
              generate_series(1, greatest(len(tk) - 2, 0)),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ph
            FROM toks),
    top AS (SELECT ph, COUNT(*) AS c FROM tri GROUP BY ph
            ORDER BY c DESC, ph LIMIT 1),
    m AS (SELECT t.doc_id, top.ph,
                 list_filter(
                   generate_series(1, greatest(len(tk) - 2, 0)),
                   i -> tk[i] = split_part(top.ph, ' ', 1)
                        AND tk[i+1] = split_part(top.ph, ' ', 2)
                        AND tk[i+2] = split_part(top.ph, ' ', 3)) AS hits
          FROM toks t CROSS JOIN top)
    SELECT ph AS phrase, doc_id,
           CAST(len(hits) AS BIGINT) AS n_matches,
           CAST(hits[1] - 1 AS BIGINT) AS first_pos
    FROM m WHERE len(hits) > 0 ORDER BY doc_id
    """,
    doc="Exact PHRASE QUERY over the positional inverted index — the "
    "retrieval capability the inverted_index build exists to serve: "
    "the corpus's most frequent word trigram (count desc, lexical "
    "tie-break — a one-row broadcast) is matched by POSITIONAL "
    "POSTING INTERSECTION, the search-engine algorithm: each posting "
    "for phrase term j at position p votes for start p-j, and a "
    "start with all 3 DISTINCT slots present is a match (offset "
    "alignment instead of a 3-way self-join — one shuffle, and "
    "duplicate terms inside the phrase are handled by the distinct "
    "count). The ORACLE matches by a direct per-document token-array "
    "scan — an INDEPENDENT algorithm, not a replay (the suffix-array "
    "verification discipline), so a postings off-by-one cannot "
    "self-confirm. Scale: postings are filtered to the 3 phrase "
    "terms by a broadcast semi-ish join BEFORE any shuffle; the "
    "(doc, start) agg touches only surviving postings.",
)
def phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    tri = d.select(F.explode(D.word_shingles("text", 3)).alias("ph"))
    top = (
        tri.groupBy("ph")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.desc("__c"), F.asc("ph"))
        .limit(1)
    )
    slots = top.select(
        "ph",
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.split_part(F.col("ph"), F.lit(" "), F.lit(j + 1)).alias(
                            "term"
                        ),
                        F.lit(j).alias("slot"),
                    )
                    for j in range(3)
                )
            )
        ).alias("__s"),
    ).select("ph", F.col("__s.term").alias("term"), F.col("__s.slot").alias("slot"))
    pos = d.select(
        "doc_id", F.posexplode(tokenize("text")).alias("pos", "term")
    )
    cand = (
        pos.join(F.broadcast(slots), "term")
        .select("ph", "doc_id", (F.col("pos") - F.col("slot")).alias("start"), "slot")
        .filter(F.col("start") >= 0)
    )
    m = (
        cand.groupBy("ph", "doc_id", "start")
        .agg(F.count_distinct("slot").alias("__ns"))
        .filter(F.col("__ns") == 3)
    )
    return (
        m.groupBy("ph", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_matches"),
            F.min("start").cast("bigint").alias("first_pos"),
        )
        .select(F.col("ph").alias("phrase"), "doc_id", "n_matches", "first_pos")
        .orderBy("doc_id")
    )


_SNM_NORM = "regexp_replace(lower(text), '[^a-z0-9]', '', 'g')"


@query(
    "sorted_neighborhood_dedup",
    oracle=f"""
    WITH k AS (SELECT doc_id,
                      substr({_SNM_NORM}, 1, 12) AS kk,
                      substr({_SNM_NORM}, 1, 64) AS pp
               FROM documents),
    r AS (SELECT doc_id, pp,
                 row_number() OVER (ORDER BY kk, doc_id) AS rk
          FROM k)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.pp, b.pp) AS BIGINT) AS dist,
           levenshtein(a.pp, b.pp) <= 16 AS is_dup
    FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3
    ORDER BY id_a, id_b
    """,
    doc="Sorted-neighborhood dedup (Hernandez & Stolfo SIGMOD'95 — "
    "the classic record-linkage BLOCKING modality beside the LSH "
    "families: deterministic, exactly w=3 candidate rows per "
    "document, a hot blocking key degrades pair quality never row "
    "count). Blocking key = first 12 chars of the lowercased "
    "alphanumeric squash; global order via sorting.global_rank (the "
    "TotalOrderPartitioner machinery — sampled split points + "
    "bucket-local row_number, never a single-task window); neighbors "
    "within w by an exact-rank EQUI-join (rank+offset explode), not "
    "a range join; verify = bounded-prefix Levenshtein over 64 "
    "normalized chars (O(64^2) per pair, constant). The oracle "
    "replays the order with row_number and pairs via a rank RANGE "
    "join — a different join algorithm over the same contract.",
)
def sorted_neighborhood_dedup(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    pairs = D.snm_candidate_pairs(d, window=3, key_len=12, probe_len=64)
    return pairs.select(
        "id_a",
        "id_b",
        F.col("dist").cast("bigint").alias("dist"),
        (F.col("dist") <= 16).alias("is_dup"),
    ).orderBy("id_a", "id_b")


@query(
    "stream_agg_view_roundtrip",
    oracle="""
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS sum_cents,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    doc="Streaming incremental VIEW MAINTENANCE on the driver gate "
    "(the materialized-view twin of the WARC/PDF/CDC stream "
    "roundtrips, and the streaming half of "
    "incremental_agg_maintenance): events replay as two "
    "mtime-ordered parity waves through streaming/windows.py:"
    "agg_view_stream_parquet — foreachBatch runs the IDENTICAL "
    "merge_partial_aggs combine as the batch maintainer, with the "
    "(ckpt_id, last_batch) high-water replay guard because an "
    "additive merge is not idempotent — and the MAINTAINED view "
    "must equal the from-scratch GROUP BY over all events VERBATIM "
    "(one-shot equality): a double-applied wave, a lost view key at "
    "a batch boundary, or a combine-algebra error moves a count. "
    "BUILD-COST NOTE: executes the streaming job at plan-build "
    "time. LOCAL-MODE CONTRACT: tempfile.mkdtemp().",
)
def stream_agg_view_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from hadoop_main_spark.streaming.windows import (
        agg_view_stream_parquet,
        read_agg_view,
    )

    e = t(spark, sf, "events").select(
        "user_id", "event_type", "event_id", "value"
    )
    root = tempfile.mkdtemp(prefix="streamaggview_")
    src = _write_parity_waves(e, root, "event_id")
    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = agg_view_stream_parquet(stream, f"{root}/out", f"{root}/ckpt")
    q.awaitTermination()
    return read_agg_view(spark, f"{root}/out").orderBy("user_id", "event_type")


_SSJ_B = 8  # pigeonhole buckets: 7-subset bands complete while |a|+|b| < 78
# all (B-1)-subsets of buckets: a Jaccard>=19/20 pair differs in <= 1
# token ((|a|+|b|)/39 < 2 under the size guard), hence agrees on >= 7
# buckets, hence matches SOME 7-subset band
import itertools as _it  # noqa: E402

_SSJ_COMBOS = tuple(_it.combinations(range(_SSJ_B), _SSJ_B - 1))


@query(
    "set_similarity_join",
    oracle=f"""
    WITH toks AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS tk
                  FROM documents),
    fp AS (SELECT doc_id,
                  {hash64_sql("list_aggregate(list_sort(list(tk)), 'string_agg', ' ')")}
                    AS f
           FROM toks GROUP BY doc_id),
    grp AS (SELECT f, MIN(doc_id) AS rep,
                   CAST(COUNT(*) AS BIGINT) AS grp_size
            FROM fp GROUP BY f),
    gt AS (SELECT g.rep, t.tk FROM grp g JOIN toks t ON t.doc_id = g.rep),
    sz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS n FROM gt GROUP BY rep),
    bp AS (SELECT rep, {hash64_sql("tk")} % {{B}} AS bi, tk FROM gt),
    sp AS (SELECT rep, bi,
                  {hash64_sql("list_aggregate(list_sort(list(tk)), 'string_agg', ' ')")}
                    AS sig
           FROM bp GROUP BY rep, bi),
    sigs AS (SELECT sz.rep, b.bi, coalesce(sp.sig, -1) AS sig
             FROM sz CROSS JOIN (SELECT unnest(generate_series(0, {{Bm1}}))
                                 AS bi) b
             LEFT JOIN sp ON sp.rep = sz.rep AND sp.bi = b.bi),
    ordv AS (SELECT rep, list(sig ORDER BY bi) AS sv FROM sigs GROUP BY rep),
    bands AS (
      {{BANDS}}),
    cand AS (SELECT DISTINCT a.rep AS ra, b.rep AS rb
             FROM bands a JOIN bands b
               ON a.cid = b.cid AND a.h = b.h AND a.rep < b.rep),
    inter AS (SELECT c.ra, c.rb, CAST(COUNT(*) AS BIGINT) AS i
              FROM cand c
              JOIN gt ta ON ta.rep = c.ra
              JOIN gt tb ON tb.rep = c.rb AND tb.tk = ta.tk
              GROUP BY c.ra, c.rb)
    SELECT i.ra AS rep_a, i.rb AS rep_b, i.i AS inter_size,
           sa.n + sb.n - i.i AS union_size,
           ga.grp_size AS size_a, gb.grp_size AS size_b
    FROM inter i
    JOIN sz sa ON sa.rep = i.ra JOIN sz sb ON sb.rep = i.rb
    JOIN grp ga ON ga.rep = i.ra JOIN grp gb ON gb.rep = i.rb
    WHERE 39 * i.i >= 19 * (sa.n + sb.n)
    ORDER BY rep_a, rep_b
    """.replace("{B}", str(_SSJ_B)).replace("{Bm1}", str(_SSJ_B - 1)).replace(
        "{BANDS}",
        '''SELECT rep, 0 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[2] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[7] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 1 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[2] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 2 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[2] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[7] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 3 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[2] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[7] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 4 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[2] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[7] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 5 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[2] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[7] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 6 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[1] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[7] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv
      UNION ALL
      SELECT rep, 7 AS cid, CAST(concat('0x', substr(md5(concat_ws('_', CAST(sv[2] AS VARCHAR), CAST(sv[3] AS VARCHAR), CAST(sv[4] AS VARCHAR), CAST(sv[5] AS VARCHAR), CAST(sv[6] AS VARCHAR), CAST(sv[7] AS VARCHAR), CAST(sv[8] AS VARCHAR))), 1, 15)) AS BIGINT) AS h FROM ordv''',
    ),
    doc="EXACT set-similarity join at Jaccard >= 19/20 via PIGEONHOLE "
    "bucket-subset BANDS (the set-domain member of the "
    "hamming_band_pairs family — zero false negatives AND zero "
    "false positives, unlike dedup_minhash_lsh): token SETS dedup "
    "to canonical GROUPS first (identical-set corpora stay "
    "output-linear — the dhash discipline), the TOKEN VOCABULARY "
    "partitions into 8 deterministic hash buckets, each group "
    "carries one sub-signature per bucket (empty bucket = sentinel "
    "-1, so empty==empty counts as agreement), and candidates come "
    "from equi-joining the C(8,7)=8 SEVEN-bucket band signatures: "
    "Jaccard >= 19/20 bounds the symmetric difference to "
    "(|a|+|b|)/39 <= 1 token under the size guard, corrupting at "
    "most ONE bucket, so a similar pair agrees on >= 7 buckets and "
    "matches SOME 7-subset band — complete while |a|+|b| < 78, "
    "ENFORCED by a raise_error size guard (loud, never silently "
    "incomplete). Band enumeration matters on this adversarially "
    "self-similar corpus (~100-word vocabulary): classic PPJoin "
    "rarity prefixes emit 6.7M candidates and single-bucket "
    "banding 7.0M, while 7-of-8 bands enumerate only the "
    "near-identical clusters. Verification is exact integer "
    "cross-multiplication (39*|inter| >= 19*(|a|+|b|)) over an "
    "equi-join of candidate token lists — never a float ratio.",
)
def set_similarity_join(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint
    from hadoop_main_spark.operators.transforms import tokenize

    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(tokenize("text")).alias("tk")
    ).distinct()
    fp = toks.groupBy("doc_id").agg(
        hash64(F.array_join(F.array_sort(F.collect_list("tk")), " ")).alias("f")
    )
    grp = fp.groupBy("f").agg(
        F.min("doc_id").alias("rep"),
        F.count("*").cast("bigint").alias("grp_size"),
    )
    # group-representative token table: feeds sizes, signatures and
    # BOTH verification branches with different pushdowns — checkpoint
    # once (the pagerank/pmi discipline); vocabulary x distinct-set
    # bounded
    gt = supersede_checkpoint(
        "set_similarity_join.gt",
        grp.select("rep")
        .join(toks.withColumnRenamed("doc_id", "rep"), "rep")
        .localCheckpoint(eager=False),
    )
    # completeness guard: the 7-subset bands tolerate ONE corrupted
    # bucket, i.e. (|a|+|b|)/39 <= 1; any set over 38 tokens could
    # silently miss pairs — raise instead
    bound = 38
    sz = gt.groupBy("rep").agg(
        F.when(
            F.count("*") > bound,
            F.raise_error(
                f"set_similarity_join: a token set exceeds {bound} "
                "tokens — widen _SSJ_COMBOS to keep the pigeonhole "
                "guarantee"
            ).cast("bigint"),
        )
        .otherwise(F.count("*"))
        .cast("bigint")
        .alias("n")
    )
    sp = (
        gt.select("rep", F.pmod(hash64("tk"), F.lit(_SSJ_B)).alias("bi"), "tk")
        .groupBy("rep", "bi")
        .agg(
            hash64(
                F.array_join(F.array_sort(F.collect_list("tk")), " ")
            ).alias("sig")
        )
    )
    sigs = (
        sz.select("rep")
        .select(
            "rep",
            F.explode(F.array(*(F.lit(i) for i in range(_SSJ_B)))).alias("bi"),
        )
        .join(sp, ["rep", "bi"], "left")
        .select("rep", "bi", F.coalesce("sig", F.lit(-1)).alias("sig"))
    )
    # band enumeration instead of pair-agreement counting: a pair
    # agreeing on >= 7 buckets appears in SOME 7-subset band, so the
    # equi-join only ever materializes near-identical clusters — the
    # ~7M pairs agreeing on just one hot bucket never exist
    ordered = sigs.groupBy("rep").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bi", "sig"))),
            lambda x: x["sig"],
        ).alias("sv")
    )
    bands = ordered.select(
        "rep",
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(ci).alias("cid"),
                        hash64(
                            F.concat_ws(
                                "_",
                                *(F.col("sv")[i].cast("string") for i in combo),
                            )
                        ).alias("h"),
                    )
                    for ci, combo in enumerate(_SSJ_COMBOS)
                )
            )
        ).alias("b"),
    ).select("rep", F.col("b.cid").alias("cid"), F.col("b.h").alias("h"))
    cand = (
        bands.select(F.col("rep").alias("ra"), "cid", "h")
        .join(bands.select(F.col("rep").alias("rb"), "cid", "h"), ["cid", "h"])
        .filter(F.col("ra") < F.col("rb"))
        .select("ra", "rb")
        .distinct()
    )
    inter = (
        cand.join(gt.select(F.col("rep").alias("ra"), "tk"), "ra")
        .join(gt.select(F.col("rep").alias("rb"), "tk"), ["rb", "tk"])
        .groupBy("ra", "rb")
        .agg(F.count("*").cast("bigint").alias("i"))
    )
    sa = sz.select(F.col("rep").alias("ra"), F.col("n").alias("na"))
    sb = sz.select(F.col("rep").alias("rb"), F.col("n").alias("nb"))
    ga = grp.select(F.col("rep").alias("ra"), F.col("grp_size").alias("size_a"))
    gb = grp.select(F.col("rep").alias("rb"), F.col("grp_size").alias("size_b"))
    return (
        inter.join(sa, "ra")
        .join(sb, "rb")
        .join(ga, "ra")
        .join(gb, "rb")
        .filter(39 * F.col("i") >= 19 * (F.col("na") + F.col("nb")))
        .select(
            F.col("ra").alias("rep_a"),
            F.col("rb").alias("rep_b"),
            F.col("i").alias("inter_size"),
            (F.col("na") + F.col("nb") - F.col("i")).alias("union_size"),
            "size_a",
            "size_b",
        )
        .orderBy("rep_a", "rep_b")
    )


@query(
    "heavy_hitters_sketch",
    oracle=f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    bg AS (SELECT unnest(list_transform(
             generate_series(1, greatest(len(tk) - 1, 0)),
             i -> tk[i] || ' ' || tk[i+1])) AS bigram
           FROM toks)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM bg GROUP BY bigram HAVING COUNT(*) >= 40
    ORDER BY bigram
    """,
    doc="Sketch-accelerated EXACT heavy hitters at absolute support "
    ">= 40 (the collocation min-count discipline pmi_topk uses): a "
    "count-min sketch (4x4096, mergeable integer counters — "
    "functions/sketches.py, widened so expected per-bucket load "
    "keeps estimates near-exact) BROADCASTS back over the bigram "
    "stream and every occurrence probes it MAP-SIDE via 4 broadcast "
    "hash joins + least() — rows whose upper-bound estimate is "
    "under the support never reach the exact aggregation, so the "
    "key-space shuffle at 100 TB carries only candidate "
    "occurrences (the long tail of sub-support keys — the bulk of "
    "a real corpus — dies map-side). Count-min never "
    "under-estimates, so the prefilter provably drops NO true "
    "heavy hitter; the exact count re-check drops "
    "collision-inflated false positives. The ORACLE is the plain "
    "exact GROUP BY/HAVING — fully INDEPENDENT of the sketch path "
    "(the phrase_search discipline), so any sketch-induced error "
    "surfaces as a mismatch.",
)
def heavy_hitters_sketch(spark: SparkSession, sf: str) -> DataFrame:
    from hadoop_main_spark.functions.hashing import hash64
    from hadoop_main_spark.functions.sketches import CM_DEPTH, count_min_table
    from hadoop_main_spark.operators.checkpoints import supersede_checkpoint

    support = 40
    width = 4096
    d = t(spark, sf, "documents")
    bg = d.select(F.explode(D.word_shingles("text", 2)).alias("bigram"))
    # the sketch build and the probe pass both scan the bigram
    # explode; the sketch itself is <= depth*width rows
    sk = supersede_checkpoint(
        "heavy_hitters_sketch.cm",
        count_min_table(bg, "bigram", width=width).localCheckpoint(eager=False),
    )
    probed = bg
    ests = []
    for j in range(CM_DEPTH):
        skj = sk.filter(F.col("row") == j).select(
            F.col("bucket").alias(f"__b{j}"), F.col("cnt").alias(f"__c{j}")
        )
        probed = probed.withColumn(
            f"__b{j}", hash64("bigram", salt=f"cm{j}") % width
        ).join(F.broadcast(skj), f"__b{j}", "left")
        ests.append(F.coalesce(F.col(f"__c{j}"), F.lit(0)))
    survivors = probed.filter(F.least(*ests) >= support).select("bigram")
    return (
        survivors.groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") >= support)
        .orderBy("bigram")
    )
