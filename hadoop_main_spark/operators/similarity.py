"""Similarity search over embedding columns (array<float>).

North-star extension: brute-force cosine top-k as the exact
baseline, and an IVF (inverted-file) variant as the scale path —
probe only the nearest centroid cells instead of the full corpus.

All arithmetic is JVM-side Catalyst higher-order functions
(zip_with/aggregate = sequential left fold — bit-identical to a
DuckDB list_reduce fold, which is what the oracles use; verified:
DuckDB's builtin list_dot_product sums in a different order and
does NOT match). Centroids are computed with DECIMAL-exact
per-dimension sums so they are independent of partitioning.

Scale notes: queries are broadcast (they are the small side by
construction); the corpus is never shuffled for brute force — one
narrow pass + a top-k aggregation. IVF turns that into a pruned
join on cell id. For 100 TB, IVF cells should be written
partitioned-by-cell so probes prune at the file level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

DEC_CENTROID = "decimal(27,7)"


def fdot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two float arrays (as double)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def fnorm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; zero-norm vectors yield NULL, never NaN —
    Spark orders NaN ABOVE every real double, so an unguarded zero
    vector (padding row, failed encoder) would rank as the #1
    neighbor of every query and pass every min_cosine filter. NULL
    instead sorts last under DESC and fails >= filters."""
    # nullif evaluates the denominator ONCE (a when(denom > 0, ...)
    # guard pays the two norm folds twice)
    return fdot(a, b) / F.nullif(fnorm(a) * fnorm(b), F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id, vec_col) — broadcast; corpus scanned once,
    no shuffle until the final per-query top-k (tiny). Self-matches
    (query_id == corpus id) excluded. Ties broken by neighbor id.
    """
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col))
        .join(broadcast(q), F.col("neighbor_id") != F.col(query_id))
        .select(
            query_id,
            "neighbor_id",
            cosine(vec_col, "__qv").alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "cosine")
    )


# --- IVF ---------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame, cell_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell centroid with DECIMAL-exact component sums (portable,
    partitioning-independent). ``cell_col`` is the coarse quantizer
    cell (here: any categorical assignment, e.g. a prior clustering
    or the dataset's label column)."""
    dim = F.posexplode(F.col(vec_col))
    comps = corpus.select(F.col(cell_col).alias("cell"), dim.alias("dim", "x"))
    cent = comps.groupBy("cell", "dim").agg(
        (F.sum(F.col("x").cast(DEC_CENTROID)).cast("double") / F.count("*")).alias("c")
    )
    return cent.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s.getField("c")
        ).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: rank cells by query-centroid cosine, probe the top
    ``nprobe`` cells, brute-force within. Returns (query_id,
    neighbor_id, rank, cosine) like brute_force_topk — approximate
    (recall < 1) but scans ~nprobe/ncells of the corpus."""
    cents = ivf_centroids(corpus, cell_col, vec_col)
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    cell_rank = (
        broadcast(q)
        .crossJoin(broadcast(cents))
        .select(query_id, "cell", "__qv", cosine("centroid", "__qv").alias("ccos"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.desc("ccos"), F.asc("cell"))
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select(query_id, "cell", "__qv")
    )
    scored = (
        corpus.select(
            F.col(cell_col).alias("cell"),
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col),
        )
        .join(broadcast(cell_rank), "cell")
        .filter(F.col("neighbor_id") != F.col(query_id))
        .select(query_id, "neighbor_id", cosine(vec_col, "__qv").alias("cosine"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "cosine")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: centroids (tiny parquet) + the
    corpus rewritten ``partitionBy(cell)``. This is the 100 TB shape —
    the centroid build (one full pass) is paid once at ingest, and
    every probe after that reads only the probed cells' files
    (partition pruning, proven by the plan audit). Scale-smoke: at
    1M vectors the centroid build dominated query latency when
    recomputed per query (NOTES.md)."""
    cents = ivf_centroids(corpus, cell_col, vec_col)
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    (
        corpus.select(
            F.col(id_col), F.col(vec_col), F.col(cell_col).alias("cell")
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Probe a materialized IVF index (see :func:`build_ivf_index`).
    The cell filter is an IN-list on the partition column, so only
    nprobe cells' files are scanned."""
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    cell_rank = (
        broadcast(q)
        .crossJoin(broadcast(cents))
        .select(query_id, "cell", "__qv", cosine("centroid", "__qv").alias("ccos"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.desc("ccos"), F.asc("cell"))
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select(query_id, "cell", "__qv")
    )
    # static partition pruning: the probed-cell set is tiny (≤ queries
    # × nprobe) — collect it once to the driver and push an IN-list to
    # the scan, which prunes files deterministically (runtime DPP
    # proved unreliable here: the 1M-vector smoke scanned all cells).
    # Re-create the tiny rank frame from the collected rows instead of
    # cache() so nothing stays pinned in executor storage.
    rank_rows = cell_rank.collect()
    probed = sorted({r.cell for r in rank_rows})
    cell_rank = spark.createDataFrame(rank_rows, cell_rank.schema)
    vectors = spark.read.parquet(f"{path}/vectors").filter(F.col("cell").isin(probed))
    scored = (
        vectors.select("cell", F.col(id_col).alias("neighbor_id"), F.col(vec_col))
        .join(broadcast(cell_rank), "cell")
        .filter(F.col("neighbor_id") != F.col(query_id))
        .select(query_id, "neighbor_id", cosine(vec_col, "__qv").alias("cosine"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "cosine")
    )
