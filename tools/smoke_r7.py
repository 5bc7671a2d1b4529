"""Round-7 scale smoke: the TRUE-IVFADC (residual) index at 1M x 64
vectors on local[32] — build cost (centroids + seed codebook + encode
partitionBy(cell)), warm indexed-probe latency, trained-codebook
training cost, and the bigram_surprise scorer over a 50k-doc corpus.

Prints one JSON line. Mirrors tools/smoke_r6.py's methodology so the
NOTES anchors are comparable across rounds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_main_spark.operators import similarity as SIM
from hadoop_main_spark.session import get_spark


def main() -> None:
    spark = get_spark("smoke-r7")
    out: dict = {}

    n, dim, cells = 1_000_000, 64, 100
    vecs = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (F.pmod(F.col("id") * 37 + i * 11, F.lit(1000)) / 250.0 - 2.0),
            ).alias("embedding"),
            F.pmod(F.col("id"), F.lit(cells)).cast("int").alias("label"),
        )
        .repartition(32)
    )
    vecs = vecs.localCheckpoint()

    idx = tempfile.mkdtemp(prefix="smoke_r7_residx_")
    t0 = time.perf_counter()
    SIM.build_ivfpq_residual_index(vecs, idx, "label")
    out["residual_index_build_s"] = round(time.perf_counter() - t0, 1)

    q = vecs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        cnt = SIM.ivfpq_residual_topk_indexed(spark, idx, q, k=10, nprobe=5).count()
        out[f"residual_probe_{run}_s"] = round(time.perf_counter() - t0, 1)
    out["probe_rows"] = cnt

    # trained codebook over a 100k sample (the FAISS train-on-sample move)
    cents = spark.read.parquet(f"{idx}/centroids")
    qcent = SIM._quantized_centroid_map(cents.collect(), SIM.PQ_QSCALE)
    sample = vecs.filter(F.col("vec_id") % 10 == 0)
    t0 = time.perf_counter()
    rv = SIM.residual_vectors(sample, qcent, "label").localCheckpoint()
    cb, _ = SIM.pq_trained_codebook(
        rv, 16, 4, "vec_id", "__res", pre_quantized=True, max_iter=3
    )
    out["trained_codebook_100k_s"] = round(time.perf_counter() - t0, 1)

    shutil.rmtree(idx, ignore_errors=True)

    # bigram_surprise over a 50k-doc corpus (10x sf0.1 documents)
    from hadoop_main_spark.plans.registry import REGISTRY
    from hadoop_main_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    big = docs
    stride = (docs.agg(F.max("doc_id")).first()[0] or 0) + 1
    for k in range(1, 10):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * stride))
        )
    tmp = tempfile.mkdtemp(prefix="smoke_r7_docs_")
    for tname in ("documents",):
        big.write.mode("overwrite").parquet(f"{tmp}/{tname}.parquet")
    for tname in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        load_table(spark, "/root/testdata/sf0.1", tname).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/{tname}.parquet")
    t0 = time.perf_counter()
    REGISTRY["bigram_surprise"].build(spark, tmp).write.format("noop").mode(
        "overwrite"
    ).save()
    out["bigram_surprise_50k_docs_s"] = round(time.perf_counter() - t0, 1)
    shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
