"""Round-6 scale smoke: materialized-index probe vs in-query rebuild
at 1M x 64 vectors, and Y4M/AVI frame sampling at 10x sf0.1.

Evidence for the verdict-r5 watch-item: ivfpq_topk recomputed the
exact-DECIMAL centroids per call (22.8 s of the 1M smoke);
build_ivfpq_index pays that once, after which every probe reads only
the probed cells' code partitions.
"""
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from hadoop_main_spark.operators import multimodal as MM
from hadoop_main_spark.operators import similarity as SIM
from hadoop_main_spark.session import get_spark

spark = get_spark("smoke-r6")

# --- 1M x 64 synthetic vectors (kmeans_smoke formula) -----------------------
nvec, dim = 1_000_000, 64
vec = (
    spark.range(nvec)
    .withColumn("label", (F.col("id") % 100).cast("int"))
    .withColumn(
        "embedding",
        F.transform(F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: (F.pmod(F.col("id") * 2654435761 + i * 40503, F.lit(1000)) / 250.0 - 2.0)),
    )
    .select(F.col("id").alias("vec_id"), "label", "embedding")
    .repartition(32)
    .localCheckpoint()
)
print("vectors:", vec.count())
cb, _ = SIM.pq_codebook(vec.select("vec_id", "embedding"))
q = vec.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")

t0 = time.time()
n = SIM.ivfpq_topk(vec, q, "label", cb, k=10, nprobe=5).count()
t_inline = time.time() - t0
print(f"ivfpq_topk (in-query rebuild): {n} rows in {t_inline:.1f}s")

idx = tempfile.mkdtemp(prefix="smoke_ivfpq_")
t0 = time.time()
SIM.build_ivfpq_index(vec, idx, "label", cb)
t_build = time.time() - t0
print(f"build_ivfpq_index (one-time): {t_build:.1f}s")

for rnd in (1, 2):
    t0 = time.time()
    n = SIM.ivfpq_topk_indexed(spark, idx, q, cb, k=10, nprobe=5).count()
    print(f"ivfpq_topk_indexed probe #{rnd}: {n} rows in {time.time()-t0:.1f}s")
shutil.rmtree(idx, ignore_errors=True)

# --- video containers at volume ---------------------------------------------
import pandas as pd  # noqa: E402

docs = spark.range(50_000).select(F.col("id").alias("media_id"))

def gen_y4m(batches):
    import numpy as np
    for b in batches:
        ids = b["media_id"].astype("int64")
        payloads = []
        for i in ids:
            i = int(i)
            r = (i % 3 + 2) * 2
            frames = [
                (((i * 7 + fi * 31 + np.add.outer(np.arange(r) * 5, np.arange(8) * 3)) % 256).astype(np.uint8),
                 ((i * 11 + fi * 17 + np.add.outer(np.arange(r // 2) * 3, np.arange(4) * 5)) % 256).astype(np.uint8),
                 ((i * 13 + fi * 19 + np.add.outer(np.arange(r // 2) * 7, np.arange(4) * 2)) % 256).astype(np.uint8))
                for fi in range(i % 6 + 4)
            ]
            payloads.append(MM._y4m_encode(frames, colorspace="C420jpeg"))
        yield pd.DataFrame({"media_id": ids, "payload": payloads})

media = docs.mapInPandas(gen_y4m, "media_id long, payload binary")
t0 = time.time()
n = MM.frame_sample(media, every_n=2).count()
print(f"y4m frame_sample 50k videos: {n} sampled frames in {time.time()-t0:.1f}s")
spark.stop()
