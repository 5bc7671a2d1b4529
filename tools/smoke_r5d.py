"""One-off 10x scale smoke for the round-5d operators."""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import reduce
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from hadoop_main_spark import tables
from hadoop_main_spark.session import get_spark
from hadoop_main_spark.operators import winnowing as WN
from hadoop_main_spark.operators import similarity as SIM

spark = get_spark("smoke-r5d")
sf = "/root/testdata/sf0.1"
d = tables.load_table(spark, sf, "documents")
big = reduce(DataFrame.unionByName,
    [d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)) for i in range(10)]
).repartition(32).localCheckpoint()
print("docs:", big.count())

t0 = time.time()
n = WN.winnow_fingerprints(big, "doc_id", "text").count()
print(f"winnow_fingerprints: {n} fps in {time.time()-t0:.1f}s")

t0 = time.time()
n = WN.winnow_pairs(big, "doc_id", "text", min_shared=2).count()
print(f"winnow_pairs: {n} pairs in {time.time()-t0:.1f}s")

# events 10x for scd2/twap shapes
e = tables.load_table(spark, sf, "events")
bige = reduce(DataFrame.unionByName,
    [e.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000)) for i in range(10)]
).repartition(32).localCheckpoint()
print("events:", bige.count())
from pyspark.sql import Window
w = Window.partitionBy("user_id").orderBy("ts", "event_id")
t0 = time.time()
chg = F.when(F.lag("event_type").over(w).isNull() | (F.lag("event_type").over(w) != F.col("event_type")), 1).otherwise(0)
runs = bige.withColumn("version", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
n = runs.groupBy("user_id", "version").count().count()
print(f"scd2 runs: {n} in {time.time()-t0:.1f}s")

# ivfpq at 1M x 64 (kmeans_smoke-style synthetic vectors)
import numpy as np
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
t0 = time.time()
cb, _ = SIM.pq_codebook(vec.select("vec_id", "embedding"))
q = vec.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
n = SIM.ivfpq_topk(vec, q, "label", cb, k=10, nprobe=5).count()
print(f"ivfpq_topk 1Mx64 nprobe5: {n} rows in {time.time()-t0:.1f}s")
spark.stop()
