import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyspark.sql import functions as F
from hadoop_main_spark.session import get_spark
from hadoop_main_spark.operators.similarity import kmeans_assign

spark = get_spark("kmeans-smoke")
N, DIM, K = 1_000_000, 64, 8
rng = np.random.RandomState(7)
cents = [(i, [float(x) for x in rng.rand(DIM)]) for i in range(K)]

df = (spark.range(N)
      .select(F.col("id").alias("vec_id"),
              F.expr(f"transform(sequence(1,{DIM}), i -> cast(pmod(hash(id, i), 1000) as float)/1000.0)").alias("embedding")))
df.write.mode("overwrite").parquet("/tmp/kmeans_smoke_vec")
corpus = spark.read.parquet("/tmp/kmeans_smoke_vec")

def time_new():
    t0 = time.time()
    r = kmeans_assign(corpus, cents, "vec_id", "embedding").groupBy("cluster").agg(
        F.count("*").alias("n"), F.sum("__d2").alias("sd")).collect()
    return time.time() - t0, r

def time_old():
    best = None
    for cid, comps in cents:
        arr = F.array(*[F.lit(float(x)) for x in comps])
        diff_sq = F.zip_with("embedding", arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
        d2 = F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x)
        cand = F.struct(d2.alias("d2"), F.lit(int(cid)).alias("cluster"))
        best = cand if best is None else F.least(best, cand)
    old_df = corpus.withColumn("cluster", best.getField("cluster")).withColumn("__d2", best.getField("d2"))
    t0 = time.time()
    r = old_df.groupBy("cluster").agg(F.count("*").alias("n"), F.sum("__d2").alias("sd")).collect()
    return time.time() - t0, r

# min of two (bench.py convention: steady-state, workers/codegen warm)
n1, res_new = time_new(); n2, _ = time_new()
o1, res_old = time_old(); o2, _ = time_old()
new_s, old_s = min(n1, n2), min(o1, o2)
same = sorted((r.cluster, r.n, r.sd) for r in res_new) == sorted((r.cluster, r.n, r.sd) for r in res_old)
print(f"SMOKE kmeans_assign 1Mx{DIM} k={K}: new={new_s:.1f}s old_hof={old_s:.1f}s speedup={old_s/new_s:.1f}x exact_match={same}")
spark.stop()
import shutil; shutil.rmtree("/tmp/kmeans_smoke_vec", ignore_errors=True)
