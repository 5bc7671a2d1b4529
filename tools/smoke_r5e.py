"""10x scale smokes for the round-5e operators (cascade, gram, avro)."""
import sys, time, tempfile, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import reduce
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from hadoop_main_spark import tables
from hadoop_main_spark.session import get_spark
from hadoop_main_spark.operators import dedup as D
from hadoop_main_spark.operators import similarity as SIM
from hadoop_main_spark.sources.avro import read_avro, write_avro

spark = get_spark("smoke-r5e")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
d = tables.load_table(spark, sf, "documents")
big = reduce(DataFrame.unionByName,
    [d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)) for i in range(10)]
).repartition(32).localCheckpoint()
print("docs:", big.count())

t0 = time.time()
k1 = D.exact_dedup(big, ["text"], "doc_id").filter(~F.col("is_duplicate")).select("doc_id")
survivors = big.join(k1, "doc_id")
pairs = D.minhash_lsh_pairs(survivors, "doc_id", "text", min_est_jaccard=0.5)
k2 = k1.join(pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti")
print(f"cascade: corpus={big.count()} exact={k1.count()} near={k2.count()} in {time.time()-t0:.1f}s")

nvec, dim = 1_000_000, 64
vec = (
    spark.range(nvec)
    .withColumn("embedding", F.transform(F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (F.pmod(F.col("id") * 2654435761 + i * 40503, F.lit(1000)) / 250.0 - 2.0)))
    .select(F.col("id").alias("vec_id"), "embedding").repartition(32).localCheckpoint()
)
vec.count()
t0 = time.time()
n = SIM.gram_matrix_exact(vec, "embedding").count()
print(f"gram 1Mx64: {n} cells in {time.time()-t0:.1f}s")

rows = spark.range(1_000_000).selectExpr("id", "id * 7 AS v", "concat('s', id) AS s").repartition(32)
out = tempfile.mkdtemp(prefix="avro_smoke_") + "/t.avro"
t0 = time.time()
w = write_avro(rows, out, codec="deflate")
tw = time.time() - t0
t0 = time.time()
r = read_avro(spark, out).count()
tr = time.time() - t0
import shutil; shutil.rmtree(os.path.dirname(out), ignore_errors=True)
print(f"avro 1M rows: write {w} in {tw:.1f}s, read {r} in {tr:.1f}s")
spark.stop()
