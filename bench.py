"""Benchmark harness: run headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE
JSON line with per-query wall seconds.

Each query is forced with a count()-style action (no driver
collect of the full result; sorts are capped with a write-less
foreach-noop via ``df.write.format("noop")``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_main_spark.plans.registry import REGISTRY
from hadoop_main_spark.session import get_spark


def run_once(spark, name: str, sf_dir: str) -> float:
    df = REGISTRY[name].build(spark, sf_dir)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("hadoop-main-spark-bench")
    names = [n for n, q in REGISTRY.items() if q.bench]
    # warm the JVM + file listing once with a fixed cheap query, pinned
    # by name so bench numbers stay comparable if ordering ever changes
    run_once(spark, "word_count" if "word_count" in names else names[0], sf_dir)
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in names:
        # min of THREE runs (verdict-r4 #2: min-of-2 was too noisy to
        # attribute ±0.5 s movements): later runs reuse warmed file
        # listings and compiled codegen, so min reports steady-state
        # latency; spread = max-min of the runs exposes noise per query
        runs = sorted(run_once(spark, name, sf_dir) for _ in range(3))
        times[name] = round(runs[0], 3)
        spread[name] = round(runs[-1] - runs[0], 3)
    total = round(sum(times.values()), 3)
    # MRBench analog (JT/mapred/MRBench.java:201): tiny-job latency —
    # the scheduling+execution floor for a 1-row map/reduce round trip
    t0 = time.perf_counter()
    spark.range(1).groupBy().count().collect()
    small_job = round(time.perf_counter() - t0, 3)
    # TestDFSIO analog (JT/fs/TestDFSIO.java:60): sequential parquet
    # write then read of a ~64 MB synthetic table, reported as MB/s
    import shutil
    import tempfile

    io_dir = os.path.join(tempfile.mkdtemp(prefix="bench_dfsio_"), "data")
    rows = 4_000_000  # 2 longs/row ≈ 64 MB uncompressed
    df_io = spark.range(rows).selectExpr("id", "id * 7 AS v")
    # best-of-2 like the query timings: a one-shot IO measurement
    # bounced 36-80 MB/s across otherwise-identical runs (page cache /
    # first-write allocation noise); steady-state is the stable figure
    write_s = read_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df_io.write.mode("overwrite").parquet(io_dir)
        write_s = min(write_s, time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.read.parquet(io_dir).selectExpr("sum(v)").collect()
        read_s = min(read_s, time.perf_counter() - t0)
    mb = rows * 16 / 1e6
    shutil.rmtree(os.path.dirname(io_dir), ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "spread": spread,
                "sf": sf,
                "small_job_latency_s": small_job,
                "io_write_mbps": round(mb / write_s, 1),
                "io_read_mbps": round(mb / read_s, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
