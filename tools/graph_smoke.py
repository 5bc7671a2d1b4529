"""Scale smoke for the graph operators: a synthetic power-law-ish
graph (hash-derived edges + a few planted hubs) far beyond the
vocabulary-bounded token graph the registry query uses. Prints one
JSON line; anchors recorded in NOTES.md.

Usage: python tools/graph_smoke.py [n_edges] [n_nodes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hadoop_main_spark.operators.graph import (
    canonical_edges,
    pagerank_int,
    triangle_count,
)
from hadoop_main_spark.session import get_spark


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("graph-smoke")
    # hash-derived endpoints: deterministic, collision-rich; the %97
    # term plants ~97 hub-ish nodes with huge degree (the skew case
    # degree orientation exists for)
    raw = spark.range(n_edges).select(
        (F.xxhash64("id") % n_nodes).alias("x"),
        F.when(F.col("id") % 11 == 0, F.xxhash64("id", F.lit(1)) % 97)
        .otherwise(F.xxhash64("id", F.lit(2)) % n_nodes)
        .alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    edges = canonical_edges(raw, "x", "y").localCheckpoint(eager=True)
    out = {"n_edges": edges.count(), "n_nodes": n_nodes}

    t0 = time.time()
    out["n_triangles"] = triangle_count(edges).collect()[0].n_triangles
    out["triangle_s"] = round(time.time() - t0, 1)

    nodes = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .distinct()
    )
    directed = edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    t0 = time.time()
    r = pagerank_int(directed, nodes, iterations=2)
    out["pagerank_top_rank"] = r.orderBy(F.desc("rank"), "v").limit(1).collect()[0].rank
    out["pagerank_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
