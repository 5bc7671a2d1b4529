"""10x scale gate (verdict r6 #3): the committed, repeatable version
of the ad-hoc scale smokes that kept finding real issues.

Builds a 10x corpus from sf0.1 (each FACT table unioned 10 times with
shifted keys — orderkey / event+user ids / doc_id / vec_id — so joins
stay consistent and the dedup family sees the identical-copy worst
case; dimensions unchanged), runs the bench headline set plus any
extra query names passed on the CLI at BOTH scales, and writes the
per-query sf0.1 -> 10x runtime ratios to SCALE.md.

FAILS (exit 1) on any ratio above the super-linear threshold (default
15x for 10x data — linear scaling plus fixed overhead lands well
under it; a quadratic pair blowup or a lost partition bound lands far
above). Queries faster than 0.15 s at sf0.1 are overhead-dominated;
their ratios print but never fail the gate.

Usage:
    python tools/scale_gate.py [--threshold 15] [extra_query ...]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_main_spark.plans.registry import REGISTRY
from hadoop_main_spark.session import get_spark
from hadoop_main_spark.tables import TABLE_NAMES, data_fingerprint, load_table

COPIES = 10
# FACT tables get key columns shifted per copy so cross-table joins
# (orders<->lineitem) and per-entity groupings (sessions per user)
# stay structurally realistic at 10x; text/embedding payloads repeat
# identically — the dedup/ANN worst case, deliberately.
SHIFTS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
MIN_BASE_S = 0.15  # below this the sf0.1 time is fixed overhead

#: non-bench queries the gate ALWAYS covers (each round's additions
#: get appended here per the round ledger, so the committed SCALE.md
#: keeps certifying them without anyone re-typing the CLI list)
DEFAULT_EXTRAS = [
    # round 7
    "seqfile_roundtrip_agg",
    "fixedwidth_roundtrip_agg",
    "xml_roundtrip_agg",
    "har_roundtrip_agg",
    "distcp_roundtrip_agg",
    "gif_truecolor_frame_features",
    "ivfpq_residual_topk",
    "ivfpq_residual_indexed",
    "bigram_surprise",
    "sq8_topk",
    "bq_rerank_topk",
]


def build_10x(spark, src: str, dst: str) -> None:
    marker = os.path.join(dst, "_BUILT_FROM")
    fp = data_fingerprint(src)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == fp:
                return
    for tbl in TABLE_NAMES:
        df = load_table(spark, src, tbl)
        if tbl in SHIFTS:
            strides = {
                c: (df.agg(F.max(c)).first()[0] or 0) + 1 for c in SHIFTS[tbl]
            }
            parts = []
            for k in range(COPIES):
                d = df
                for c, stride in strides.items():
                    d = d.withColumn(c, F.col(c) + F.lit(k * stride))
                parts.append(d)
            df = functools.reduce(DataFrame.unionByName, parts)
        df.write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")
    with open(marker, "w") as f:
        f.write(fp)


def time_query(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        df = REGISTRY[name].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    args = sys.argv[1:]
    threshold = 15.0
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n, q in REGISTRY.items() if q.bench]
    names += [n for n in DEFAULT_EXTRAS if n not in names]
    names += [n for n in args if n not in names]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    dst = os.path.join(
        "/tmp", "spark_graft_scale10x", data_fingerprint(src)[:16]
    )
    spark = get_spark("scale-gate")
    t0 = time.perf_counter()
    build_10x(spark, src, dst)
    build_s = time.perf_counter() - t0
    # warm both corpora's file listings with a cheap fixed query
    warm = "word_count" if "word_count" in REGISTRY else names[0]
    time_query(spark, warm, src, runs=1)
    time_query(spark, warm, dst, runs=1)

    # warm the PYTHON workers too: the first Arrow-kernel query
    # otherwise pays ~6s of 32-worker spin-up + numpy imports, and
    # min-of-2 can catch it cold twice (observed on gif sf0.1)
    def _py_warm(batches):
        import numpy  # noqa: F401  (module-cache warm per worker)

        yield from batches

    par = spark.sparkContext.defaultParallelism
    (
        spark.range(par * 4)
        .repartition(par)
        .mapInPandas(_py_warm, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    rows = []
    failures = []
    for name in names:
        base = time_query(spark, name, src)
        big = time_query(spark, name, dst)
        ratio = big / base if base > 0 else float("inf")
        gated = base >= MIN_BASE_S
        ok = (ratio <= threshold) or not gated
        rows.append((name, base, big, ratio, gated, ok))
        if not ok:
            failures.append(name)
        print(
            f"{'ok  ' if ok else 'FAIL'} {name}: {base:.3f}s -> {big:.3f}s "
            f"({ratio:.1f}x{'' if gated else ', overhead-dominated: informational'})",
            flush=True,
        )
    spark.stop()
    lines = [
        "# SCALE.md — 10x scale-gate ledger",
        "",
        f"`tools/scale_gate.py`: headline set at sf0.1 vs a 10x corpus "
        f"({COPIES} key-shifted fact copies, identical payloads — the "
        f"dedup worst case). Gate: ratio <= {threshold:g}x for queries "
        f"with sf0.1 time >= {MIN_BASE_S}s (below that, fixed overhead "
        f"dominates and the ratio is informational). min-of-2 runs each. "
        f"10x corpus build: {build_s:.1f}s (cached by data fingerprint).",
        "",
        "| query | sf0.1 s | 10x s | ratio | gate |",
        "|---|---|---|---|---|",
    ]
    for name, base, big, ratio, gated, ok in rows:
        gate = ("PASS" if ok else "FAIL") if gated else "info"
        lines.append(f"| {name} | {base:.3f} | {big:.3f} | {ratio:.1f}x | {gate} |")
    lines.append("")
    with open(os.path.join(_REPO, "SCALE.md"), "w") as f:
        f.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "scale_gate_10x",
                "threshold": threshold,
                "failures": failures,
                "queries": {n: round(r, 2) for n, _b, _g, r, _gt, _ok in rows},
            }
        )
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
