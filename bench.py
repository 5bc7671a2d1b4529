"""Benchmark harness: run headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE
JSON line with per-query wall seconds.

Each query is forced with a count()-style action (no driver
collect of the full result; sorts are capped with a write-less
foreach-noop via ``df.write.format("noop")``). Timed region =
``build()`` + the action (r12): plan construction is cheap for most
queries, but iterative operators (suffix arrays, connected
components, OPQ/NN-descent training, streaming windows) materialize
real compute inside build() via eager localCheckpoint(), which the
pre-r12 action-only timer missed.

Noise protocol (verdict r6 #1): min-of-3 per query, then any query
whose 3-fastest-run spread exceeds 50% of its min is re-run up to 3
more times — a loaded machine inflates individual runs, so extra
samples tighten the min and the fast-cluster spread. Queries still
noisy after the retries are listed in the ``"noisy"`` output field
so no one reads a loaded-machine artifact as a regression. Best
observed numbers persist in BENCH_best.json (per-query and
per-headline-set, keyed by sf) so regressions are judged against
best-known, not last-round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_main_spark.plans.registry import REGISTRY
from hadoop_main_spark.session import get_spark

_REPO = os.path.dirname(os.path.abspath(__file__))
BEST_LEDGER = os.path.join(_REPO, "BENCH_best.json")


#: timing methodology (optimization r12, verdict-r11 #1): the timer
#: covers build() + the noop action — iterative operators run real
#: compute inside build() via EAGER localCheckpoint() (suffix
#: prefix-doubling, CC rounds, OPQ/NN-descent training, streaming
#: windows), so the old post-build t0 structurally under-reported
#: them (the bench-flagged suffix_array_repeats ran its suffix-array
#: construction untimed). SPARK_GRAFT_TIME_BUILD=0 restores the
#: legacy action-only timing for cross-round comparison runs; the
#: "timing" output field and the BENCH_best.json ledger key reflect
#: whichever is active, so the two histories never mix.
TIME_BUILD = os.environ.get("SPARK_GRAFT_TIME_BUILD", "1") != "0"


def run_once(spark, name: str, sf_dir: str) -> float:
    if not TIME_BUILD:  # legacy pre-r12 timing (action only)
        df = REGISTRY[name].build(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    t0 = time.perf_counter()
    df = REGISTRY[name].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


#: noisy gate: fast-3 spread > NOISE_GATE * min flags the entry.
#: Tightened 0.5 -> 0.4 (verdict r7 #1: a 46.5%-spread entry rode a
#: hair under the old gate and would eventually flap).
NOISE_GATE = 0.4
#: retries also fire while the spread merely RIDES the line (within
#: 10% under the gate) — such an entry is one loaded run away from
#: flapping, so extra samples either pull it clearly under or let the
#: noisy flag land honestly.
RIDE_LINE = 0.9 * NOISE_GATE

#: per-query sample-count overrides (verdict r9 #8: curation_pipeline
#: is the noisiest headline entry — spread 0.534 at r9 — so it starts
#: from more samples instead of relying on ride-line retries alone)
BASE_RUNS_OVERRIDE = {"curation_pipeline": 6}
MAX_EXTRA_OVERRIDE = {"curation_pipeline": 8}


def time_query(
    spark, name: str, sf_dir: str, base_runs: int = 3, max_extra: int = 5
) -> tuple[float, float, bool]:
    """Returns (min_seconds, fast3_spread_seconds, still_noisy).

    Spread is measured over the THREE FASTEST runs (adding samples can
    only tighten it, unlike max-min over all runs): on a quiet machine
    3 warm runs cluster within a few percent; on a loaded machine the
    slow outliers fall out of the fast-3 window as retries land."""
    base_runs = BASE_RUNS_OVERRIDE.get(name, base_runs)
    max_extra = MAX_EXTRA_OVERRIDE.get(name, max_extra)
    # one UNTIMED warmup per query (verdict r10 #2 / next-round #4):
    # the first-positioned query was absorbing the session's residual
    # JIT/codegen cold cost into all of its timed runs (+48% on
    # untouched code); a discarded first run makes every query's
    # timings position-independent
    run_once(spark, name, sf_dir)
    runs = sorted(run_once(spark, name, sf_dir) for _ in range(base_runs))

    def fast3_spread() -> float:
        return runs[min(2, len(runs) - 1)] - runs[0]

    extra = 0
    while fast3_spread() > RIDE_LINE * runs[0] and extra < max_extra:
        runs.append(run_once(spark, name, sf_dir))
        runs.sort()
        extra += 1
    sp = fast3_spread()
    return runs[0], sp, sp > NOISE_GATE * runs[0]


def update_best_ledger(
    sf_key: str, times: dict[str, float], total: float, noisy: list[str]
) -> dict:
    """Merge this run into BENCH_best.json: per-query minima plus the
    best total for THIS exact headline set (older sets' entries stay —
    a rotation must not erase the history the judge compares against).
    Noisy queries still update if they beat the best (a min can only
    be pessimistic). Returns the set entry for the current set."""
    ledger: dict = {"per_query": {}, "per_set": {}}
    try:
        with open(BEST_LEDGER) as f:
            ledger = json.load(f)
    except (OSError, ValueError):
        pass
    pq = ledger.setdefault("per_query", {}).setdefault(sf_key, {})
    for name, v in times.items():
        if name not in pq or v < pq[name]:
            pq[name] = v
    sets = ledger.setdefault("per_set", {}).setdefault(sf_key, [])
    names_sorted = sorted(times)
    entry = next((e for e in sets if e["names"] == names_sorted), None)
    if entry is None:
        entry = {"names": names_sorted, "total": total, "noisy_at_best": noisy}
        sets.append(entry)
    elif total < entry["total"]:
        entry["total"] = total
        entry["noisy_at_best"] = noisy
    try:
        tmp = BEST_LEDGER + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, BEST_LEDGER)
    except OSError:
        pass  # read-only checkout: still report against the loaded ledger
    return entry


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("hadoop-main-spark-bench")
    names = [n for n, q in REGISTRY.items() if q.bench]
    # warm the JVM + file listing with a fixed cheap query, pinned by
    # name so bench numbers stay comparable if ordering ever changes;
    # twice — the first run pays classloading, the second pays the C2
    # recompile of the hottest codegen paths (each query additionally
    # gets its own untimed warmup run inside time_query)
    warm = "word_count" if "word_count" in names else names[0]
    run_once(spark, warm, sf_dir)
    run_once(spark, warm, sf_dir)
    times: dict[str, float] = {}
    spread: dict[str, float] = {}
    noisy: list[str] = []
    for name in names:
        best, sp, is_noisy = time_query(spark, name, sf_dir)
        times[name] = round(best, 3)
        spread[name] = round(sp, 3)
        if is_noisy:
            noisy.append(name)
    total = round(sum(times.values()), 3)
    # ledger key versioned by timing methodology: build()+action times
    # are not comparable to the pre-r12 action-only minima, so they
    # accumulate under a separate key (old history stays untouched)
    sf_key = f"sf{sf}+build" if TIME_BUILD else f"sf{sf}"
    best_entry = update_best_ledger(sf_key, times, total, noisy)
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
                "timing": "build+action" if TIME_BUILD else "action",
                "queries": times,
                "spread": spread,
                "noisy": noisy,
                "best_total_known": best_entry["total"],
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
