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
    python tools/scale_gate.py [--threshold 15] [--copies N] [extra_query ...]

``--copies 100`` (verdict r7 #8) is the opt-in heavy tier: a 100x
corpus, the 5 heaviest headline queries only (HEAVY_SET — full-sweep
cost at 100x is not worth per-round payment), default threshold 150
(linear + fixed overhead). Each tier writes its OWN section of
SCALE.md (tier markers), so the 100x data point persists next to the
per-round 10x table instead of being overwritten by it.
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
    # round 8 (stream_dedup_roundtrip excluded on purpose: its stream
    # executes inside build(), so the timed tail is only the sink
    # read-back — the gate would measure nothing)
    "bq_ivf_rerank_topk",
    "bq_ivf_indexed_topk",
    "audio_container_meta",
    "ivf_sq8_topk",
    "video_container_meta",
    "mkv_container_meta",
    "warc_ingest_meta",
    "warc_html_text_extract",
    "robots_url_filter",
    "robots_txt_pipeline",
    "sitemap_url_frontier",
    "mp3_id3_tags",
    # round 9 (stream_session/interval_join roundtrips excluded for the
    # same reason as stream_dedup: the stream executes inside build())
    "exact_substr_spans",
    "redirect_frontier",
    "image_exif_meta",
    "exact_substr_dedup",
    "ann_ivf_trained",
    # round 9 second block (stream_warc_roundtrip excluded: stream
    # executes inside build(), same as the other stream roundtrips)
    "merge_upsert",
    "orc_roundtrip_agg",
    "csv_roundtrip_agg",
    "wav_g711_decode_features",
    "bpe_encode_stats",
    "id3_apic_art_dedup",
    "html_link_graph",
    "knn_graph_nndescent",
    "knn_graph_search",
    "knn_graph_indexed",
    "graph_shortest_paths",
    "l_diversity_audit",
    "ewma_user_value",
    # round 10 (stream_{pq_codes,residual_codes,media_features}
    # roundtrips excluded: the stream executes inside build(), same
    # as the other stream roundtrips)
    "opq_pq_topk",
    "knn_graph_layered",
    "t_closeness_audit",
    "warc_revisit_dedup",
    "edit_distance_join",
    "autocorr_user_value",
    "eval_holdout_sample",
    "pdf_text_extract",
    "dhash_near_groups",
    "cc_incremental_resolution",
    # round 11
    "nline_split_agg",
    "combine_pack_agg",
    "multiple_outputs_agg",
    "hash_partition_hist",
    "keyfield_partition_hist",
    "binary_partition_hist",
    "mapfile_point_lookup",
    "counters_agg",
    "recrawl_maintenance",
    "pdf15_text_extract",
]

#: the --copies 100 tier runs ONLY these (the 5 heaviest headline
#: queries by the BENCH ledger) — a full sweep at 100x costs more
#: wall-clock than the one data point per round is worth
HEAVY_SET = [
    "bigram_surprise",
    "table_fingerprint",
    "curation_pipeline",
    "dedup_minhash_lsh",
    "gif_frame_features",
    # round 9 (verdict r8 #5): the crawl first mile, an ANN
    # index-build+probe, and the driver-side-seed-cap query — 100x is
    # where driver bounds (semantic seed cap, probe frames) actually
    # bind, so they belong in the heavy tier
    "warc_ingest_meta",
    "warc_html_text_extract",
    "ivfpq_indexed_topk",
    "semantic_dedup",
    # round 9 second block: graph iteration at 100x (PageRank over the
    # host graph — the web-family composition's scalability question)
    "html_link_graph",
]


def build_nx(spark, src: str, dst: str, copies: int = COPIES) -> None:
    marker = os.path.join(dst, "_BUILT_FROM")
    fp = f"{data_fingerprint(src)}:x{copies}"
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
            for k in range(copies):
                d = df
                for c, stride in strides.items():
                    d = d.withColumn(c, F.col(c) + F.lit(k * stride))
                parts.append(d)
            df = functools.reduce(DataFrame.unionByName, parts)
        df.write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")
    with open(marker, "w") as f:
        f.write(fp)


build_10x = build_nx  # back-compat alias (tooling tests import it)


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
    copies = COPIES
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i : i + 2]
    threshold = 15.0 * copies / COPIES  # linear + fixed overhead
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if copies == COPIES:
        names = [n for n, q in REGISTRY.items() if q.bench]
        names += [n for n in DEFAULT_EXTRAS if n not in names]
    else:
        names = list(args) or list(HEAVY_SET)  # heavy tier: 5 heaviest
    names += [n for n in args if n not in names]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    dst = os.path.join(
        "/tmp", f"spark_graft_scale{copies}x", data_fingerprint(src)[:16]
    )
    spark = get_spark("scale-gate")
    t0 = time.perf_counter()
    build_nx(spark, src, dst, copies)
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
        f"<!-- TIER {copies}x START -->",
        f"## {copies}x tier",
        "",
        f"Headline {'set' if copies == COPIES else 'HEAVY_SET'} at sf0.1 "
        f"vs a {copies}x corpus ({copies} key-shifted fact copies, "
        f"identical payloads — the dedup worst case). Gate: ratio <= "
        f"{threshold:g}x for queries with sf0.1 time >= {MIN_BASE_S}s "
        f"(below that, fixed overhead dominates and the ratio is "
        f"informational). min-of-2 runs each. {copies}x corpus build: "
        f"{build_s:.1f}s (cached by data fingerprint).",
        "",
        f"| query | sf0.1 s | {copies}x s | ratio | gate |",
        "|---|---|---|---|---|",
    ]
    for name, base, big, ratio, gated, ok in rows:
        gate = ("PASS" if ok else "FAIL") if gated else "info"
        lines.append(f"| {name} | {base:.3f} | {big:.3f} | {ratio:.1f}x | {gate} |")
    lines.append(f"<!-- TIER {copies}x END -->")
    section = "\n".join(lines)
    path = os.path.join(_REPO, "SCALE.md")
    header = "# SCALE.md — scale-gate ledger\n"
    try:
        old = open(path).read()
    except OSError:
        old = ""
    import re

    start, end = f"<!-- TIER {copies}x START -->", f"<!-- TIER {copies}x END -->"
    if start in old and end in old:
        new = old[: old.index(start)] + section + old[old.index(end) + len(end) :]
    else:
        # legacy single-tier file (or first run): keep only other tiers
        kept = "\n\n".join(
            m.group(0) for m in re.finditer(r"<!-- TIER .*? END -->", old, re.S)
        )
        new = header + "\n" + (kept + "\n\n" if kept else "") + section + "\n"
    with open(path, "w") as f:
        f.write(new)
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
