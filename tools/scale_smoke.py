"""Reproducible 10x scale smokes — the regression anchors recorded in
NOTES.md ("Scale smokes" section).

Duplicates the sf0.1 documents table 10x (doc_id-shifted copies, 50k
docs at default sf) and times the heavy LLM pipelines end-to-end.
Wall-times are load-sensitive; compare against NOTES.md anchors with
~20% slack.

Usage: python tools/scale_smoke.py [sf_dir] [copies]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hadoop_main_spark import tables
from hadoop_main_spark.operators import dedup as D
from hadoop_main_spark.operators import textstats as TS
from hadoop_main_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("scale-smoke")
    d = tables.load_table(spark, sf_dir, "documents")
    big = reduce(
        DataFrame.unionByName,
        [
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            for i in range(copies)
        ],
    )
    out: dict[str, float] = {"n_docs": big.count()}

    t0 = time.time()
    out["minhash_lsh_pairs"] = D.minhash_lsh_pairs(
        big, "doc_id", "text", min_est_jaccard=0.5
    ).count()
    out["minhash_lsh_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    out["ngram_jaccard_pairs"] = D.ngram_jaccard_pairs(
        big, "doc_id", "text", min_jaccard=0.5
    ).count()
    out["ngram_jaccard_s"] = round(time.time() - t0, 1)

    # curation pipeline shape (mirrors plans/llm_queries.curation_pipeline)
    qcols = TS.token_quality_cols("text")
    feats = big.select(
        "doc_id",
        "source",
        TS.lang_id("text").alias("g"),
        qcols["n_tokens"].alias("n_tokens"),
        qcols["unique_ratio"].alias("unique_ratio"),
    )
    kept = feats.filter(
        (F.col("g") == "en")
        & (F.col("n_tokens") >= 20)
        & (F.col("unique_ratio") >= 0.3)
    )
    dupes = (
        D.minhash_lsh_pairs(big, "doc_id", "text", min_est_jaccard=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    t0 = time.time()
    out["curation_sources"] = (
        kept.join(dupes, "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("tt"))
        .count()
    )
    out["curation_s"] = round(time.time() - t0, 1)

    # round-4 text-ops anchors: materialize the duplicated corpus as a
    # synthetic sf dir and run the REAL registry builders against it
    import shutil
    import tempfile

    from hadoop_main_spark.plans.registry import REGISTRY

    big_dir = tempfile.mkdtemp(prefix="smoke_sf_")
    big.write.mode("overwrite").parquet(os.path.join(big_dir, "documents.parquet"))
    try:
        for name in (
            "bigram_topk",
            "pii_scrub",
            "url_canonicalize",
            "gopher_quality_flags",
            "token_rarity_score",
        ):
            t0 = time.time()
            out[f"{name}_rows"] = REGISTRY[name].build(spark, big_dir).count()
            out[f"{name}_s"] = round(time.time() - t0, 1)
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)

    t0 = time.time()
    out["ngram_containment_pairs"] = D.ngram_containment_pairs(
        big, "doc_id", "text", min_containment=0.6
    ).count()
    out["ngram_containment_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    out["repeated_spans"] = D.cross_doc_spans(big, "doc_id", "text", window=20).count()
    out["repeated_spans_s"] = round(time.time() - t0, 1)

    # incremental ingest shape: a 10%-of-corpus batch vs the rest,
    # corpus side from persisted-signature reuse (no re-shingle)
    sig_all = D.minhash_signature(big, "doc_id", "text")
    t0 = time.time()
    out["incremental_pairs"] = D.lsh_pairs_across(
        sig_all.filter(F.col("doc_id") % 10 == 0),
        sig_all.filter(F.col("doc_id") % 10 != 0),
        "doc_id",
        min_est_jaccard=0.5,
    ).count()
    out["incremental_s"] = round(time.time() - t0, 1)

    cust = tables.load_table(spark, sf_dir, "customer")
    bigc = reduce(
        DataFrame.unionByName,
        [
            cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000))
            .withColumn(
                "c_name",
                F.concat(F.lit(f"x{i}" if i else ""), F.col("c_name")),
            )
            for i in range(copies)
        ],
    )
    t0 = time.time()
    out["fuzzy_pairs"] = D.fuzzy_key_pairs(bigc, "c_custkey", "c_name").count()
    out["fuzzy_s"] = round(time.time() - t0, 1)

    # SemDeDup at 10x: k SCALES with the corpus (the paper's contract —
    # cluster-bounded pairwise work). 20k vectors / k=64 seeds keeps
    # clusters ~300 and pair counts ~3M; the registry query pins k=8
    # only for the fixed-seed oracle.
    from hadoop_main_spark.operators.similarity import semantic_dedup_pairs

    e = tables.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    bige = reduce(
        DataFrame.unionByName,
        [
            e.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            for i in range(copies)
        ],
    )
    seeds = [
        (int(r.vec_id), [float(x) for x in r.v])
        for r in e.filter(F.col("vec_id") < 64).collect()
    ]
    t0 = time.time()
    out["semantic_dedup_pairs"] = semantic_dedup_pairs(
        bige, seeds, "vec_id", "v", min_cosine=0.95
    ).count()
    out["semantic_dedup_s"] = round(time.time() - t0, 1)
    out["n_vectors"] = bige.count()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
