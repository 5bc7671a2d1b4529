"""Physical-plan audits: the scale properties the engine promises
must be visible in the optimized plan, not just asserted in docs.

These run on sf0.001 — plan shape, not data volume, is under test.
"""

import pytest

from hadoop_main_spark.plans.registry import REGISTRY


def _plan(spark, name, sf_dir) -> str:
    df = REGISTRY[name].build(spark, sf_dir)
    return df._jdf.queryExecution().optimizedPlan().toString() + "\n" + (
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark, sf_dir):
    plan = _plan(spark, "pricing_summary", sf_dir)
    # lineitem has 16 columns; the scan must read only the 7 used
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read and "l_orderkey" not in read


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "inner_join_nary", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_unpartitioned_window(spark, sf_dir):
    """Global-rank queries must not have a Window with an empty
    partition spec over the main data (single-task funnel). The only
    allowed unpartitioned window is over the per-partition count table
    (≤ #partitions rows), recognizable by its __pid input."""
    for q in ("total_order_sort", "sort_by_spec", "grep_sorted"):
        plan = _plan(spark, q, sf_dir)
        for ln in plan.splitlines():
            if "Window" in ln and "partitionBy" not in ln and "windowspecdefinition" in ln:
                # unpartitioned window specs list no partition columns
                # before the sort spec; __pid windows are the offset table
                if "windowspecdefinition(" in ln and "__pid" not in ln:
                    pytest.fail(f"{q}: suspicious unpartitioned window: {ln.strip()[:160]}")


def test_partial_aggregation_present(spark, sf_dir):
    """groupBy must plan partial (map-side) + final HashAggregate —
    the combiner the reference wires by hand."""
    plan = _plan(spark, "word_count", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "partial_" in plan


def test_quantile_histogram_plan_shape(spark, sf_dir):
    """The mergeable-histogram quantile query (long outside the driver
    window in r2/r3) must keep its scale shape: the orders scan
    aggregates partially BEFORE any shuffle (histogram rows, not raw
    orders, move), and every window over data is partitioned by grp —
    no single-task funnel."""
    plan = _plan(spark, "quantile_histogram", sf_dir)
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln and "grp" not in ln and (
            "o_orderpriority" not in ln
        ):
            pytest.fail(f"unpartitioned window: {ln.strip()[:160]}")


def test_json_event_stats_plan_shape(spark, sf_dir):
    """JSON extraction must stay JVM-side (no Python eval in the plan)
    with partial aggregation below the event_type shuffle, and the
    events scan must prune to the two consumed columns."""
    plan = _plan(spark, "json_event_stats", sf_dir)
    assert plan.count("HashAggregate") >= 2 and "partial_" in plan
    assert "get_json_object" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "props" in read and "event_type" in read
    assert "user_id" not in read and "value" not in read


def test_ivf_cells_partition_prune(spark, tmp_path):
    """The IVF scale path: cells written partitionBy(cell) must prune
    non-probed cells at the file level (PartitionFilters in the scan,
    not a post-scan filter)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        F.col("id").alias("vec_id"), (F.col("id") % 8).alias("cell")
    )
    path = str(tmp_path / "ivf_cells")
    df.write.mode("overwrite").partitionBy("cell").parquet(path)
    probed = spark.read.parquet(path).filter(F.col("cell").isin(2, 5))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:80]
    assert probed.count() == 250
    # pruning is partition-level: no post-scan Filter on cell remains
    assert "cell#" not in plan.split("PushedFilters")[0].split("Filter (")[-1][:40]


def test_top_k_plans_as_take_ordered(spark, sf_dir):
    """limit-after-sort must plan as TakeOrderedAndProject (partial
    per-partition top-k, k-row merge) — never a global sort."""
    plan = _plan(spark, "top_k", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_materialized_layout_join_is_exchange_free(spark, sf_dir):
    """After materialize_bucketed, the orders-lineitem fact join (the
    spine of every order-level query) must sort-merge join with no
    hash exchange on either side."""
    from hadoop_main_spark.sources.layouts import materialize_bucketed

    names = materialize_bucketed(spark, sf_dir, n_buckets=4, prefix="tmb_")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table(names["orders"])
        li = spark.table(names["lineitem"])
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        join_side = plan.split("SortMergeJoin")[1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for n in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_asof_join_single_data_shuffle(spark, sf_dir):
    """asof_join's one-shuffle claim: exactly one exchange on the
    union'd event data (the key hash for the carry-forward window);
    the only other exchange belongs to the right side's dedup
    pre-aggregation."""
    plan = _plan(spark, "asof_join", sf_dir)
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(exchanges) <= 2
    win = [ln for ln in plan.splitlines() if "Window" in ln and "last(" in ln]
    assert win and "user_id" in win[0]  # window keyed, not global


def test_dynamic_partition_pruning(spark, tmp_path):
    """DPP: a date-partitioned fact joined to a filtered dim must get a
    dynamicpruning subquery on the partition column — only matching
    partitions are scanned at runtime."""
    from pyspark.sql import functions as F

    fact = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 20).alias("day")
    )
    path = str(tmp_path / "fact_by_day")
    fact.write.mode("overwrite").partitionBy("day").parquet(path)
    dim = spark.range(0, 20).select(
        F.col("id").alias("day"), F.concat(F.lit("d"), F.col("id")).alias("label")
    ).filter(F.col("day").isin(3, 7))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the DPP-from-broadcast path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        j = spark.read.parquet(path).join(dim, "day")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan or "dynamicpruningexpression" in plan.lower()
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_revenue_filter_full_pushdown(spark, sf_dir):
    """Q6 shape: every predicate reaches PushedFilters and the scan
    reads only the 4 referenced lineitem columns."""
    plan = _plan(spark, "revenue_filter", sf_dir)
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"missing pushdown for {col}"
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_returned_customers_plan_shape(spark, sf_dir):
    """Q10 shape: top-20 runs as TakeOrderedAndProject; customer and
    nation joins broadcast (no shuffle for dims); order-date and
    returnflag predicates push to their scans."""
    plan = _plan(spark, "returned_customers", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_late_shipping_semi_join(spark, sf_dir):
    """Q4 shape: EXISTS must plan as LeftSemi (no duplication, no
    post-join distinct)."""
    plan = _plan(spark, "late_shipping_orders", sf_dir)
    assert "LeftSemi" in plan


def test_no_order_customers_anti_join(spark, sf_dir):
    """Q22 shape: NOT EXISTS plans as LeftAnti; the orders side scans
    only o_custkey + the pushed date filter."""
    plan = _plan(spark, "no_order_customers", sf_dir)
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_large_orders_aggregates_before_join(spark, sf_dir):
    """Q18 shape: the HAVING aggregate must run BELOW the joins (the
    join inputs are aggregate output, not raw lineitem)."""
    plan = _plan(spark, "large_orders", sf_dir)
    opt = plan.split("\n\n")[0] if "\n\n" in plan else plan
    # in the optimized plan the Aggregate on l_orderkey appears under
    # the Join operators — assert textual order: first Join line comes
    # before the last Aggregate line in the tree dump (parents print first)
    lines = plan.splitlines()
    join_idx = [i for i, ln in enumerate(lines) if "Join" in ln]
    agg_idx = [i for i, ln in enumerate(lines) if "Aggregate" in ln or "HashAggregate" in ln]
    assert join_idx and agg_idx
    assert min(join_idx) < max(agg_idx), "aggregate should sit below the joins"


def test_market_share_single_fact_shuffle(spark, sf_dir):
    """Q8 shape: all five dimension joins broadcast — the only
    sort-merge-eligible join is lineitem⋈orders; no dimension may
    force a hash exchange."""
    plan = _plan(spark, "market_share", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    # dims must not shuffle: no exchange hash-partitions on dim keys
    for key in ("c_custkey", "s_suppkey", "n_nationkey", "r_regionkey"):
        assert f"Exchange hashpartitioning({key}" not in plan


def test_gap_fill_windows_are_keyed(spark, sf_dir):
    """Gap fill: the asof carry-forward window must be keyed by
    user_id (distributable), never an unpartitioned window."""
    plan = _plan(spark, "gap_fill_daily", sf_dir)
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln:
            assert "user_id" in ln, f"unkeyed window: {ln.strip()[:160]}"


@pytest.mark.parametrize("query_name", ["dedup_ngram_jaccard", "dedup_ngram_containment"])
def test_ngram_verify_single_lsh_subtree(spark, sf_dir, query_name):
    """The LSH candidate subtree (band bucket-size window over
    band_sig) must appear exactly ONCE in the ngram-verify plan
    (both scores share _ngram_overlap_counts): the join-back shape
    computed the whole shingle→band→self-join pipeline twice —
    doubling the dominant stage at 100 TB."""
    df = REGISTRY[query_name].build(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    windows = [
        ln
        for ln in optimized.splitlines()
        if "windowspecdefinition" in ln and "band_sig" in ln
    ]
    # exactly the band-bucket self-join pair (AQE reuses that exchange
    # at runtime, asserted below); the old join-back shape showed 4
    assert len(windows) == 2, f"band bucket window appears {len(windows)}x"
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, "band self-join exchange not reused at runtime"


def test_global_rank_single_scan_reused_exchange(spark, sf_dir):
    """global_rank must scan its input ONCE: the per-bucket count
    branch derives from the ranked branch's identical Exchange(__pid),
    so the final adaptive plan shows one FileScan and a ReusedExchange
    (the round-2 version scanned 4x — VERDICT r2 'What's wrong' #2)."""
    df = REGISTRY["total_order_sort"].build(spark, sf_dir)
    df.collect()  # finalize THIS queryExecution's adaptive plan
    final = (
        df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert final.count("Scan parquet") == 1, final
    assert "ReusedExchange" in final, final


def test_global_rank_no_per_partition_case_chain(spark, sf_dir):
    """Bucket assignment must be the O(log P) binary-search fold, not
    an O(P) CASE-per-split-point expression chain (codegen blowup at
    thousands of range partitions — ADVICE r2 medium)."""
    from pyspark.sql import functions as F

    from hadoop_main_spark.operators import sorting as S

    df = spark.range(100).select(F.col("id").cast("int").alias("v"))
    specs = S._sort_specs(df, ["v"])
    bounds = [(v,) for v in range(0, 100, 2)]  # 50 split points
    plan = df.withColumn(
        "__pid", S._bucket_id(specs, bounds)
    )._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate() fold, not 50 CASE WHENs
    assert plan.count("CASE WHEN") <= 6, plan
    assert "aggregate(" in plan


def test_mapfile_lookup_prunes_to_one_bucket(spark, sf_dir, tmp_path):
    """MapFile.Reader.get analog: a point lookup must read ONE bucket
    directory (PartitionFilters on __bucket, not a post-scan filter)
    and push the key filter into the scan for row-group skipping."""
    from hadoop_main_spark.sources import layouts as L
    from hadoop_main_spark.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "mapfile")
    L.write_mapfile(cust, path, "c_custkey", n_buckets=8)

    got = L.mapfile_lookup(spark, path, 42)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1][:160]
    assert "__bucket" in pf and "=" in pf, plan
    assert "c_custkey" in plan.split("PushedFilters:")[1][:160], plan

    want = sorted(r.asDict() for r in cust.filter("c_custkey = 42").collect())
    assert sorted(r.asDict() for r in got.collect()) == want
    # a missing key reads one bucket and returns nothing
    assert L.mapfile_lookup(spark, path, -1).count() == 0


def test_lsh_queries_pin_no_storage_and_reuse_exchange(spark, sf_dir):
    """The LSH self-joins must rely on ReusedExchange (identical
    subplans), not cache(): running them must pin NO NEW RDD blocks in
    executor storage (round-2 ADVICE: cache hygiene). Delta-based:
    other operators (connected_components' localCheckpoint) may hold
    blocks from earlier tests in the shared session."""
    before = {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    for q in ("dedup_minhash_lsh", "dedup_simhash_pairs", "hll_distinct_sketch"):
        df = REGISTRY[q].build(spark, sf_dir)
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "InMemoryTableScan" not in final, q
        assert "ReusedExchange" in final, q
    new = [
        i.toString()
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        if i.id() not in before
    ]
    assert not new, new


def test_semantic_dedup_grouped_kernel_no_pair_join(spark, sf_dir):
    """SemDeDup's within-cluster pairing runs as ONE grouped Arrow
    kernel (FlatMapGroupsInPandas after a single cluster exchange):
    no join of any kind may appear — a reintroduced pair self-join
    (the O(pairs)-shuffle shape the kernel replaced) or a cartesian
    product must fail this audit. The JVM-side max_cluster window
    must also sit in the plan so oversized clusters are dropped
    BEFORE the Python worker materializes them."""
    df = REGISTRY["semantic_dedup"].build(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("FlatMapGroupsInPandas") == 1, optimized[:2000]
    plan = optimized + "\n" + df._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert bad not in plan, bad
    # the skew-guard window over the cluster key precedes the kernel
    assert any(
        "windowspecdefinition" in ln and "cluster" in ln
        for ln in plan.splitlines()
    ), "max_cluster guard window missing"


def test_gopher_flags_single_pass_no_shuffle(spark, sf_dir):
    """The quality gate is one narrow projection over documents: no
    Exchange (shuffle) anywhere in the plan, and the scan must prune
    to the two used columns."""
    plan = _plan(spark, "gopher_quality_flags", sf_dir)
    assert "Exchange" not in plan, plan[:2000]
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "doc_id" in read and "text" in read and "source" not in read


def test_token_rarity_partial_agg_and_broadcast_total(spark, sf_dir):
    """Term counting must plan map-side partial aggregation, and the
    one-row corpus total joins via broadcast, not shuffle."""
    plan = _plan(spark, "token_rarity_score", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin BuildRight" in plan or "BroadcastExchange" in plan


def test_tfidf_no_vocabulary_broadcast_hint(spark, sf_dir):
    """The tf x df join keys on term — one row per DISTINCT TERM on
    the df side, a multi-GB broadcast at 100x vocabulary — so it must
    carry NO broadcast hint (verdict-r4 #1). At sf0.001 Catalyst may
    still statistics-auto-broadcast it (correct at small scale, and
    exactly why the decision belongs to the optimizer, not a hint), so
    the audit reads the ANALYZED logical plan: exactly one
    ResolvedHint, and it covers the one-row n_docs total, never the
    term-keyed vocabulary side."""
    df = REGISTRY["tfidf_top_terms"].build(spark, sf_dir)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()
    hints = [i for i, ln in enumerate(lines) if "ResolvedHint" in ln]
    assert len(hints) == 1, f"expected 1 broadcast hint, got {len(hints)}"
    # the hinted subtree (the lines below at deeper indent) must be the
    # one-row total, recognizable by its __n_docs aggregate alias
    subtree = "\n".join(lines[hints[0] : hints[0] + 4])
    assert "__n_docs" in subtree, subtree


def test_repeated_spans_partial_agg_no_window(spark, sf_dir):
    """The span detector must plan map-side partial aggregation over
    the exploded window hashes (one shuffle on the hash) and contain
    no window operator at all — the digest-only groupBy shape."""
    plan = _plan(spark, "repeated_spans", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan
    assert "windowspecdefinition" not in plan


def test_fuzzy_match_variant_equijoin(spark, sf_dir):
    """Fuzzy matching must pair via an equi-join on the deletion
    variant — never a cartesian product — with the bucket-size window
    keyed on the variant (the skew guard)."""
    plan = _plan(spark, "fuzzy_name_match", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(
        "windowspecdefinition" in ln and "__v" in ln for ln in plan.splitlines()
    ), "variant bucket guard window missing"


def test_domain_mix_apply_broadcast_budget(spark, sf_dir):
    """The per-source budget table joins by broadcast (it is tiny by
    definition), and the rank window partitions by source — never an
    unpartitioned window over the documents."""
    plan = _plan(spark, "domain_mix_apply", sf_dir)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln and "source" not in ln:
            pytest.fail(f"window not keyed by source: {ln.strip()[:160]}")


def test_pmi_no_vocabulary_broadcast_hint(spark, sf_dir):
    """pmi_topk joins the vocabulary-sized unigram table TWICE on the
    term — both joins must be unhinted (the tfidf_top_terms lesson);
    the only ResolvedHint is the one-row token total."""
    df = REGISTRY["pmi_topk"].build(spark, sf_dir)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()
    hints = [i for i, ln in enumerate(lines) if "ResolvedHint" in ln]
    assert len(hints) == 1, f"expected 1 broadcast hint, got {len(hints)}"
    assert "__n" in "\n".join(lines[hints[0] : hints[0] + 4])
    # and the result is a top-k merge, not a global sort
    plan = _plan(spark, "pmi_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_graph_queries_no_cartesian_on_data(spark, sf_dir):
    """Triangle counting and PageRank must plan every join as an
    equi-join; the only nested-loop joins allowed are the one-row
    total broadcasts (BroadcastNestedLoopJoin over an Aggregate)."""
    for q in ("triangle_count", "pagerank_top20"):
        plan = _plan(spark, q, sf_dir)
        assert "CartesianProduct" not in plan, q


def test_inverted_index_partial_agg(spark, sf_dir):
    """The postings build must partial-aggregate map-side — one
    shuffle keyed (term, doc), never a term-only hot key."""
    plan = _plan(spark, "inverted_index", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_funnel_3stage_two_aggregations_no_join(spark, sf_dir):
    """The strict funnel is two aggregation levels over ONE events
    scan — no self-joins (the naive per-stage form joins events to
    itself S-1 times)."""
    plan = _plan(spark, "funnel_3stage", sf_dir)
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_skyline_no_quadratic_join(spark, sf_dir):
    """skyline_orders must compile to the bounded-spine sweep (date
    groupBy + broadcast join back), NEVER the oracle's quadratic
    NOT-EXISTS self-join: no nested-loop join, no non-equi join
    condition on price between data-sized inputs."""
    plan = _plan(spark, "skyline_orders", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # spine joins back on order_date


def test_concurrent_peak_day_aggregated_sweep(spark, sf_dir):
    """concurrent_peak's running sum must operate on the day-aggregated
    delta spine: partial aggregation before the window, and the final
    argmax a 1-row TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "concurrent_peak", sf_dir)
    assert plan.count("HashAggregate") >= 2  # partial+final day deltas
    assert "TakeOrderedAndProject" in plan


def test_top_parts_rank_over_aggregated_table(spark, sf_dir):
    """top_parts_per_nation: dimension joins broadcast; the rank
    window consumes the (nation, part) AGGREGATE (HashAggregate feeds
    Window), not raw lineitem rows."""
    plan = _plan(spark, "top_parts_per_nation", sf_dir)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "Window" in plan and "HashAggregate" in plan


def test_bpe_pair_counts_partial_agg_topk(spark, sf_dir):
    """bpe_pair_counts: vocabulary pair counting partial-aggregates
    map-side and the top-20 is a TakeOrderedAndProject, never a full
    sort of the pair table."""
    plan = _plan(spark, "bpe_pair_counts", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in plan


def test_bigram_lm_no_vocabulary_broadcast_hint(spark, sf_dir):
    """bigram_lm_topk joins three vocabulary-sized derived aggregates
    on w1/w2 — each one row per distinct word/bigram, a scale-killer
    broadcast at 100x vocabulary — so only ONE ResolvedHint may exist
    and it must cover the one-row bigram-type total (ttypes)."""
    df = REGISTRY["bigram_lm_topk"].build(spark, sf_dir)
    lines = df._jdf.queryExecution().analyzed().toString().splitlines()
    hints = [i for i, ln in enumerate(lines) if "ResolvedHint" in ln]
    assert len(hints) == 1, f"expected 1 broadcast hint, got {len(hints)}"
    subtree = "\n".join(lines[hints[0] : hints[0] + 4])
    assert "ttypes" in subtree, subtree
    # and the top-20 compiles to a bounded TakeOrderedAndProject
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_train_shuffle_order_no_global_window(spark, sf_dir):
    """train_shuffle_order must use the scalable global_rank path:
    any unpartitioned window may run only over the per-bucket offset
    table (__pid rows), never the data."""
    plan = _plan(spark, "train_shuffle_order", sf_dir)
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln and "__pid" not in ln:
            pytest.fail(f"suspicious unpartitioned window: {ln.strip()[:160]}")


def test_multi_consumer_queries_scan_counts(spark, sf_dir):
    """Re-scan regression guard: queries whose shared derivations are
    checkpointed or windowed must keep their corpus scan counts down
    (pmi was 4, bigram_lm 4, triangle 11, pagerank 10 before the
    round-5 restructures)."""
    for name, max_scans in (
        ("pmi_topk", 2),
        ("bigram_lm_topk", 2),
        ("triangle_count", 2),
        ("pagerank_top20", 2),
    ):
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = plan.count("FileScan")
        assert n <= max_scans, f"{name}: {n} corpus scans (max {max_scans})"


def test_dsir_single_explosion_reused_exchange(spark, sf_dir):
    """dsir_importance's bigram explosion + md5 must run ONCE: both
    consumers (bucket aggregate, score join) reuse the per-(doc,
    source, bucket) partial-agg shuffle at runtime, and the bucket
    table rides as a bounded broadcast (4096 rows by construction)."""
    df = REGISTRY["dsir_importance"].build(spark, sf_dir)
    df.collect()  # AQE stage reuse only shows in the FINAL plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange [doc_id" in plan
    # the reused exchange must sit ABOVE the explosion (post-agg
    # rows), proving the md5 pass is shared, not just the scan
    reused_line = next(ln for ln in plan.splitlines() if "ReusedExchange" in ln)
    assert "count" in reused_line
    assert "BroadcastExchange" in plan


def test_tfidf_and_rarity_single_explosion(spark, sf_dir):
    """The token explosion must be derived ONCE: tfidf computes df as
    a window over the aggregated tf table (one Generate in the plan);
    token_rarity's two consumers reuse the per-(doc,term) partial-agg
    exchange at runtime (round-5 restructure)."""
    df = REGISTRY["tfidf_top_terms"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1, plan.count("Generate explode")

    df2 = REGISTRY["token_rarity_score"].build(spark, sf_dir)
    df2.collect()  # AQE stage reuse shows only in the final plan
    p2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in p2


def test_line_dedup_plan_shape(spark, sf_dir):
    """line_dedup's first-occurrence decision must be keyed on the
    line digest (narrow shuffle), with no cartesian anywhere and at
    most two scans of the documents table (digest branch + rebuild
    branch)."""
    plan = _plan(spark, "line_dedup", sf_dir)
    assert "Exchange hashpartitioning(dg" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") - plan.count("ReusedExchange") <= 2 or (
        plan.count("Scan parquet") <= 2
    )
    # the window that ranks occurrences sorts (dg, id, line_idx) only
    sorts = [
        ln
        for ln in plan.splitlines()
        if "Sort [dg" in ln and "line_idx" in ln
    ]
    assert sorts, "digest-keyed occurrence sort missing"


def test_winnow_queries_plan_shape(spark, sf_dir):
    """Winnowing: gram text must be hashed at the scan — the
    per-document window exchange carries only (doc_id, pos, packed
    key), never the gram or document text — and the pair join must be
    an equi-join on fp (no cartesian)."""
    plan = _plan(spark, "winnow_fingerprints", sf_dir)
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert exchanges, "expected the per-document window exchange"
    assert not any("text" in ln or "__gram" in ln for ln in exchanges), (
        "gram/document text crossed a shuffle"
    )
    pplan = _plan(spark, "winnow_dup_pairs", sf_dir)
    assert "CartesianProduct" not in pplan
    assert "BroadcastNestedLoopJoin" not in pplan
    # candidate join keyed on the selected fingerprint
    assert "Exchange hashpartitioning(fp" in pplan or "fp#" in pplan


def test_scd2_single_shuffle(spark, sf_dir):
    """SCD2 build: every stage (change flag, run-id sum, run aggregate,
    valid_to lead) keys by user_id, so EnsureRequirements must satisfy
    the whole pipeline from ONE exchange (the subset-clustering rule
    lets hashpartitioning(user_id) serve the (user_id, version)
    aggregate too)."""
    plan = _plan(spark, "scd2_user_state", sf_dir)
    phys = plan.split("\n== ", 1)[0] if "== " in plan else plan
    n_exchange = sum(
        1 for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    )
    assert n_exchange <= 1, f"expected one user_id exchange, saw {n_exchange}\n{phys}"


def test_weighted_sample_topk_no_explode(spark, sf_dir):
    """The bounded draw list must fold inside a projection (no
    Generate/explode) and the global top-k must be
    TakeOrderedAndProject, never a full sort exchange."""
    plan = _plan(spark, "weighted_sample_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Generate explode" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_quality_classifier_broadcast_model(spark, sf_dir):
    """The classifier weight table (constant 4096 rows) must join by
    BroadcastHashJoin — the corpus side never re-shuffles onto the
    model key — and the (doc, bucket) count must partial-aggregate."""
    plan = _plan(spark, "quality_classifier_score", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    # no range-partitioned sort anywhere on the data path
    assert "Exchange rangepartitioning" not in plan


def test_ivfpq_broadcast_tables_no_cartesian(spark, sf_dir):
    """IVFADC: the distance table and the probed-cell set must arrive
    by broadcast (constant-size state); no cartesian/BNLJ may touch
    the encoded corpus."""
    plan = _plan(spark, "ivfpq_topk", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # probe cells + dtable


def test_min_cost_supplier_all_broadcast_no_fact_shuffle(spark, sf_dir):
    """Q2 via derived partsupp: every join side is a dimension —
    the executed plan must be all BroadcastHashJoin with no hash
    exchange anywhere (the derived partsupp is |part| x 4 rows, never
    fact-sized)."""
    plan = _plan(spark, "min_cost_supplier", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_excess_stock_single_fact_shuffle(spark, sf_dir):
    """Q20: the (part, supplier) shipment aggregate is the ONLY
    fact-side hash exchange; partsupp/part/supplier/nation broadcast,
    and the quantity fold partial-aggregates before the shuffle."""
    plan = _plan(spark, "excess_stock_suppliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan or "partial" in plan.lower()
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    # the lineitem FACT shuffles exactly once (the shipment agg on
    # l_partkey, l_suppkey); any other exchange must be dimension-sized
    # (the |part|x4 partsupp-derivation distinct, the tiny suppkey
    # distinct) — pinned by keys, not by total count
    fact = [ln for ln in exchanges if "l_partkey" in ln]
    assert len(fact) == 1, exchanges
    assert all("l_" not in ln for ln in exchanges if ln not in fact), exchanges


def test_waiting_suppliers_no_fact_fact_join(spark, sf_dir):
    """Q21: the classic form needs two correlated fact-fact
    (lineitem x lineitem) subqueries; the Spark plan must express both
    as ONE per-order aggregate — no join may have lineitem-derived
    columns on BOTH sides, and the only sort is the final top-k."""
    plan = _plan(spark, "waiting_suppliers", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # the per-order aggregate exists (two countDistincts over one shuffle)
    assert "count(distinct" in plan.lower() or "partial_count" in plan.lower()
    # no cartesian, and the supplier/nation/region side arrives broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the actual invariant: no shuffle join may carry lineitem join keys
    # on BOTH sides (a l_orderkey==l_orderkey self-join is the two-pass
    # correlated-EXISTS shape this plan exists to avoid)
    for ln in plan.splitlines():
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln:
            assert ln.count("l_orderkey") < 2 and ln.count("l_suppkey") < 2, ln
    # the only Sort belongs to the final top-k merge (TakeOrdered does
    # its own per-partition ordering; no other global sort is allowed)
    assert plan.count("Exchange rangepartitioning") == 0, plan


def test_ivfpq_indexed_scan_prunes_to_probed_cells(spark, sf_dir):
    """Verdict-r5 next#3: the materialized-index probe must read ONLY
    the probed cells' code partitions (PartitionFilters IN-list on
    cell, file-level pruning) and never the float vectors — no
    centroid rebuild, no encode pass, no Python eval on the query
    path."""
    plan = _plan(spark, "ivfpq_indexed_topk", sf_dir)
    # the codes scan is partition-pruned on the cell IN-list
    tail = plan.split("PartitionFilters:")
    assert len(tail) >= 2, "codes scan lost its partition filter"
    assert "cell" in tail[1][:120], tail[1][:120]
    # query path reads codes at rest: no embedding column in any scan
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all("embedding" not in ln for ln in reads), reads
    # no encode kernel / centroid aggregation on the probe path
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "posexplode" in plan.lower() or "Generate" in plan  # code unpack only
    assert plan.count("BroadcastHashJoin") >= 2  # probe cells + dtable


def test_frequent_pairs_no_self_join(spark, sf_dir):
    """Pair generation must happen inside the basket array (no basket
    self-join): exactly two exchanges — basket assembly and support
    counting — and no join operator at all."""
    plan = _plan(spark, "frequent_pairs", sf_dir)
    assert "Join" not in plan, "basket self-join crept back in"
    n_exchange = sum(
        1 for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    )
    assert n_exchange <= 2, plan


def test_negative_samples_reuses_positive_aggregate(spark, sf_dir):
    """The positives aggregate feeds BOTH the draw explosion and the
    accidental-hit anti-join; the finalized adaptive plan must compute
    it once (runtime ReusedExchange — requires canonical-identical
    branches: explicit isNotNull on both join keys and NO rename
    collapsing into the right branch's aggregate)."""
    df = REGISTRY["negative_samples"].build(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("ReusedExchange") >= 1, final[:3000]


def test_ivfpq_residual_indexed_scan_prunes_to_probed_cells(spark, sf_dir):
    """The TRUE-IVFADC materialized-index probe must keep the raw
    index's discipline: only the probed cells' residual-code
    partitions are read (PartitionFilters IN-list on cell), no float
    embedding column in any scan on the query path, no Python eval,
    and broadcast joins for the probe/distance-table sides."""
    plan = _plan(spark, "ivfpq_residual_indexed", sf_dir)
    tail = plan.split("PartitionFilters:")
    assert len(tail) >= 2, "codes scan lost its partition filter"
    assert "cell" in tail[1][:120], tail[1][:120]
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all("embedding" not in ln for ln in reads), reads
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # probe cells + dtable


def test_bq_ivf_indexed_scan_prunes_both_stages(spark, sf_dir):
    """Verdict-r7 #3: the materialized IVF-BQ probe must prune BOTH
    persisted scans to the probed cells — the 1-bit code scan feeding
    the Hamming shortlist AND the float-vector scan feeding the exact
    re-rank (PartitionFilters IN-list on cell, file-level pruning).
    The code scan must read codes only (never the embedding column —
    that is the whole point of 32x-compressed candidates), and no
    Python eval appears anywhere on the query path."""
    plan = _plan(spark, "bq_ivf_indexed_topk", sf_dir)
    tails = plan.split("PartitionFilters:")[1:]
    pruned = [t for t in tails if "cell" in t[:120]]
    assert len(pruned) >= 2, f"expected codes+vectors both cell-pruned: {len(pruned)}"
    code_reads = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln and "codes" in ln
    ]
    assert code_reads and all("embedding" not in ln for ln in code_reads), code_reads
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bigram_surprise_single_corpus_explode(spark, sf_dir):
    """Bench r8: the shingle explode + (w1, w2) exchange must run ONCE
    for all three consumers (LM stats windows, total-bigram count,
    per-doc scoring join). Requires canonical-identical branches —
    explicit doc_id isNotNull (the left-outer parent pushes it into
    the join branch) and the c12 > 0 guard that stops column pruning
    from collapsing the count branch (runtime ReusedExchange, the
    negative_samples discipline)."""
    df = REGISTRY["bigram_surprise"].build(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("ReusedExchange") >= 2, final[:3000]
