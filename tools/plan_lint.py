"""Registry-wide physical-plan lint (verdict r6 #2).

The 56 hand-picked audits in tests/test_plan_quality.py pin specific
queries' shapes; this module makes the scale discipline SELF-ENFORCING
for every registry query, present and future: walk the physical plan
tree and flag the anti-patterns that sink a 100 TB run regardless of
which operator produced them.

Rules (each returns a violation string):
 R1  CartesianProduct anywhere — an all-pairs join over non-broadcast
     inputs never survives scale-up.
 R2  Exchange SinglePartition whose subtree scans a FACT table with no
     cardinality reducer in between (partial aggregate / limit /
     top-k) — a single task would absorb the whole fact table.
 R3  a FORCED broadcast (ResolvedHint in the analyzed plan) whose
     subtree scans a FACT table with no reducer — broadcasting
     fact-scale data ships the table to every executor and pins it in
     memory. Statistics-driven BroadcastExchanges are deliberately NOT
     flagged: at fixture scale Catalyst auto-broadcasts sub-10MB fact
     slices, which is correct behavior that self-reverts at real
     scale; only a hint survives the scale-up (the tfidf audit
     precedent, NOTES r5).
 R4  Unpartitioned Window whose subtree scans a FACT table with no
     reducer — the single-task funnel (same failure as R2, caught at
     the operator that causes it).
 R5  BatchEvalPython — a row-at-a-time Python UDF on any data path
     (the repo's discipline is Arrow-batched kernels only).

FACT tables are the ones that grow with the dataset (lineitem, orders,
events, documents, embeddings); the rest are bounded dimensions.
Reducers: a partial aggregate, limit, or top-k between the scan and
the flagged node bounds the rows that reach it.  Filters deliberately
do NOT count — selectivity at fixture scale proves nothing at 100 TB.

Hand-audited exceptions live in ALLOWLIST (query name -> reason); the
parametrized test in tests/test_plan_lint.py fails on any
un-allowlisted violation.
"""

from __future__ import annotations

FACTS = ("lineitem", "orders", "events", "documents", "embeddings")

# Cardinality reducers: any of these between a fact scan and the
# flagged exchange/broadcast/window bounds the data volume.
REDUCERS = (
    "partial_",  # map-side combine of HashAggregate/SortAggregate/ObjectHashAggregate
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
    "AggregateInPandas",
    "FlatMapGroupsInPandas",  # grouped kernels emit per-group summaries
)

PREFIX_CHARS = " :+-"


def _nodes(plan: str) -> list[tuple[int, str]]:
    """Parse a Spark tree string into (depth, node_text) rows; depth is
    the length of the ``+- :  `` prefix (3 chars per level), so a
    node's subtree is the following rows with strictly greater depth."""
    out = []
    for ln in plan.splitlines():
        if not ln.strip():
            continue
        i = 0
        while i < len(ln) and ln[i] in PREFIX_CHARS:
            i += 1
        if i >= len(ln):
            continue
        out.append((i, ln[i:]))
    return out


def _subtree(nodes: list[tuple[int, str]], i: int) -> list[str]:
    d = nodes[i][0]
    j = i + 1
    sub = []
    while j < len(nodes) and nodes[j][0] > d:
        sub.append(nodes[j][1])
        j += 1
    return sub


def _is_fact_scan(text: str) -> bool:
    if "FileScan" not in text and "Scan parquet" not in text:
        return False
    return any(f"/{f}.parquet" in text or f"/{f}/" in text for f in FACTS)


def _unreduced_fact(sub: list[str]) -> bool:
    has_fact = any(_is_fact_scan(t) for t in sub)
    has_reducer = any(any(r in t for r in REDUCERS) for t in sub)
    return has_fact and not has_reducer


def _window_is_unpartitioned(text: str) -> bool:
    """In the tree string a window spec prints
    ``windowspecdefinition(part..., order ASC/DESC ..., frame)``;
    with no partition columns the FIRST argument is already a sort
    spec or the frame itself."""
    k = text.find("windowspecdefinition(")
    if k < 0:
        return False
    head = text[k + len("windowspecdefinition(") :].split(",", 1)[0]
    return (" ASC" in head) or (" DESC" in head) or head.startswith(
        "specifiedwindowframe"
    )


def lint_plan(plan: str) -> list[str]:
    """Lint one physical-plan tree string; returns violation strings
    (empty = clean)."""
    nodes = _nodes(plan)
    out = []
    for i, (_d, text) in enumerate(nodes):
        if text.startswith("CartesianProduct"):
            out.append(f"R1 CartesianProduct: {text[:140]}")
        elif "Exchange SinglePartition" in text and not text.startswith("ReusedExchange"):
            if _unreduced_fact(_subtree(nodes, i)):
                out.append(
                    f"R2 single-partition exchange over un-reduced fact scan: {text[:140]}"
                )
        elif "Window" in text and _window_is_unpartitioned(text):
            if _unreduced_fact(_subtree(nodes, i)):
                out.append(f"R4 unpartitioned window over un-reduced fact: {text[:140]}")
        elif text.startswith("BatchEvalPython"):
            out.append(f"R5 row-at-a-time Python UDF: {text[:140]}")
    return out


# Analyzed-plan Relation signature columns for the fact tables
# (analyzed Relation lines carry columns, not file paths).
FACT_COLS = ("l_orderkey#", "o_orderkey#", "event_id#", "doc_id#", "vec_id#")

# Logical-plan cardinality reducers (analyzed-plan node names).
LOGICAL_REDUCERS = (
    "Aggregate",
    "GlobalLimit",
    "LocalLimit",
    "Deduplicate",
    "FlatMapGroupsInPandas",
)


def _is_fact_relation(text: str) -> bool:
    return (
        text.startswith("Relation")
        and "parquet" in text
        and any(c in text for c in FACT_COLS)
    )


def lint_hints(analyzed: str) -> list[str]:
    """R3 on the ANALYZED plan: a broadcast() HINT wrapping an
    un-reduced fact relation is a decision the author forced — unlike
    a statistics-driven broadcast it does not self-revert at scale."""
    nodes = _nodes(analyzed)
    out = []
    for i, (_d, text) in enumerate(nodes):
        if text.startswith("ResolvedHint") and "broadcast" in text:
            sub = _subtree(nodes, i)
            has_fact = any(_is_fact_relation(t) for t in sub)
            reduced = any(
                any(t.startswith(r) for r in LOGICAL_REDUCERS) for t in sub
            )
            if has_fact and not reduced:
                out.append(f"R3 forced broadcast of un-reduced fact relation: {text[:140]}")
    return out


def lint_df(df) -> list[str]:
    qe = df._jdf.queryExecution()
    # executedPlan BEFORE execution: with AQE this is the initial
    # static plan — exactly what a planner review would read.
    return lint_plan(qe.executedPlan().toString()) + lint_hints(
        qe.analyzed().toString()
    )


# Hand-audited exceptions: query name -> reason. Keep this SHORT — a
# growing allowlist means the lint is being routed around.
ALLOWLIST: dict[str, str] = {
    "ann_ivf": (
        "the hinted broadcast is the QUERY-VECTOR side (embeddings "
        "filtered to the 10 probe ids) — bounded by the probe contract, "
        "not statistics; the corpus side is never hinted. The lint "
        "cannot see that the filter is an id-list bound."
    ),
    "ann_ivf_trained": (
        "same shape as ann_ivf: _probe_cells hints the query-vector side "
        "(embeddings filtered to the 10 probe ids — bounded by the probe "
        "contract); the trained-cell corpus side is never hinted."
    ),
    "ivfpq_topk": (
        "same shape as ann_ivf: the hinted subtree is the filter-bounded "
        "probe-vector set; the codes/corpus sides are unhinted."
    ),
    "bq_ivf_rerank_topk": (
        "same shape as ann_ivf: _probe_cells hints the query-vector side "
        "(embeddings filtered to the 5 probe ids — bounded by the probe "
        "contract); the cell-pruned code/corpus sides are unhinted. The "
        "indexed twin (bq_ivf_indexed_topk) needs no entry — its probe "
        "frame is a driver-collected LocalRelation."
    ),
}


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from hadoop_main_spark.plans.registry import REGISTRY
    from hadoop_main_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("plan-lint")
    bad = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            vs = lint_df(q.build(spark, sf_dir))
        except Exception as e:  # build failure is its own finding
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
            bad += 1
            continue
        if vs:
            tag = "ALLOW" if name in ALLOWLIST else "FAIL "
            bad += name not in ALLOWLIST
            for v in vs:
                print(f"{tag} {name}: {v}", flush=True)
        else:
            print(f"ok    {name}", flush=True)
    spark.stop()
    raise SystemExit(1 if bad else 0)
