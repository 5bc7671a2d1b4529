"""Unit tests for the temporal operators (as-of join, range join,
sessionization) on tiny hand-enumerable DataFrames."""

import datetime as dt

from pyspark.sql import functions as F

from hadoop_main_spark.operators import joins as J
from hadoop_main_spark.operators import sessions as SES


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3")],
        ["k", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "c1"), (1, _ts(20), "c2"), (2, _ts(6), "c3")],
        ["k", "ts", "cid"],
    )
    out = {
        r.pid: r.cid
        for r in J.asof_join(left, right, on="k", value_cols=["cid"]).collect()
    }
    # equal timestamps match (inclusive); later right rows don't leak back
    assert out == {"p1": "c1", "p2": "c2", "p3": None}


def test_asof_join_no_right_rows_for_key(spark):
    left = spark.createDataFrame([(9, _ts(1), "p")], ["k", "ts", "pid"])
    right = spark.createDataFrame([(1, _ts(0), "c")], ["k", "ts", "cid"])
    rows = J.asof_join(left, right, on="k", value_cols=["cid"]).collect()
    assert len(rows) == 1 and rows[0].cid is None


def test_range_count_join_window_edges(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0), 100),
            (1, _ts(0, 30), 101),   # 30s after 100 → inside 1-min window
            (1, _ts(1), 102),       # exactly 60s after 100 → inclusive edge
            (1, _ts(3), 103),       # outside
            (2, _ts(0, 10), 200),   # other key, never joins key 1
        ],
        ["k", "ts", "event_id"],
    )
    out = {
        r.event_id: r.n_follow
        for r in J.range_count_join(df, "k", id_col="event_id", window_us=60_000_000).collect()
    }
    # 100 sees 101 and 102; 101 sees 102; ids with no followers are absent
    assert out == {100: 2, 101: 1}


def test_sessionize_gap_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(0), 1),
            (1, _ts(20), 2),    # 20 min gap → same session (30-min gap rule)
            (1, _ts(55), 3),    # 35 min gap → new session
            (2, _ts(0), 4),
        ],
        ["user_id", "ts", "event_id"],
    )
    sess = {
        r.event_id: r.session_id
        for r in SES.sessionize(df).collect()
    }
    assert sess == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = {r.user_id: (r.n_sessions, r.n_events, r.longest_session_events)
             for r in SES.session_stats(df).collect()}
    assert stats == {1: (2, 3, 2), 2: (1, 1, 1)}


def test_ivf_indexed_matches_inmemory(spark, sf_dir, tmp_path):
    """Materialized IVF index returns the same neighbors as the
    in-memory IVF path, and the probe scan prunes to the probed
    cells' partitions."""
    from hadoop_main_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )
    from hadoop_main_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf_idx")
    build_ivf_index(e, path, "label")
    got = ivf_topk_indexed(spark, path, q, k=5, nprobe=2)
    want = ivf_topk(e, q, "label", k=5, nprobe=2)
    g = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
    w = {(r.query_id, r.rank): r.neighbor_id for r in want.collect()}
    assert g == w and len(g) == 25
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters:")[1][:120]
