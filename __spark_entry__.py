"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``hadoop_main_spark`` query registry: every operator
family from SURVEY.md §2 is a registry entry with a Spark builder
and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

from hadoop_main_spark.plans.registry import REGISTRY, resolve_oracle  # noqa: E402

# The driver's correctness scale (the contract pins oracle comparison
# at sf0.01).  SPARK_GRAFT_ORACLE_SF_DIR overrides for local runs at a
# different scale so callable oracles derive their data-dependent
# literals from the SAME parquet the Spark side reads.  Deliberately
# NOT SPARK_GRAFT_SF_DIR — that env names the BENCH scale (sf0.1) and
# may be exported globally by the driver.
_DRIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)
from hadoop_main_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return REGISTRY["pricing_summary"].build(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return fn(spark, sf_dir)

    return run


def _last_green_round() -> dict[str, int]:
    """Per-query latest round with a fully-green row in
    CORRECTNESS_r*.json (0 = never driver-green)."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path).rsplit("_r", 1)[-1].split(".")[0])
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue  # malformed sidecar must not break the contract
        for name, row in data.items():
            green = (
                isinstance(row, dict)
                and row.get("err") is None
                and row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _driver_order() -> list[str]:
    """Registry names, least-recently-driver-verified first.

    The driver verifies a bounded window from the FRONT of
    ``queries()``, so ordering by ascending last-green round rotates
    never-checked and stale entries into the window each round while
    recently-green entries cycle to the back.  Ties keep declared
    registry order (sorted() is stable), so the rotation is
    deterministic for a given set of CORRECTNESS files.
    """
    last = _last_green_round()
    return sorted(REGISTRY, key=lambda n: last.get(n, 0))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    least-recently-driver-verified first (see _driver_order)."""
    return {name: _wrap(REGISTRY[name].build) for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted where not
    SQL-expressible → driver records a rows-only check). Callable
    oracle templates resolve against the driver's correctness scale
    (sf0.01) — they derive data-dependent literals Spark-free via
    pyarrow, see registry.resolve_oracle."""
    out: dict[str, str] = {}
    for name in _driver_order():
        try:
            sql = resolve_oracle(REGISTRY[name], _DRIVER_SF_DIR)
        except Exception:
            # One failing resolver (missing table at this scale, a
            # pyarrow error, ...) must not break the ENTIRE oracle
            # map — fall back to the driver's rows-only check for
            # just that query (the same per-query isolation
            # tools/check_correctness.py applies).
            continue
        if sql is not None:
            out[name] = sql
    return out
