"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``hadoop_main_spark`` query registry: every operator
family from SURVEY.md §2 is a registry entry with a Spark builder
and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_main_spark.plans.registry import REGISTRY  # noqa: E402
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    in stable declared registry order."""
    return {name: _wrap(REGISTRY[name].build) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted where not
    SQL-expressible → driver records a rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
