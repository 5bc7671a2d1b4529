"""Query registry: every operator family from SURVEY.md §2 exposed as
a named query over the TESTDATA tables, each with a DuckDB oracle.

The registry is the single source of truth consumed by
``__spark_entry__.queries()`` / ``oracle_sql()``, by the pytest
suite, and by ``bench.py`` — so an operator is "done" exactly when
its registry entry verifies against the oracle.

Column-name discipline: every computed column is aliased
identically in the Spark build and the oracle SQL (the driver's
compare sorts columns by name before hashing). Float discipline:
money sums go through DECIMAL (exact, order-independent) and are
cast to double only at the end; means/stddevs are derived from
exact sums (see operators/aggregate.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_main_spark.tables import load_table


@dataclass
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over pre-registered views, or None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a dict assignment would SILENTLY drop the earlier query
            # from the driver contract (review-r5: a new 3-stage funnel
            # nearly shadowed the existing funnel_conversion)
            raise ValueError(f"duplicate registry query name: {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), bench)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Import side-effect modules that populate REGISTRY.
from hadoop_main_spark.plans import core_queries  # noqa: E402,F401
from hadoop_main_spark.plans import llm_queries  # noqa: E402,F401
from hadoop_main_spark.plans import misc_queries  # noqa: E402,F401
from hadoop_main_spark.plans import extended_queries  # noqa: E402,F401
from hadoop_main_spark.plans import analytic_queries  # noqa: E402,F401
