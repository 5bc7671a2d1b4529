"""Job counters (reference: MRC/mapreduce/Counter.java:1,
TaskCounter.java:28) as Spark accumulators.

The engine-level counters (records read, shuffle bytes, spills) are
already on Spark's UI/REST metrics; this module covers the *user*
counter surface — named counters incremented from expressions or
Python UDF code and read on the driver after an action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Counters:
    """Named long counters backed by Spark accumulators."""

    def __init__(self, spark: SparkSession):
        self._sc = spark.sparkContext
        self._acc: dict[str, object] = {}

    def counter(self, name: str):
        if name not in self._acc:
            self._acc[name] = self._sc.accumulator(0)
        return self._acc[name]

    def value(self, name: str) -> int:
        return int(self.counter(name).value)

    def values(self) -> dict[str, int]:
        return {k: int(v.value) for k, v in self._acc.items()}


def count_matching(df: DataFrame, **predicates: Column) -> dict[str, int]:
    """Declarative counter pass: one narrow aggregation computing all
    named predicate counts at once (the DataFrame-native way to get
    'counter' semantics without accumulator plumbing)."""
    # coalesce: F.sum over ZERO rows is NULL, which would break the
    # dict[str, int] contract on an empty frame (review-r4b)
    aggs = [
        F.coalesce(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(name)
        for name, pred in predicates.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: row[name] for name in predicates}
