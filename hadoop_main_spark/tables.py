"""Loaders for the TESTDATA.md parquet tables.

One loader per table so schema quirks are handled in exactly one
place (the `events` table is written with nanosecond timestamps,
which Spark reads as long under
``spark.sql.legacy.parquet.nanosAsLong`` — we convert to a proper
microsecond timestamp with integer division, no float rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        # ts arrives either as int64 nanoseconds (truncate, not round,
        # to µs) or — newer testdata — as timestamp[us] without UTC
        # adjustment, which Spark reads as TIMESTAMP_NTZ. Normalize to
        # a session-tz timestamp (tz pinned UTC in session.tune) so
        # unix_micros()/window arithmetic downstream keeps working.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # FLOOR division: `div` truncates toward zero, rounding
            # pre-epoch nanos UP a microsecond (review-r4b); exact
            # integer floor keeps negatives correct too
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")),
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql queries)."""
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
