"""Local replica of the driver's t2 correctness gate.

Runs every registry query on Spark at a given SF, runs its DuckDB
oracle on the same parquet, and compares: row count, sorted column
names, and exact values (rows sorted by all columns). Stricter than
a value-hash — if this passes, any reasonable hash matches.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from hadoop_main_spark.plans.registry import REGISTRY
from hadoop_main_spark.session import get_spark
from hadoop_main_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    res = {
        "rows": len(spark_pdf),
        "oracle_rows": len(duck_pdf),
        "rows_match": len(spark_pdf) == len(duck_pdf),
        "cols_match": sorted(spark_pdf.columns) == sorted(duck_pdf.columns),
        "values_exact": False,
        "max_abs_diff": None,
    }
    if not (res["rows_match"] and res["cols_match"]):
        return res
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    exact = True
    max_diff = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            eq = (af == bf) | both_nan
            if not eq.all():
                exact = False
                d = (af - bf).abs().max()
                if not math.isnan(d):
                    max_diff = max(max_diff, float(d))
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                exact = False
                max_diff = float("inf")
    res["values_exact"] = exact
    res["max_abs_diff"] = max_diff if not exact else 0.0
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # SPARK_GRAFT_SHUFFLE overrides shuffle parallelism — rerunning the
    # whole sweep at e.g. 5 partitions certifies results are
    # partitioning-independent
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE")
    spark = get_spark(
        "check-correctness", shuffle_partitions=int(shuffle) if shuffle else None
    )
    con = duck_connection(sf_dir)
    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.build(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle — rows-only)")
            continue
        try:
            ddf = con.execute(q.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        r = compare(sdf, ddf)
        status = "PASS " if (r["rows_match"] and r["cols_match"] and r["values_exact"]) else "FAIL "
        if status == "FAIL ":
            failures += 1
        print(f"{status} {name}: {json.dumps(r)} ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
