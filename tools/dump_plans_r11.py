"""Dump `explain(formatted)` plans for the optimization-round ledger.

Writes plans/r11/<query>_<tag>.txt for each named query (default: the
bench headline set) at the bench scale (sf0.1 unless overridden) —
the before/after evidence files the optimization round commits.

Usage: python tools/dump_plans_r11.py <tag> [query ...]
       SPARK_GRAFT_SF_DIR=... python tools/dump_plans_r11.py before
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_main_spark.plans.registry import REGISTRY
from hadoop_main_spark.session import get_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n, q in REGISTRY.items() if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans-r11")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted) at {sf_dir} [{tag}]\n\n")
            f.write(buf.getvalue().rstrip() + "\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
