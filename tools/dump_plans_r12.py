"""Dump plans for the r12 optimization ledger.

Writes, per query:
  plans/r12/<query>_<tag>.txt        explain("formatted") (static plan)
  plans/r12/<query>_<tag>_final.txt  AQE-final executed plan (only with
                                     --final): the query is collect()ed
                                     and the runtime-reoptimized plan is
                                     read back, FINAL section only — the
                                     evidence for runtime ReusedExchange
                                     claims (verdict-r11 #4: a noop write
                                     creates its own QueryExecution whose
                                     executedPlan is the PRE-AQE plan, and
                                     executedPlan().toString() prints both
                                     final and initial plans, doubling
                                     node counts; both traps are handled
                                     here).

Usage: python tools/dump_plans_r12.py <tag> [--final] [query ...]
       SPARK_GRAFT_SF_DIR=... python tools/dump_plans_r12.py before
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


def final_plan_text(df) -> str:
    """Collect the frame and return the AQE-final executed plan text
    (the section before 'Initial Plan', i.e. the runtime-reoptimized
    tree with ReusedExchange / AQEShuffleRead nodes resolved)."""
    df.collect()
    full = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints "<final plan>\n+- == Initial Plan ==\n..."
    marker = "== Initial Plan =="
    if marker in full:
        full = full.split(marker)[0].rstrip().rstrip("+-").rstrip()
    return full


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--final"]
    want_final = "--final" in sys.argv[1:]
    tag = args[0] if args else "before"
    names = args[1:] or [n for n, q in REGISTRY.items() if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans-r12")
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
        if want_final:
            fp = os.path.join(out_dir, f"{name}_{tag}_final.txt")
            with open(fp, "w") as f:
                f.write(
                    f"# {name} — AQE-final executedPlan (post-collect, "
                    f"final section only) at {sf_dir} [{tag}]\n\n"
                )
                f.write(final_plan_text(df).rstrip() + "\n")
            print("wrote", fp)
    spark.stop()


if __name__ == "__main__":
    main()
