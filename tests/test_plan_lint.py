"""Registry-wide automatic plan lint (verdict r6 #2): every registry
query's physical plan is checked for the scale anti-patterns in
tools/plan_lint.py — CartesianProduct, single-partition exchange /
unpartitioned window over an un-reduced fact scan, forced broadcast of
an un-reduced fact relation, row-at-a-time Python UDFs.

Unlike the hand-picked audits in test_plan_quality.py, this sweep is
self-enforcing: a FUTURE query that ships one of these shapes fails
here without anyone remembering to add an audit. Hand-audited
exceptions carry a reason string in plan_lint.ALLOWLIST.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_lint import ALLOWLIST, lint_df  # noqa: E402

from hadoop_main_spark.plans.registry import REGISTRY  # noqa: E402


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_lint(spark, sf_dir, name):
    violations = lint_df(REGISTRY[name].build(spark, sf_dir))
    if name in ALLOWLIST:
        assert violations, (
            f"{name} is allowlisted but clean — remove the stale entry: "
            f"{ALLOWLIST[name]}"
        )
        return
    assert not violations, f"{name}: " + "; ".join(violations)


def test_allowlist_names_exist():
    stale = set(ALLOWLIST) - set(REGISTRY)
    assert not stale, f"allowlist entries for unknown queries: {stale}"
