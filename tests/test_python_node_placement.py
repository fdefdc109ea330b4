"""Sweep: no native Filter ABOVE a Python eval node in any registered
plan.

The round-3 lesson (SURVEY §4.2): Catalyst will not push a native
predicate below a MapInPandas / ArrowEvalPython barrier, so a filter
written after the Python stage runs on the Python node's full output —
the Python workers process rows the query then throws away. The fix is
a convention ("place cheap native predicates before UDF stages"); this
sweep makes the convention enforceable for EVERY registered query: any
Filter that is an ANCESTOR of a Python node in the executed plan must
reference at least one column the Python node produced (i.e. it could
not have been evaluated before the Python stage).

Tree-walk notes: the executed-plan string prints root first, children
indented; a node's ancestors are the nearest preceding lines at each
strictly smaller depth. Sibling branches (the other side of a join)
are NOT ancestors and are correctly skipped by the min-depth walk.
"""

from __future__ import annotations

import re

import pytest

from news_categorization_big_data_spark.plans import REGISTRY

PY_NODES = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInArrow",
    "PythonMapInArrow",
)


def _depth_and_text(line: str) -> tuple[int, str]:
    """Depth = column where the operator text starts (after the tree
    prefix of '+- ', ':- ', ': ', '   ' runs); codegen markers like
    '*(3) ' are part of the text and stripped for matching."""
    m = re.match(r"^[\s:+\-]*", line)
    start = m.end()
    return start, line[start:]


def _filters_above_python(plan: str) -> list[str]:
    lines = [ln for ln in plan.splitlines() if ln.strip()]
    parsed = [_depth_and_text(ln) for ln in lines]
    offenders: list[str] = []
    for i, (d, text) in enumerate(parsed):
        if not any(p in text for p in PY_NODES):
            continue
        # walk upward: ancestors are lines at strictly decreasing depth
        min_depth = d
        for j in range(i - 1, -1, -1):
            dj, tj = parsed[j]
            if dj >= min_depth:
                continue
            min_depth = dj
            if tj.lstrip("*(0123456789) ").startswith("Filter"):
                offenders.append(tj.strip())
    return offenders


def _python_output_cols(plan: str) -> set[str]:
    """Column names (with expr ids, e.g. foo#123) that appear in a
    Python node's own bracket list — its produced attributes."""
    cols: set[str] = set()
    for ln in plan.splitlines():
        if any(p in ln for p in PY_NODES):
            cols |= set(re.findall(r"(\w+#\d+)", ln))
    return cols


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_native_filter_above_python_node(spark, sf_dir, name):
    df = REGISTRY[name].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if not any(p in plan for p in PY_NODES):
        pytest.skip("no Python node in plan")
    offenders = _filters_above_python(plan)
    if not offenders:
        return
    # A filter above the Python node is legitimate ONLY if it references
    # a column the Python node produced (it could not run earlier).
    produced = _python_output_cols(plan)
    for f in offenders:
        refs = set(re.findall(r"(\w+#\d+)", f))
        assert refs & produced, (
            f"{name}: native Filter above a Python node references only "
            f"pre-existing columns — move it below the Python stage:\n{f}\n\n{plan}"
        )
