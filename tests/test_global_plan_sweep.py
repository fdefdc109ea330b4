"""Registry-wide physical-plan anti-pattern sweeps, all run over ONE
compile of every registered plan (plan compilation dominates the cost,
so the sweeps share a module-scoped {name: plan_text} fixture;
planning-only — nothing executes):

1. NO CartesianProduct, ever — every pair-generating operator in the
   engine is bucket-local by design (LSH bands, prefix filters, IVF
   cells, grid cells), and the intentional crossJoins are broadcasts of
   dimension-sized frames (BroadcastNestedLoopJoin), which is allowed.
2. NO nondeterministic physical-id expressions — a salt / bucket / id
   derived from monotonically_increasing_id(), spark_partition_id(),
   rand()/randn()/uuid()/shuffle() is recompute-UNSTABLE: under a
   fetch-failure map-task rerun, re-executed rows can land in different
   buckets than copies already fetched by surviving reducers
   (SPARK-23207 double-count/loss class). Round 11 hit exactly this
   with spark_partition_id over a sampled range exchange (see
   functions/ordered.py); round 12 removed the last two sites
   (functions/scale.py salts now hash real row ids). This sweep keeps
   the invariant for every future plan.
"""

from __future__ import annotations

import re

import pytest

from news_categorization_big_data_spark.plans import REGISTRY


@pytest.fixture(scope="module")
def all_plans(spark, sf_dir) -> dict[str, str]:
    return {
        name: (
            spec.builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for name, spec in REGISTRY.items()
    }


def test_no_cartesian_product_anywhere(all_plans):
    offenders = [n for n, plan in all_plans.items() if "CartesianProduct" in plan]
    assert not offenders, offenders


#: Physical expressions whose value depends on execution layout / task
#: attempt rather than on the row. Matched case-insensitively against
#: the executed-plan text; word-bounded so column names merely
#: CONTAINING e.g. "rand" don't false-positive.
_NONDETERMINISTIC = re.compile(
    r"\b(monotonically_increasing_id|spark_partition_id|rand|randn|uuid|shuffle)\(",
    re.IGNORECASE,
)


def test_no_nondeterministic_ids_anywhere(all_plans):
    offenders = {
        n: sorted(set(_NONDETERMINISTIC.findall(plan)))
        for n, plan in all_plans.items()
        if _NONDETERMINISTIC.search(plan)
    }
    assert not offenders, offenders
