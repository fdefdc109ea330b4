"""Registry-wide physical-plan anti-pattern sweep: NO registered query
may plan a CartesianProduct, ever — every pair-generating operator in
the engine is bucket-local by design (LSH bands, prefix filters, IVF
cells, grid cells), and the 11 intentional crossJoins are broadcasts
of dimension-sized frames (BroadcastNestedLoopJoin), which is allowed.
Planning-only: builds and compiles every plan, executes nothing."""

from __future__ import annotations

from news_categorization_big_data_spark.plans import REGISTRY


def test_no_cartesian_product_anywhere(spark, sf_dir):
    offenders = []
    for name, spec in REGISTRY.items():
        plan = (
            spec.builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders
