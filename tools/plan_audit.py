"""Print the formatted physical plan of every bench headline query (or
any named query) at the bench scale factor — the one-command audit for
the scale claims in SCALE.md: check PushedFilters reach the scans,
dimension joins say BroadcastHashJoin, top-k says TakeOrderedAndProject,
and WholeStageCodegen spans cover the hot expressions.

Usage:
    python tools/plan_audit.py                 # bench headline set
    python tools/plan_audit.py q_tpch_q5 ...   # specific queries
    python tools/plan_audit.py --times         # round-11 planning-time
        audit: build() + analyze/optimize/physical-plan wall time for
        EVERY registered query, slowest first — driver-side cost a
        cluster never amortizes per-query locally (round-10 VERDICT
        item 7). Queries whose builder runs a deliberate build-time
        action (IVF centroid fit, graph convergence probes) are the
        expected heavy tail; pure expression-tree queries past ~0.5 s
        are hoist candidates.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _times_mode(spark, sf_dir: str) -> None:
    from news_categorization_big_data_spark.functions.cachepin import release_pins
    from news_categorization_big_data_spark.plans import REGISTRY

    # Warm the JVM/py4j/file-listing paths so the first measured query
    # doesn't absorb session startup (~4s observed on the first build).
    spark.range(1).count()
    REGISTRY["q_scan_parquet"].builder(spark, sf_dir)._jdf.queryExecution().executedPlan()

    # Two passes: pass 1 = the cold cost driver_sim pays (includes each
    # table's one-time footer/listing via the load_table frame cache);
    # pass 2 = steady-state per-query planning cost, the number that
    # matters for a long-lived driver repeatedly planning queries.
    passes = []
    for _ in range(2):
        rows = []
        for name, spec in REGISTRY.items():
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # analyze+optimize+plan
            t_plan = time.perf_counter() - t0
            rows.append((name, t_build, t_plan))
        release_pins()
        passes.append(rows)
    for label, rows in zip(("COLD (pass 1)", "STEADY (pass 2)"), passes):
        rows = sorted(rows, key=lambda r: -(r[1] + r[2]))
        tot_b = sum(r[1] for r in rows)
        tot_p = sum(r[2] for r in rows)
        print(f"\n{label}")
        print("| query | build (s) | plan (s) | total (s) |")
        print("|---|---|---|---|")
        for name, b, p in rows[:20]:
            print(f"| {name} | {b:.3f} | {p:.3f} | {b + p:.3f} |")
        print(
            f"| REGISTRY TOTAL ({len(rows)} queries) | {tot_b:.3f} | {tot_p:.3f} "
            f"| {tot_b + tot_p:.3f} |"
        )


def main() -> None:
    from bench import HEADLINE  # single source of truth for the set
    from news_categorization_big_data_spark.plans import REGISTRY
    from news_categorization_big_data_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    spark = get_spark("plan-audit")
    if args == ["--times"]:
        _times_mode(spark, sf_dir)
        spark.stop()
        return
    names = args or HEADLINE
    for name in names:
        spec = REGISTRY[name]
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        spec.builder(spark, sf_dir).explain(mode="formatted")
    spark.stop()


if __name__ == "__main__":
    main()
