"""Print the formatted physical plan of every bench headline query (or
any named query) at the bench scale factor — the one-command audit for
the scale claims in SCALE.md: check PushedFilters reach the scans,
dimension joins say BroadcastHashJoin, top-k says TakeOrderedAndProject,
and WholeStageCodegen spans cover the hot expressions.

Usage:
    python tools/plan_audit.py                 # bench headline set
    python tools/plan_audit.py q_tpch_q5 ...   # specific queries
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    from bench import HEADLINE  # single source of truth for the set
    from news_categorization_big_data_spark.plans import REGISTRY
    from news_categorization_big_data_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("plan-audit")
    for name in names:
        spec = REGISTRY[name]
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        spec.builder(spark, sf_dir).explain(mode="formatted")
    spark.stop()


if __name__ == "__main__":
    main()
