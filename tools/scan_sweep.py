"""Registry-wide executed-plan scan/exchange counter — the sweep that
found the unionAll-of-report-rows amplifier in round 7 (q_dq_checks
13 scans -> 3, q_funnel 6 -> 1; SCALE.md "Round 7 (late)"), committed
as a tool so the audit is re-runnable instead of ad-hoc.

For every registered query (or the names passed on argv), compile the
executed plan at sf0.001 and count `Scan parquet` sources and
`Exchange SinglePartition` nodes. Mostly planning-only — but a handful
of builders do driver-side work at BUILD time (the MLlib queries fit a
model, q_sim_ann_lsh collects its query vector, checkpointing plans
may materialize), so a full-registry sweep runs real jobs and takes a
few minutes, not seconds. A report
query re-evaluating a shared aggregate subtree per output row shows up
as scans >> the number of distinct tables it reads — Spark does not
common identical subplans, so each unionAll branch re-plans the whole
subtree.

Usage:
    python tools/scan_sweep.py                      # whole registry
    python tools/scan_sweep.py q_funnel q_dq_checks # specific queries
    python tools/scan_sweep.py --min-scans 3        # only flag >= 3
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_categorization_big_data_spark.functions.plan_text import (  # noqa: E402
    uncached_file_scans,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from news_categorization_big_data_spark.plans import REGISTRY
    from news_categorization_big_data_spark.session import get_spark

    argv = sys.argv[1:]
    min_scans = 0
    names = []
    i = 0
    while i < len(argv):
        if argv[i].startswith("--min-scans"):
            if "=" in argv[i]:
                min_scans = int(argv[i].split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                min_scans = int(argv[i])
            else:
                sys.exit("usage: scan_sweep.py [--min-scans N] [q_name ...]")
        else:
            names.append(argv[i])
        i += 1
    names = names or list(REGISTRY)
    spark = get_spark("scan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        try:
            plan = (
                REGISTRY[name]
                .builder(spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            # persisted subtrees render their cached child plan inside
            # EVERY InMemoryTableScan reader, so the raw count
            # over-counts: report the scans that actually hit storage
            # per run (uncached) and the cache-read count separately.
            # (A localCheckpoint instead truncates lineage into a
            # Scan ExistingRDD — also counted as a cache read.)
            scans = uncached_file_scans(plan, "Scan parquet")
            single = len(re.findall(r"Exchange SinglePartition", plan))
            cache_reads = len(re.findall(r"InMemoryTableScan", plan)) + len(
                re.findall(r"Scan ExistingRDD", plan)
            )
            rows.append((name, scans, single, cache_reads, None))
        except Exception as ex:  # streaming-only shapes etc.
            rows.append((name, -1, -1, -1, f"{type(ex).__name__}: {str(ex)[:80]}"))
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':34s} {'scans':>5s} {'1-part-exch':>11s} {'cache-reads':>11s}")
    for name, scans, single, cache_reads, err in rows:
        if err:
            print(f"{name:34s}   ERR {err}")
        elif scans >= min_scans:
            print(f"{name:34s} {scans:5d} {single:11d} {cache_reads:11d}")
    spark.stop()


if __name__ == "__main__":
    main()
