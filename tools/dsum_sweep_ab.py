#!/usr/bin/env python
"""Interleaved A/B for the round-11 dsum sweep: each converted query
timed under DSUM_MODE='decimal' (the pre-sweep DECIMAL aggregation
buffer) vs DSUM_MODE='limb' (shipped), through the SAME registered
builder, noop sink (no count() pruning), clearCache between reps,
A/B interleaved within each rep so ambient drift hits both arms.

Usage: python tools/dsum_sweep_ab.py [sf_dir] [reps] [q1 q2 ...]
Prints one row per query: decimal best, limb best, ratio.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from news_categorization_big_data_spark.functions.cachepin import release_pins
from news_categorization_big_data_spark.plans import REGISTRY, relational
from news_categorization_big_data_spark.session import get_spark

#: The queries the round-11 sweep converted (commit da3aae1).
#: q_grouped_regression was converted then REVERTED (0.8x at both
#: sf0.1 and sf1 — see SCALE.md round 11); kept here so re-running
#: the A/B reproduces the negative result through the same harness.
SWEPT = [
    "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
    "q_tpch_q9", "q_tpch_q10", "q_tpch_q14", "q_tpch_q17", "q_tpch_q18",
    "q_tpch_q19", "q_tpch_q22",
    "q_decay_agg", "q_zscore_outliers", "q_join_bucketed",
    "q_grouped_regression", "q_hhi_concentration", "q_grouped_moments",
    "q_salted_agg", "q_bloom_join", "q_calibration_ece",
    "q_incremental_agg", "q_ab_ttest", "q_ewma_smooth",
    "q_null_semantics", "q_anova_f", "q_did_effect", "q_pq_assign",
    "q_rrf_fusion", "q_scan_zorder", "q_sink_partitioned_roundtrip",
    "q_cusum_changepoint", "q_semi_additive", "q_ivm_join_agg",
    "q_attrib_channel", "q_rfm_segments",
]


def run_once(spark, name: str, sf_dir: str, mode: str) -> float:
    relational.DSUM_MODE = mode
    try:
        spark.catalog.clearCache()
        release_pins()
        t = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t, 3)
    finally:
        relational.DSUM_MODE = "limb"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or SWEPT
    spark = get_spark("dsum-sweep-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # JVM warm

    times: dict[str, dict[str, list[float]]] = {n: {"decimal": [], "limb": []} for n in names}
    for _ in range(reps):
        for name in names:
            # interleave the arms back-to-back per rep
            times[name]["decimal"].append(run_once(spark, name, sf_dir, "decimal"))
            times[name]["limb"].append(run_once(spark, name, sf_dir, "limb"))
    release_pins()

    print(f"| query | decimal (s) | limb (s) | decimal/limb |")
    print("|---|---|---|---|")
    tot_d = tot_l = 0.0
    for name in names:
        d, l = min(times[name]["decimal"]), min(times[name]["limb"])
        tot_d += d
        tot_l += l
        print(f"| {name} | {d:.3f} | {l:.3f} | {d / l:.2f}x |")
    print(f"| TOTAL (sum of bests) | {tot_d:.3f} | {tot_l:.3f} | {tot_d / tot_l:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
