#!/usr/bin/env python
"""Default vs 100-TB-profile interleaved A/B on the skewed decade
fixture (tools/make_skew1.py) — the regime the profile valves exist for.

For each query: (1) assert default and profile outputs are IDENTICAL
(collect + sorted compare — any timing of non-identical plans is void),
(2) time both arms back-to-back per rep, noop sink, clearCache between
reps. Prints a markdown table.

Usage: python tools/skew_profile_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from news_categorization_big_data_spark.functions.cachepin import release_pins
from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.session import get_spark

#: bench.py's PROFILE_100TB — imported values duplicated deliberately so
#: this tool pins what the profile WAS when the table was recorded.
PROFILE = {
    "spark.graft.window.ranged": "true",
    "spark.graft.rarity.headK": "1000",
}

#: The profile-sensitive shapes on this fixture + one neutrality
#: control (q_gini_spend orders over orders' distinct cents, which the
#: fixture leaves domain-scale).
QUERIES = [
    "q_lift_bands",       # ranged showcase: ~10M distinct scores
    "q_ml_auc",           # ranged showcase: same ordered table, AUC form
    "q_token_rarity",     # headK showcase: 3 hot keys carry ~55% of stream
    "q_peak_concurrency", # ranged, but us-domain stays ~200k (near-neutral)
    "q_gini_spend",       # control: fixture leaves its ordered table alone
]


def set_profile(spark, on: bool) -> None:
    for k, v in PROFILE.items():
        spark.conf.set(k, v if on else ("false" if v == "true" else "0"))


def run_once(spark, name: str, sf_dir: str, on: bool) -> float:
    set_profile(spark, on)
    spark.catalog.clearCache()
    release_pins()
    t = time.perf_counter()
    REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("skew-profile-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    # identity first
    for name in QUERIES:
        outs = {}
        for on in (False, True):
            set_profile(spark, on)
            spark.catalog.clearCache()
            release_pins()
            outs[on] = sorted(map(tuple, REGISTRY[name].builder(spark, sf_dir).collect()))
        assert outs[False] == outs[True], f"{name}: default/profile outputs differ — A/B void"
        print(f"{name}: outputs identical ({len(outs[False])} rows)", flush=True)

    times = {n: {"default": [], "profile": []} for n in QUERIES}
    for _ in range(reps):
        for name in QUERIES:
            times[name]["default"].append(run_once(spark, name, sf_dir, False))
            times[name]["profile"].append(run_once(spark, name, sf_dir, True))
    release_pins()

    print("| query | default (s) | profile (s) | default/profile |")
    print("|---|---|---|---|")
    td = tp = 0.0
    for name in QUERIES:
        d, p = min(times[name]["default"]), min(times[name]["profile"])
        td += d
        tp += p
        print(f"| {name} | {d:.3f} | {p:.3f} | {d / p:.2f}x |")
    print(f"| TOTAL | {td:.3f} | {tp:.3f} | {td / tp:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
