"""Interleaved A/B of ``dsum`` vs ``dsum_fin`` — the measured cost of
the poison → NULL non-finite contract on its WORST-CASE shape (a query
that is nothing but the guarded aggregate).

Round 13 measured ~7% at sf0.1 (medians 0.396 s vs 0.425 s, 8
interleaved reps); round-13 VERDICT item 7 asks for the same number at
sf1, where the shuffle dominates and the one boolean MAX per group
should amortize further. Arms are interleaved within each rep so
ambient drift hits both equally; noop sink (no count() pruning);
clearCache between runs.

Usage: python tools/poison_cost_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from news_categorization_big_data_spark.plans.relational import dsum, dsum_fin
from news_categorization_big_data_spark.session import get_spark
from news_categorization_big_data_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("poison-cost-ab")
    spark.range(1).count()
    ev = load_table(spark, sf_dir, "events")

    def run(agg) -> float:
        spark.catalog.clearCache()
        df = ev.groupBy("event_type").agg(agg("value", 6).alias("s"))
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - start

    plain: list[float] = []
    guarded: list[float] = []
    for i in range(reps):
        # alternate which arm goes first inside the rep
        if i % 2 == 0:
            plain.append(run(dsum))
            guarded.append(run(dsum_fin))
        else:
            guarded.append(run(dsum_fin))
            plain.append(run(dsum))
    mp = statistics.median(plain)
    mg = statistics.median(guarded)
    print(f"sf_dir={sf_dir} reps={reps}")
    print(f"dsum     runs: {[round(x, 3) for x in plain]}  median {mp:.3f}s")
    print(f"dsum_fin runs: {[round(x, 3) for x in guarded]}  median {mg:.3f}s")
    print(f"poison-contract overhead: {((mg / mp) - 1) * 100:.1f}%")
    spark.stop()


if __name__ == "__main__":
    main()
