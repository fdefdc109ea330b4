"""Full-registry sf1 timing sweep (r15 VERDICT item 3): time ALL
registered queries at the decade point so optimization targeting is not
blind — the headline bench covers 30 of 284 and the sf1 cost of the rest
was unknown.

Method mirrors bench.py's discipline at sweep scale: noop sink (full
plan, nothing prunes), clearCache between runs (no cross-rep
memoization), N INTERLEAVED full passes with per-query min (a noisy-
neighbor burst must span the whole multi-hour sweep to poison a min),
setJobDescription labels. Output: one JSON line per query to stdout as
it lands (crash-tolerant) + a final sorted JSON object, to be committed
as a table in OPTIMIZATION_r16.md.

Usage: python tools/sweep_sf1.py [out.json]
Env:   SPARK_GRAFT_SWEEP_SF (default /tmp/sf1), SPARK_GRAFT_SWEEP_REPS
       (default 2), SPARK_GRAFT_SWEEP_ONLY (comma list, default all).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/tmp/sf1")
    reps = int(os.environ.get("SPARK_GRAFT_SWEEP_REPS", "2"))
    only = os.environ.get("SPARK_GRAFT_SWEEP_ONLY", "")
    names = [n for n in (only.split(",") if only else REGISTRY) if n]
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_sf1.json"

    spark = get_spark("ncbds-sweep-sf1")
    spark.range(1).count()  # JIT/session warm

    per: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    for p in range(reps):
        for name in names:
            if name in errors:
                continue
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sweep {name} pass {p}")
            t0 = time.perf_counter()
            try:
                REGISTRY[name].builder(spark, sf_dir).write.format(
                    "noop"
                ).mode("overwrite").save()
            except Exception as ex:  # noqa: BLE001 — record, keep sweeping
                errors[name] = f"{type(ex).__name__}: {str(ex)[:200]}"
                print(json.dumps({"q": name, "pass": p, "err": errors[name]}),
                      flush=True)
                continue
            dt = round(time.perf_counter() - t0, 3)
            per[name].append(dt)
            print(json.dumps({"q": name, "pass": p, "sec": dt}), flush=True)

    from news_categorization_big_data_spark.functions.cachepin import release_pins

    release_pins()
    timings = {n: min(r) for n, r in per.items() if r}
    result = {
        "sf_dir": sf_dir,
        "reps": reps,
        "n": len(timings),
        "total_min_sec": round(sum(timings.values()), 1),
        "timings": dict(sorted(timings.items(), key=lambda kv: -kv[1])),
        "errors": errors,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("WROTE", out_path, "total", result["total_min_sec"], "s over",
          len(timings), "queries;", len(errors), "errors", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
