"""Synthesize the HOT-USER decade fixture /tmp/skew2 — the skew axis
/tmp/skew1 does not cover (round 12).

skew1 stresses hot JOIN KEYS (event_type), hot TOKENS (vocab head) and
fact-scale ordered domains; the per-USER window family — q_sessionize,
q_stream_session, q_top_paths, q_funnel, q_event_transitions,
q_retention_cohort, q_growth_accounting — partitions by user_id, and
its adversarial input is ONE user carrying a macroscopic share of the
stream (a bot, a service account, a null-ish id): the window sort for
that user runs in a single task. Spark's WindowExec buffers each
partition via UnsafeExternalSorter (spills, never OOMs), so the
expected failure mode is a straggler, not a wrong answer — this
fixture exists to TEST that expectation with full oracles, the same
way skew1 tested (and broke) the ranged-window and dedup-broadcast
expectations.

Shape: events x20 (2M rows, event_id offset per replica so ids stay
unique), user_id remapped by a deterministic Zipf-ish rule of
event_id — ~30% of all rows land on user 0, ~20% spread over users
1-9, the rest keep their original (replica-offset) user — so the hot
user's partition is ~600k rows while the tail stays realistic.
Timestamps jitter +replica seconds so the hot user's events are not
duplicated instants (sessionization sees real gaps). Everything else
copies through unreplicated.

Usage: python tools/make_skew2.py  # writes /tmp/skew2, ~30 s
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from news_categorization_big_data_spark.session import get_spark
from news_categorization_big_data_spark.sources.tables import TABLES

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SKEW2_DIR", "/tmp/skew2")
EVENT_COPIES = 20
STRIDE = 100_000_000


def main() -> None:
    spark = get_spark("make-skew2")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    rep = ev.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(EVENT_COPIES - 1)))
    )
    eid = F.col("event_id") + F.col("_r") * STRIDE
    # Deterministic Zipf-ish remap on the UNIQUE replicated id, so the
    # hot assignment is a pure row function (the repo's determinism
    # rule) and reproducible in any engine from the written column.
    bucket = F.pmod(F.xxhash64(eid), F.lit(10))
    user = (
        F.when(bucket < 3, F.lit(0))  # ~30% of the stream on user 0
        .when(bucket < 5, 1 + F.pmod(F.xxhash64(eid, F.lit(1)), F.lit(9)))
        .otherwise(F.col("user_id") + F.col("_r") * STRIDE)
    )
    out = rep.select(
        eid.alias("event_id"),
        (F.col("ts") + F.make_interval(secs=F.col("_r"))).alias("ts"),
        user.cast("long").alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    out.repartition(8).write.mode("overwrite").parquet(
        os.path.join(DST, "events.parquet")
    )
    print(f"events: x{EVENT_COPIES} -> {out.count()} rows, hot-user remap")

    for name in TABLES:
        if name == "events":
            continue
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
        print(f"{name}: copied through")
    print(f"skew2 synthesized at {DST}")
    spark.stop()


if __name__ == "__main__":
    main()
