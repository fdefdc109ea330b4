"""Synthesize the SKEWED decade fixture the 100-TB profile exists for
(round-10 VERDICT "Next round" #3): /tmp/skew1.

At uniform sf1 the profile valves are cost-neutral (+5.5%, noise edge
— SCALE.md round 10) because the shapes they rewrite never bind there:
the ordered-window tables stay value-domain-sized and the vocab head is
only ~0.4% of the token stream. This fixture builds the regime the
valves target, at a scale this box can still run:

- ``events`` x100 replicas (10M rows) with ``value`` JITTERED onto a
  near-unique cents grid (+ (rep*100000 + event_id mod 100000)/100):
  the distinct-score tables q_lift_bands / q_ml_auc order over become
  FACT-SCALE (~10M rows) instead of domain-scale (~50k) — the regime
  where the default single-task global window is the whole job and
  ``spark.graft.window.ranged`` parallelizes it. event_id and user_id
  offset per replica (unique events; 100x users).
- ``documents`` x10 (50k docs) with a Zipf-hot suffix: every non-empty
  text gains 24 repetitions of a 3-token hot head, pushing ~55% of the
  exploded token stream onto 3 keys — the regime where the vocab
  shuffle-join's hot-key task is the straggler and
  ``spark.graft.rarity.headK`` broadcasts the head around the shuffle.
- everything else copies through unreplicated (dimensions by design;
  orders/lineitem/embeddings because no profile valve touches them —
  q_gini_spend is included in the A/B as a neutrality control, not a
  showcase).

Values stay on the cents grid (exact in DECIMAL(18,2) on both engines)
so the profile-identity check can hash-compare default vs profile.

Usage: python tools/make_skew1.py  # writes /tmp/skew1, ~1 min
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
DST = os.environ.get("SPARK_GRAFT_SKEW1_DIR", "/tmp/skew1")
EVENT_COPIES = 100
DOC_COPIES = 10
STRIDE = 100_000_000

#: The hot head appended to every document (x HOT_REPS). Three tokens
#: already frequent in the corpus, so the head is a heavier version of
#: the real distribution, not an artificial alien key.
HOT_PHRASE = " spark window table"
HOT_REPS = 24


def main() -> None:
    spark = get_spark("make-skew1")
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for name in TABLES:
        src_path = os.path.join(SRC, f"{name}.parquet")
        dst_path = os.path.join(DST, f"{name}.parquet")
        df = spark.read.parquet(src_path)
        if name == "events":
            rep = df.select(
                "*",
                F.explode(
                    F.array(*[F.lit(i).cast("long") for i in range(EVENT_COPIES)])
                ).alias("_rep"),
            )
            rep = (
                rep.withColumn("event_id", F.col("event_id") + F.col("_rep") * F.lit(STRIDE))
                .withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(STRIDE))
                .withColumn(
                    "value",
                    F.round(
                        F.col("value")
                        + (
                            F.col("_rep") * F.lit(100_000)
                            + F.col("event_id") % F.lit(100_000)
                        ).cast("double")
                        / F.lit(100.0),
                        2,
                    ),
                )
            )
            rep.drop("_rep").repartition(32).write.mode("overwrite").parquet(dst_path)
            print(f"events: x{EVENT_COPIES}, near-unique cents-grid values", flush=True)
        elif name == "documents":
            rep = df.select(
                "*",
                F.explode(F.array(*[F.lit(i) for i in range(DOC_COPIES)])).alias("_rep"),
            )
            rep = rep.withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(STRIDE))
            rep = rep.withColumn(
                "text",
                F.when(F.col("text") == "", F.col("text")).otherwise(
                    F.concat(
                        "text",
                        F.lit(" rep"),
                        F.col("_rep").cast("string"),
                        F.lit(HOT_PHRASE * HOT_REPS),
                    )
                ),
            )
            rep.drop("_rep").write.mode("overwrite").parquet(dst_path)
            print(f"documents: x{DOC_COPIES}, Zipf-hot head appended", flush=True)
        else:
            df.write.mode("overwrite").parquet(dst_path)
            print(f"{name}: copied through", flush=True)
    spark.stop()
    print(f"skew1 synthesized at {DST}")


if __name__ == "__main__":
    main()
