"""Synthesize an sf1-scale dataset from the driver's sf0.1 testdata by
replicating fact rows 10x with FK-consistent key offsets, so the bench
can be run one decade up from its usual point: `python tools/make_sf1.py
&& SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py`.

Why synthetic: the driver generates testdata only at sf{0.001,0.01,0.1}
(TESTDATA.md); /root/testdata is read-only. The 2x-of-baseline bench bar
is defined at matching sf, but a 10x point validates the engine's
scaling claims (SCALE.md) — a super-linear term invisible at sf0.1 shows
up here.

Replication model (mirrors how real warehouses grow):
- FACTS scale 10x with offset surrogate keys: events (event_id), orders
  (o_orderkey), lineitem (l_orderkey follows orders), documents
  (doc_id), embeddings (vec_id).
- DIMENSIONS stay fixed (region/nation/customer/supplier/part), so fact
  FKs into them remain valid and join selectivity is preserved — dims
  grow far slower than facts in any real system.
- documents text gets a per-replica suffix token so the dedup tier keeps
  realistic selectivity (10 verbatim copies of the corpus would collapse
  to sf0.1 after exact dedup and inflate every near-dup bucket 10x).
- events keep their timestamps (same 30-day span, 10x the density —
  how traffic actually grows); user_id is NOT offset so per-user
  behavioral queries see 10x-longer histories.
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
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
COPIES = 10
#: Offset stride per replica — far above any source key.
STRIDE = 100_000_000

#: table -> columns to offset per replica (surrogate keys only; FKs into
#: fixed dimensions are left untouched).
OFFSET_KEYS = {
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    spark = get_spark("make-sf1")
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for name in TABLES:
        src_path = os.path.join(SRC, f"{name}.parquet")
        dst_path = os.path.join(DST, f"{name}.parquet")
        df = spark.read.parquet(src_path)
        if name not in OFFSET_KEYS:
            # fixed dimension: copy through spark so the file layout is
            # uniform (single write, preserved schema)
            df.write.mode("overwrite").parquet(dst_path)
            print(f"{name}: dimension copied", flush=True)
            continue
        rep = df.select(
            "*", F.explode(F.array(*[F.lit(i) for i in range(COPIES)])).alias("_rep")
        )
        for key in OFFSET_KEYS[name]:
            rep = rep.withColumn(key, F.col(key) + F.col("_rep") * F.lit(STRIDE))
        if name == "documents":
            rep = rep.withColumn(
                "text",
                F.when(F.col("text") == "", F.col("text")).otherwise(
                    F.concat("text", F.lit(" rep"), F.col("_rep").cast("string"))
                ),
            )
        rep.drop("_rep").write.mode("overwrite").parquet(dst_path)
        print(f"{name}: x{COPIES} facts written", flush=True)
    spark.stop()
    print(f"sf1 synthesized at {DST}")


if __name__ == "__main__":
    main()
