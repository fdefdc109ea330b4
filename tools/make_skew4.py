"""Synthesize the NULL-HEAVY fixture /tmp/skew4 — the fourth skew axis
(round 12): hot NULL keys and null/empty payloads.

skew1/2/3 stress hot values, hot window partitions, and giant rows —
always with clean, non-null keys. Production streams are not clean:
unauthenticated traffic carries null user_ids (often a macroscopic
share — the null group IS the hot key), instrumentation gaps null out
values/props, and crawls deliver null or empty texts. Three distinct
failure classes live here:

- the null GROUP: groupBy/window partitions route every null key to
  one reducer (Spark and DuckDB both treat NULL as a groupable value
  — the fixture proves the engines agree under volume);
- null JOIN keys: equi-joins DROP null keys (SQL three-valued logic)
  while outer joins keep the row — a plan that accidentally
  "preserves" null matches diverges from the oracle immediately;
- null ORDERING: Spark's default is ASC NULLS FIRST, DuckDB's is ASC
  NULLS LAST — any window/sort over a NULLABLE order column that
  relies on engine defaults produces different row_numbers. A hash
  MISMATCH here is the fixture working: the fix is an explicit null
  ordering on both sides, never a default.

Shape: sf0.1 events re-keyed by deterministic hash rules —
~30% of rows get user_id NULL (the unauthenticated share), ~20% get
value NULL, ~10% get props NULL; documents get ~5% text NULL + ~5%
text '' + ~10% lang NULL. Everything else copies through. All
nulling is a pure function of event_id/doc_id (the repo's determinism
rule), so both engines derive identical tables from the written
parquet.

Usage: python tools/make_skew4.py  # writes /tmp/skew4, ~30 s
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
DST = os.environ.get("SPARK_GRAFT_SKEW4_DIR", "/tmp/skew4")


def _null_if(col, key_col, seed: int, pct: int):
    """NULL out `col` on a deterministic pct% of rows."""
    return F.when(
        F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(100)) < pct, F.lit(None)
    ).otherwise(F.col(col))


def main() -> None:
    spark = get_spark("make-skew4")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    out = ev.select(
        "event_id",
        "ts",
        _null_if("user_id", "event_id", 1, 30).cast("long").alias("user_id"),
        "event_type",
        _null_if("value", "event_id", 2, 20).alias("value"),
        _null_if("props", "event_id", 3, 10).alias("props"),
    )
    out.repartition(8).write.parquet(os.path.join(DST, "events.parquet"))
    stats = spark.read.parquet(os.path.join(DST, "events.parquet")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("null_user"),
        F.sum(F.col("value").isNull().cast("int")).alias("null_value"),
    )
    print(f"events: {stats.collect()[0]}")

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    bucket = F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(100))
    text = (
        F.when(bucket < 5, F.lit(None))
        .when(bucket < 10, F.lit(""))
        .otherwise(F.col("text"))
    )
    dout = docs.select(
        "doc_id",
        text.alias("text"),
        _null_if("lang", "doc_id", 8, 10).alias("lang"),
        "source",
    ).withColumn("n_chars", F.length("text"))
    dout.repartition(4).write.parquet(os.path.join(DST, "documents.parquet"))
    dstats = spark.read.parquet(os.path.join(DST, "documents.parquet")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("text").isNull().cast("int")).alias("null_text"),
        F.sum((F.col("text") == "").cast("int")).alias("empty_text"),
        F.sum(F.col("lang").isNull().cast("int")).alias("null_lang"),
    )
    print(f"documents: {dstats.collect()[0]}")

    for name in TABLES:
        if name in ("events", "documents"):
            continue
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
        print(f"{name}: copied through")
    print(f"skew4 synthesized at {DST}")
    spark.stop()


if __name__ == "__main__":
    main()
