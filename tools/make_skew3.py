"""Synthesize the GIANT-DOCUMENT fixture /tmp/skew3 — the row-SIZE skew
axis neither /tmp/skew1 (hot keys/tokens) nor /tmp/skew2 (hot window
partitions) covers (round 12).

Every documents-table consumer implicitly assumes docs are small: the
per-doc token explode (one input row fanning out into 10^6 generated
rows inside ONE task), the per-doc shingle sets behind the dedup
family, the Arrow batches carrying whole texts through mapInPandas
codecs (batch bytes = rows x text size, not rows), the per-doc
collect_list buffers (summarizer — clamped at MAX_INPUT_CHARS by the
reference's truncation contract, which this fixture exercises for
real), and the char-level regex scans (q_pii_scrub's sequential CTE
chain over megabyte strings). At 100 TB a web crawl carries such rows
(multi-MB boilerplate pages, concatenated logs, minified JS). Expected
failure modes are per-task memory spikes and Arrow batch blowups —
wrong answers would mean a size-dependent semantic bug, which is what
the oracle protocol exists to catch.

Shape: the 5000 sf0.1 documents with TEXT REPLACED for the 208 lowest
doc_ids — doc_ids 0-7 become giant (two each at ~1/2/4/8 MB), doc_ids
8-207 become big (~32 KB). Replacement text is a deterministic
concatenation of the corpus's OWN texts (block j of doc d is the text
whose doc_id rank is pmod(xxhash64(d, j), 5000)), so vocabulary and
shingle statistics stay corpus-realistic — a giant doc is "more of the
same corpus", not a degenerate single-token repeat (that regime is
q_simhash_hamming's valve territory, tested on skew1). lang/source
pass through; n_chars is recomputed to match (consumers trust it).
All other tables copy through unreplicated.

Usage: python tools/make_skew3.py  # writes /tmp/skew3, ~1 min
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from news_categorization_big_data_spark.session import get_spark
from news_categorization_big_data_spark.sources.tables import TABLES

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SKEW3_DIR", "/tmp/skew3")

# (first doc_id, count, blocks per doc): one corpus text block is
# ~300 chars, so 28000 blocks ~ 8 MB. Total replaced volume ~ 36 MB.
SPEC = [
    (0, 2, 28_000),  # ~8 MB
    (2, 2, 14_000),  # ~4 MB
    (4, 2, 7_000),  # ~2 MB
    (6, 2, 3_500),  # ~1 MB
    (8, 200, 110),  # ~32 KB mid-tail
]


def main() -> None:
    spark = get_spark("make-skew3")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n_docs = docs.count()

    # Corpus blocks addressable by dense rank (doc_id order) — the
    # block index a giant doc's hash picks must be reproducible from
    # the written data alone (the repo's determinism rule).
    idx = docs.select(
        (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("bidx"),
        F.col("text").alias("btext"),
    )

    spec_rows = [
        (int(first + i), int(blocks))
        for first, count, blocks in SPEC
        for i in range(count)
    ]
    spec = spark.createDataFrame(spec_rows, "doc_id long, n_blocks int")

    blocks = spec.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_blocks") - 1)).alias("j"),
    ).withColumn("bidx", F.pmod(F.xxhash64("doc_id", "j"), F.lit(n_docs)))
    giant_text = (
        blocks.join(idx, "bidx")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "btext"))),
                    lambda s: s["btext"],
                ),
            ).alias("new_text")
        )
    )

    out = (
        docs.join(giant_text, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("new_text", "text").alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    out.repartition(8).write.mode("overwrite").parquet(
        os.path.join(DST, "documents.parquet")
    )
    stats = spark.read.parquet(os.path.join(DST, "documents.parquet")).agg(
        F.count("*"), F.max("n_chars"), F.sum("n_chars")
    )
    print(f"documents: {stats.collect()[0]} (rows, max chars, total chars)")

    for name in TABLES:
        if name == "documents":
            continue
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
        print(f"{name}: copied through")
    print(f"skew3 synthesized at {DST}")
    spark.stop()


if __name__ == "__main__":
    main()
