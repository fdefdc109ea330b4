"""Pin: the r16 native banded join inside q_dedup_mllib_lsh computes the
EXACT recalled-pair set approxSimilarityJoin computed.

q_dedup_mllib_lsh keeps the MLlib estimator surface (HashingTF features,
seed-42 MinHashLSH fit, model.transform hashes) but routes bucket
co-occurrence and the keyDistance verify through engine-native
expressions over unwrap_udt(model outputs). This test re-derives the
reference from approxSimilarityJoin itself on sf0.01 and asserts set
equality both ways, so any drift in the native reimplementation (strict
< threshold, double division order, self-pair handling, the <= ordered
filter) fails loudly.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.text_exprs import word_shingles
from news_categorization_big_data_spark.sources.tables import load_table


def test_native_banded_join_equals_approx_similarity_join(spark, sf_dir):
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    reps = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", word_shingles("text").alias("shingles"))
        .where(F.size("shingles") > 0)
    ).localCheckpoint()
    feats = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18
    ).transform(reps)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)

    joined = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jd")
    ref = (
        joined.where(F.col("datasetA.doc_id") <= F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("_ra"),
            F.col("datasetB.doc_id").alias("_rb"),
        )
        .distinct()
    )

    u = model.transform(feats).select(
        "doc_id",
        F.unwrap_udt("features").getField("indices").alias("_idx"),
        F.transform(
            F.col("hashes"), lambda v: F.unwrap_udt(v).getField("values").getItem(0)
        ).alias("_h8"),
    ).localCheckpoint()
    bands = u.select("doc_id", F.posexplode("_h8").alias("_j", "_h"))
    ba = bands.select(F.col("doc_id").alias("_ra"), "_j", "_h")
    bb = bands.select(F.col("doc_id").alias("_rb"), "_j", "_h")
    cand = (
        ba.join(bb, ["_j", "_h"])
        .where(F.col("_ra") < F.col("_rb"))
        .select("_ra", "_rb")
        .distinct()
    )
    sa = u.select(F.col("doc_id").alias("_ra"), F.col("_idx").alias("_ia"))
    sb = u.select(F.col("doc_id").alias("_rb"), F.col("_idx").alias("_ib"))
    inter = F.size(F.array_intersect("_ia", "_ib")).cast("double")
    union = (F.size("_ia") + F.size("_ib")).cast("double") - inter
    nat = (
        cand.join(sa, "_ra")
        .join(sb, "_rb")
        .where(F.lit(1.0) - inter / union < F.lit(0.3))
        .select("_ra", "_rb")
        .unionByName(
            u.select(F.col("doc_id").alias("_ra"), F.col("doc_id").alias("_rb"))
        )
    )
    assert nat.exceptAll(ref).count() == 0
    assert ref.exceptAll(nat).count() == 0
    assert ref.count() > 0
