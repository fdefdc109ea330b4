"""Tier-C similarity search over `embeddings` (SURVEY.md §2.12):
brute-force cosine top-k, k-NN label voting, IVF-bucketed ANN, and
embedding-cosine near-duplicate pairs.

Oracle note: both engines compute the dot product as a sequential fold
over the 64 float32 elements cast to double, so the doubles agree to the
last ulp and round(…, 4) is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    cosine,
)
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table


def _o_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def _o_cos(a: str, b: str) -> str:
    return f"({_o_dot(a, b)} / (sqrt({_o_dot(a, a)}) * sqrt({_o_dot(b, b)})))"


@register(
    "q_sim_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (SELECT e.vec_id, {_o_cos('e.embedding', 'q.q_emb')} AS c
               FROM embeddings e, q WHERE e.vec_id <> 0)
    SELECT vec_id, round(c, 4) AS score,
           CAST(row_number() OVER (ORDER BY c DESC, vec_id) AS INT) AS nn_rank
    FROM scored ORDER BY c DESC, vec_id LIMIT 10
    """,
    tier="C",
    doc="Brute-force cosine top-10 for a query vector (vec_id=0, excluded "
    "from candidates). Spark plans TakeOrderedAndProject — per-partition "
    "heap, no global sort; the linear-scan baseline every ANN variant is "
    "measured against.",
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    out = brute_force_topk(emb.where(F.col("vec_id") != 0), query, k=10)
    return out.withColumn("nn_rank", F.col("nn_rank").cast("int"))


@register(
    "q_knn_label",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id IN (0, 1, 2)),
    scored AS (SELECT q.query_id, e.vec_id, e.label,
                      {_o_cos('e.embedding', 'q.q_emb')} AS c
               FROM embeddings e, q WHERE e.vec_id <> q.query_id),
    nn AS (SELECT query_id, label FROM (
             SELECT query_id, label,
                    row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rn
             FROM scored) WHERE rn <= 5),
    votes AS (SELECT query_id, label, COUNT(*) AS n_votes FROM nn GROUP BY 1, 2)
    SELECT query_id, label AS pred_label, n_votes FROM (
      SELECT query_id, label, n_votes,
             row_number() OVER (PARTITION BY query_id ORDER BY n_votes DESC, label) AS rn
      FROM votes) WHERE rn = 1
    """,
    tier="C",
    doc="k-NN label voting (k=5, 3 query points): majority label of the "
    "nearest neighbors, ties → lowest label. Queries are broadcast; "
    "per-query ranking is one window over the scored candidates.",
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", cosine("embedding", "q_emb").alias("_c"))
    )
    w_nn = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    nn = scored.withColumn("_rn", F.row_number().over(w_nn)).where(F.col("_rn") <= 5)
    votes = nn.groupBy("query_id", "label").agg(F.count("*").alias("n_votes"))
    w_top = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("_rn", F.row_number().over(w_top))
        .where(F.col("_rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )


@register(
    "q_sim_ann_ivf",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
                  WHERE vec_id < 8),
    assigned AS (SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_o_cos('e.embedding', 'c.c_emb')} DESC, c.cent_id) AS rn
        FROM embeddings e, cent c) WHERE rn = 1),
    q AS (SELECT a.cent_id AS q_cell, e.embedding AS q_emb
          FROM assigned a JOIN embeddings e ON e.vec_id = 0 AND a.vec_id = 0),
    bucket AS (SELECT e.vec_id, e.embedding FROM embeddings e
               JOIN assigned a ON a.vec_id = e.vec_id
               JOIN q ON a.cent_id = q.q_cell
               WHERE e.vec_id <> 0),
    scored AS (SELECT b.vec_id, {_o_cos('b.embedding', 'q.q_emb')} AS c FROM bucket b, q)
    SELECT vec_id, round(c, 4) AS score,
           CAST(row_number() OVER (ORDER BY c DESC, vec_id) AS INT) AS nn_rank
    FROM scored ORDER BY c DESC, vec_id LIMIT 5
    """,
    tier="C",
    doc="IVF-bucketed ANN: vectors are pre-assigned to their nearest of 8 "
    "seed centroids (deterministic: the first 8 corpus vectors); a query "
    "searches only its own cell — scan cost / n_cells, the scale path. "
    "Recall vs brute force asserted in tests/test_similarity.py.",
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    assigned = assign_cells(emb, centroids)
    q_cell = assigned.where(F.col("vec_id") == 0).select(
        F.col("cent_id").alias("q_cell"), F.col("embedding").alias("q_emb")
    )
    bucket = (
        assigned.crossJoin(F.broadcast(q_cell))
        .where((F.col("cent_id") == F.col("q_cell")) & (F.col("vec_id") != 0))
    )
    scored = bucket.select("vec_id", cosine("embedding", "q_emb").alias("_score"))
    top = scored.orderBy(F.desc("_score"), F.asc("vec_id")).limit(5)
    w = Window.orderBy(F.desc("_score"), F.asc("vec_id"))
    return top.select(
        "vec_id",
        F.round("_score", 4).alias("score"),
        F.row_number().over(w).cast("int").alias("nn_rank"),
    )


@register(
    "q_dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_o_cos('a.embedding', 'b.embedding')}, 4) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_o_cos('a.embedding', 'b.embedding')} >= 0.35
    """,
    tier="C",
    doc="Embedding-cosine near-duplicate pairs (threshold 0.35 — above the "
    "99.9th percentile of this corpus's pair distribution). Brute-force "
    "pairing here for oracle parity; at corpus scale run the same "
    "predicate over IVF-cell- or LSH-bucketed candidates only "
    "(q_sim_ann_ivf shows the bucketing machinery).",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_categorization_big_data_spark.functions.partitioning import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    a = fan_out(emb).select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    sim = cosine("emb_a", "emb_b")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(sim >= 0.35)
        .select("vec_a", "vec_b", F.round(sim, 4).alias("cos_sim"))
    )


@register(
    "q_sim_ann_lsh",
    oracle=None,  # MLlib hyperplanes are Spark-internal → rows-only check
    tier="C",
    doc="Random-hyperplane ANN via MLlib BucketedRandomProjectionLSH: "
    "approxNearestNeighbors for the vec_id=0 query. Recall vs brute force "
    "asserted in tests/test_similarity.py.",
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    key = emb.where(F.col("vec_id") == 0).select("features").head()[0]
    out = model.approxNearestNeighbors(emb.where(F.col("vec_id") != 0), key, 10)
    return out.select("vec_id", "label", F.round("distCol", 4).alias("l2_dist"))
