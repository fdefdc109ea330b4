"""Vector similarity operators over `array<float>` embedding columns.

All vector math is native Column algebra (`zip_with` + `aggregate` fold
in doubles) — JVM-side, no Python in the loop. Strategies:

- **brute-force top-k** (the correctness baseline): broadcast the (tiny)
  query side against the full corpus; global top-k via orderBy+limit →
  TakeOrderedAndProject (per-partition heaps, driver merges k rows).
  Linear scan per query — right up to ~10^7 corpus rows per executor
  core, and embarrassingly parallel beyond.
- **IVF (the scale path)**: assign every vector to its nearest centroid
  once (broadcast centroids), then answer queries inside the query's
  cell only — scan cost divided by n_cells at a small recall cost.
  Cell assignment is also how you'd partition the parquet at rest.
- **random-hyperplane LSH** via MLlib BucketedRandomProjectionLSH for
  the approximate join variant (plans/similarity.py, rows-only check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.functions.partitioning import fan_out


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two float-array columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q_emb",
) -> DataFrame:
    """Top-k cosine neighbors of a single broadcast query vector.

    Returns (id, score, nn_rank) sorted best-first. Deterministic: ties
    broken on the id column.
    """
    scored = fan_out(corpus).crossJoin(F.broadcast(query)).select(
        id_col, cosine(vec_col, query_vec_col).alias("_score")
    )
    top = scored.orderBy(F.desc("_score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("_score"), F.asc(id_col))  # k rows only — safe
    return top.select(
        id_col, F.round("_score", 4).alias("score"), F.row_number().over(w).alias("nn_rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "c_emb",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (ties → lowest id).

    One broadcast of the centroid table; no shuffle of the corpus.
    """
    scored = fan_out(corpus).crossJoin(F.broadcast(centroids)).withColumn(
        "_cscore", cosine(vec_col, cent_vec_col)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cscore"), F.asc(cent_id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_cscore", cent_vec_col)
    )
