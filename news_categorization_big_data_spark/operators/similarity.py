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
- **sign-random-projection (SRP) LSH** for the pairwise near-dup join:
  a deterministic md5-derived ±1 hyperplane matrix maps each vector to
  a bit signature; banded signatures give candidate pairs via compact
  equi-joins (same shape as the MinHash bands in operators/dedup.py),
  and exact cosine is verified on candidates only. Because the
  hyperplanes are md5-derived constants, the whole pipeline is
  reproducible in the DuckDB oracle.
- **random-hyperplane LSH** via MLlib BucketedRandomProjectionLSH for
  the approximate join variant (plans/similarity.py, rows-only check).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.functions.partitioning import fan_out
from news_categorization_big_data_spark.operators.dedup import LSH_MAX_DF, banded_pairs


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


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance fold over two ALREADY-double array columns
    (no per-element cast inside — both callers cast/construct double
    arrays first, and adding a cast would change the expression tree
    the stamped hashes pin). The exact-reference fold shared by the
    MLlib semi-oracles (q_ml_kmeans fixed-init WSS, q_sim_ann_lsh
    brute-force top-k), kept in ONE place so both semi-oracle
    reference computations stay the same expression tree."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


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


#: SRP signature width and banding for the embedding near-dup join.
#: P(bit agrees) = 1 - θ/π; a pair is a candidate iff all bits of ≥1 band
#: agree, i.e. P = 1 - (1 - p^r)^b with r = BITS/BANDS. With 16 bits in
#: 4 bands of 4: recall ≈ 0.95 at cosine 0.9, ≈ 0.45 at cosine 0.35, and
#: an orthogonal pair is a candidate with P ≈ 0.23 — the work drops ~4×
#: vs all-pairs while catching production-threshold (≥0.8) near-dups
#: reliably. Raise BITS (and bands) for a sharper curve at corpus scale.
SRP_BITS = 16
SRP_BANDS = 4


def srp_signs(bits: int = SRP_BITS, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix, md5-derived per (bit, coord).

    The constants — not the generator — are the operator contract: the
    DuckDB oracle bakes the same matrix into its SQL, so both engines
    compute bit-identical signatures.
    """
    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16) & 1 else -1.0
            for i in range(dim)
        ]
        for j in range(bits)
    ]


def srp_signature(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SRP_BITS,
    dim: int = 64,
) -> DataFrame:
    """(id, bit0..bit{bits-1}) sign-random-projection signature rows.

    Each bit is sign(embedding · h_j) for the deterministic hyperplane
    h_j — `bits` independent zip_with/aggregate folds, all inside
    whole-stage codegen, zero shuffle.

    ``dim`` MUST equal the embedding width: a mismatched vector would
    fold to NULL bits (zip_with null-padding) and every such row would
    share one degenerate band key — a quadratic bucket. Rows whose
    width differs from ``dim`` are therefore dropped here, explicitly.
    """
    signs = srp_signs(bits, dim)
    cols = [
        (dot(vec_col, F.array(*[F.lit(s) for s in signs[j]])) > 0)
        .cast("int")
        .alias(f"bit{j}")
        for j in range(bits)
    ]
    return fan_out(df).where(F.size(vec_col) == dim).select(id_col, *cols)


def srp_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "vec_id",
    bits: int = SRP_BITS,
    bands: int = SRP_BANDS,
    max_df: int | None = LSH_MAX_DF,
) -> DataFrame:
    """Banded SRP candidate pairs (id_a, id_b): all bits of ≥1 band agree.

    Same linear-shuffle shape as the MinHash LSH in operators/dedup.py:
    explode to (band_idx, band_key), group into buckets, emit pairs
    inside buckets only — no pairwise work outside hash buckets.
    ``max_df`` forwards to banded_pairs' bucket skew cap; the default is
    the shared LSH_MAX_DF, and ``None`` means UNCAPPED — the same
    semantics as lsh_candidate_pairs and simhash_hamming_pairs.
    """
    rows = bits // bands
    band_keys = [
        F.concat_ws(
            "", *[F.col(f"bit{j}").cast("string") for j in range(b * rows, (b + 1) * rows)]
        )
        for b in range(bands)
    ]
    return banded_pairs(signatures, band_keys, id_col, "id_a", "id_b", max_df=max_df)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SRP_BITS,
    bands: int = SRP_BANDS,
    dim: int = 64,
) -> DataFrame:
    """(vec_a, vec_b, cos_sim): SRP-LSH candidates verified by exact cosine.

    The scale contract: candidate generation is equi-joins on compact
    band keys (linear shuffle), and the exact cosine fold runs on
    candidate pairs only — never on the full n(n-1)/2 cross product.
    Candidates re-join the vector table on the id key; AQE broadcasts
    the (small) candidate side.
    """
    cand = srp_candidate_pairs(
        srp_signature(emb, id_col, vec_col, bits, dim), id_col, bits, bands
    )
    # Norms precompute once per vector ROW before the pair join, and the
    # pair cosine assembles as dot/(na*nb) in ONE named column reused by
    # the filter and the output — `norm` runs the identical fold on the
    # identical array, so every double matches the inline cosine() form
    # the oracle mirrors, while each candidate pair folds one array
    # product instead of three (and not twice for filter + select).
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("emb_a"),
        norm(vec_col).alias("_na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("emb_b"),
        norm(vec_col).alias("_nb"),
    )
    sim = dot("emb_a", "emb_b") / (F.col("_na") * F.col("_nb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("_sim", sim)
        .where(F.col("_sim") >= threshold)
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round(F.col("_sim"), 4).alias("cos_sim"),
        )
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
