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
    SRP_BANDS,
    SRP_BITS,
    assign_cells,
    brute_force_topk,
    cosine,
    embedding_near_dup_pairs,
    l2_sq,
    srp_signs,
)
from news_categorization_big_data_spark.functions.exact import (
    dec_to_double,
    o_dec_to_double,
)
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table

#: q_embedding_norms' per-vector sum of squares on the 10^-12 grid
#: (hoisted for o_dec_to_double).
_O_NORM_SS = (
    "list_sum(list_transform(embedding,"
    " x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(20,12))))"
)


def _o_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )


def _o_cos(a: str, b: str) -> str:
    return f"({_o_dot(a, b)} / (sqrt({_o_dot(a, a)}) * sqrt({_o_dot(b, b)})))"


#: The deterministic IVF geometry: the first N corpus vectors are the
#: seed centroids. ONE source of truth for every consumer — the
#: q_sim_ann_ivf plan AND oracle, q_ann_recall's evaluation geometry,
#: and q_ml_kmeans' k / fixed-init reference WSS (plans/ml.py) — so a
#: future geometry change cannot drift a plan apart from its oracle
#: (VERDICT round 7 item 4).
IVF_N_CENTS = 8


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
                  WHERE vec_id < {IVF_N_CENTS}),
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
    "Recall vs brute force asserted in tests/test_scale_ops.py.",
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < IVF_N_CENTS).select(
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


def _srp_oracle(threshold: float = 0.35) -> str:
    """DuckDB mirror of the SRP-LSH near-dup pipeline: the md5-derived
    hyperplane matrix is baked in as literals, so candidate generation is
    bit-identical to the Spark plan (operators/similarity.py:srp_signs).
    Bucket form mirroring banded_pairs exactly, including the
    LSH_MAX_DF skew cap (over-cap band buckets dropped whole)."""
    from news_categorization_big_data_spark.operators.dedup import LSH_MAX_DF

    signs = srp_signs(SRP_BITS)
    bit_exprs = ",\n           ".join(
        "(list_sum(list_transform(list_zip(embedding, "
        f"[{', '.join(str(s) for s in signs[j])}]::DOUBLE[]), "
        f"x -> CAST(x[1] AS DOUBLE) * x[2])) > 0) AS bit{j}"
        for j in range(SRP_BITS)
    )
    rows = SRP_BITS // SRP_BANDS
    band_keys = []
    for b in range(SRP_BANDS):
        k = " || ".join(
            f"CAST(CAST(bit{j} AS INT) AS VARCHAR)"
            for j in range(b * rows, (b + 1) * rows)
        )
        band_keys.append(k)
    bexp = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {k} AS band_key FROM sig"
        for b, k in enumerate(band_keys)
    )
    from news_categorization_big_data_spark.operators.similarity import O_MEASURABLE

    measurable = O_MEASURABLE.format(v="embedding")
    return f"""
    WITH sig AS (SELECT vec_id, embedding,
           {bit_exprs}
           FROM embeddings
           WHERE {measurable}),
    bexp AS ({bexp}),
    bok AS (SELECT band_idx, band_key FROM bexp
            GROUP BY band_idx, band_key
            HAVING COUNT(*) <= {LSH_MAX_DF}),
    cand AS (SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
             FROM bexp a
             JOIN bexp b ON a.band_idx = b.band_idx
                        AND a.band_key = b.band_key
                        AND a.vec_id < b.vec_id
             JOIN bok o ON o.band_idx = a.band_idx
                       AND o.band_key = a.band_key),
    pairs AS (SELECT va, ea.embedding AS ea, vb, eb.embedding AS eb
              FROM cand
              JOIN embeddings ea ON ea.vec_id = va
              JOIN embeddings eb ON eb.vec_id = vb)
    SELECT va AS vec_a, vb AS vec_b, round({_o_cos('ea', 'eb')}, 4) AS cos_sim
    FROM pairs WHERE {_o_cos('ea', 'eb')} >= {threshold}
    """


@register(
    "q_dedup_embedding",
    oracle=_srp_oracle(),
    tier="C",
    doc="Embedding-cosine near-duplicate pairs via sign-random-projection "
    f"LSH: {SRP_BITS}-bit deterministic signatures banded into {SRP_BANDS} "
    "bands generate candidates through compact equi-joins (linear "
    "shuffle), and the exact cosine ≥ 0.35 predicate runs on candidates "
    "only — never on the n(n-1)/2 cross product (the registered plan in "
    "round 1 was an all-pairs theta join; this is the 100-TB shape). The "
    "oracle mirrors the same md5-derived hyperplanes, so both engines "
    "produce the identical candidate set. Recall vs the exact all-pairs "
    "answer is the banding curve 1-(1-p^r)^b, p = 1-θ/π — ≈95% at cosine "
    "0.9 (production near-dup range), lower near this low stress "
    "threshold; measured against brute force in tests/test_scale_ops.py.",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35)


#: q_sim_ann_lsh contract: neighbors requested, and the accepted
#: returned-count floor (approxNearestNeighbors may return fewer than k
#: from sparse buckets; below the floor the index is considered broken
#: and the driver hash fails). tests/test_harness_sensitivity.py proves
#: the booleans flip on a mutated index.
ANN_K = 10
ANN_RET_FLOOR = 5


@register(
    "q_sim_ann_lsh",
    oracle="""
    SELECT TRUE AS returned_ok, TRUE AS recall_ok
    """,
    tier="C",
    doc="Random-hyperplane ANN via MLlib BucketedRandomProjectionLSH: "
    "approxNearestNeighbors for the vec_id=0 query. SEMI-ORACLE "
    "(round-7 upgrade from rows-only): the hyperplanes are "
    "Spark-internal, so the driver-hashed output is two booleans — "
    "returned_ok pins 5 ≤ n_returned ≤ 10 (approxNearestNeighbors may "
    "legitimately return fewer than k when hash buckets are sparse, so "
    "an exact count would be brittle across scale factors and Spark "
    "versions; a floor + ceiling still fails a broken index loudly) "
    "and recall_ok pins recall@10 ≥ 0.5 against the EXACT brute-force "
    "L2 top-10 computed in the same plan (measured 0.9 at sf0.01, "
    "seed 42). The neighbor list itself remains available from "
    "approxNearestNeighbors for production.",
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    emb = raw.select("vec_id", array_to_vector(F.col("e")).alias("features"))
    # Empty-shard / missing-query guard: LSH cannot fit on zero rows
    # and there is no query vector without vec_id=0 — both are
    # legitimate states of a partitioned 100-TB corpus, and the
    # vacuous pass is what the constant oracle pins (/tmp/skew6
    # empty-input finding). The head() probe reads one row, and also
    # serves as the non-empty check (vec_id=0 exists in every
    # driver-generated sf).
    key_row = emb.where(F.col("vec_id") == 0).select("features").head()
    if key_row is None:
        return spark.createDataFrame(
            [(True, True)], "returned_ok boolean, recall_ok boolean"
        )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    key = key_row[0]
    ann = (
        model.approxNearestNeighbors(emb.where(F.col("vec_id") != 0), key, ANN_K)
        .select("vec_id")
        .withColumn("_hit", F.lit(True))
    )
    kv = F.array(*[F.lit(float(x)) for x in key.toArray()])
    l2 = l2_sq(F.col("e"), kv)
    brute_k = (
        raw.where(F.col("vec_id") != 0)
        .select("vec_id", l2.alias("_d"))
        .orderBy("_d", "vec_id")
        .limit(ANN_K)
    )
    return (
        brute_k.join(ann, "vec_id", "left_outer")
        .agg(
            F.count("*").cast("long").alias("_n_brute"),
            F.count("_hit").alias("_hits"),
        )
        .crossJoin(F.broadcast(ann.agg(F.count("*").cast("long").alias("_n_ret"))))
        .select(
            (
                (F.col("_n_ret") >= ANN_RET_FLOOR) & (F.col("_n_ret") <= ANN_K)
            ).alias("returned_ok"),
            (F.col("_hits") * 2 >= F.col("_n_brute")).alias("recall_ok"),
        )
    )


@register(
    "q_embedding_quantize",
    oracle="""
    WITH m AS (SELECT vec_id,
                      embedding,
                      -- poisoned vector -> NULL outputs: the engines
                      -- disagree on NaN>0 (DuckDB NaN-sorts-greatest
                      -- says TRUE, Spark says FALSE) so a NaN absmax
                      -- yields structurally different quantizations;
                      -- an unmeasurable vector has no scale
                      -- (/tmp/skew7)
                      len(list_filter(embedding,
                          x -> NOT isfinite(CAST(x AS DOUBLE)))) > 0 AS pois,
                      list_max(list_transform(embedding,
                                              x -> abs(CAST(x AS DOUBLE)))) AS mx
               FROM embeddings)
    SELECT vec_id,
           CASE WHEN pois THEN NULL
                WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale,
           CASE WHEN pois THEN NULL ELSE
           array_to_string(list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE)
                                          * (CASE WHEN mx > 0 THEN 127.0 / mx
                                                  ELSE 0.0 END) + 0.5)
                                    AS INT)), ',') END AS qvec
    FROM m
    """,
    tier="C",
    doc="Symmetric int8 quantization of the embedding column — the "
    "storage/bandwidth compression step before ANN index build "
    "(scale = 127/max|x|, q = floor(x·scale + 0.5); floor(x+0.5) "
    "instead of round() because both engines' floor is IEEE-exact while "
    "their round() tie conventions differ). Pure per-row array "
    "transform: map-only, zero shuffle, whole-stage codegen; float32→"
    "double casts and one double multiply are bit-identical on both "
    "engines. An all-zero vector quantizes to scale 0 / all-zero qvec. "
    "The quantized vector is emitted comma-serialized (not as a raw "
    "array column): the external driver canonicalizes results through a "
    "pandas sort, which cannot order numpy-array cells — the sole red "
    "row in CORRECTNESS_r03 was this query crashing that sort. Every "
    "oracle-bearing query must emit scalar columns only "
    "(tests/test_oracle_types.py enforces this).",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_categorization_big_data_spark.functions.partitioning import fan_out

    # r15: bind `scale` as a lambda VARIABLE before the per-element
    # quantize transform. Column trees duplicate on every reference, so
    # the previous form re-evaluated scale — an array_max over a
    # transform of the whole vector — INSIDE the element lambda, i.e.
    # once per element: O(dim²) per row (64x the needed work), plus
    # twice more for the scale column and the pois/guard. One
    # transform-over-array binding evaluates absmax/scale once per row.
    # fan_out: the map work ran on the single-row-group bench scan.
    # Output identical (same expressions on the same values);
    # oracle-MATCH. Measured: sf1 11.8->0.6 s.
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), by=("vec_id",))
    absmax = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    # poisoned vector -> NULL scale/codes (see the oracle note)
    pois = F.exists(
        "embedding",
        lambda x: F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) == float("inf")),
    )
    # The pois gate lives INSIDE the binding: poisoned rows bind s=NULL,
    # which null-propagates through every floor(x*s+0.5) product instead
    # of relying on NaN-product arithmetic. Without it an Inf component
    # whose product escaped the NaN path would reach the long->int cast
    # and throw under ANSI (Spark 4 default); the outer ~pois mask alone
    # cannot prevent that because both when-branches are evaluated.
    scale = F.when(
        ~pois, F.when(absmax > 0, F.lit(127.0) / absmax).otherwise(F.lit(0.0))
    )

    def _quant(s):
        return F.struct(
            s.alias("scale"),
            F.array_join(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * s + F.lit(0.5))
                    .cast("int")
                    .cast("string"),
                ),
                ",",
            ).alias("qvec"),
        )

    q = F.transform(F.array(scale), _quant)[0]
    return (
        emb.select("vec_id", q.alias("_q"), pois.alias("_pois"))
        .select(
            "vec_id",
            F.when(~F.col("_pois"), F.col("_q")["scale"]).alias("scale"),
            F.when(~F.col("_pois"), F.col("_q")["qvec"]).alias("qvec"),
        )
    )


#: Top-k for the norm profile; L2 norms feed normalization decisions
#: (an un-normalized outlier distorts cosine ANN buckets).
NORM_TOP_K = 20


@register(
    "q_embedding_norms",
    oracle=f"""
    WITH s AS (SELECT vec_id,
                      -- a NaN/Inf component NULLs the whole norm, the
                      -- exact mirror of the engine's null-propagating
                      -- decimal fold (DuckDB would otherwise refuse
                      -- the cast); NULLS LAST pins the DESC ordering
                      -- (DuckDB DESC defaults NULLS FIRST, Spark
                      -- NULLS LAST) — /tmp/skew7
                      CASE WHEN len(list_filter(embedding,
                                x -> NOT isfinite(CAST(x AS DOUBLE)))) > 0
                           THEN NULL
                           ELSE {o_dec_to_double(_O_NORM_SS, 12)} END AS ss
               FROM embeddings)
    SELECT vec_id, sqrt(ss) AS l2_norm
    FROM s ORDER BY sqrt(ss) DESC NULLS LAST, vec_id LIMIT {NORM_TOP_K}
    """,
    tier="C",
    doc=f"Embedding L2-norm profile (top-{NORM_TOP_K} by norm): the "
    "sanity pass a vector pipeline runs before cosine ANN — "
    "un-normalized outliers dominate dot products and skew IVF "
    "centroids, so norms get checked (and vectors re-scaled) first. "
    "MAP-ONLY: the squared norm is a higher-order `aggregate` fold "
    "over the array column — no explode, no shuffle; the only "
    "exchange is the TakeOrderedAndProject top-k. Determinism: each "
    "x² term (float32→double exact, product identical) is DECIMAL-"
    "quantized at 10⁻¹², so the fold is exact and order-free on both "
    "engines; precisions are chosen (32,12)+(20,12) so Spark's "
    "decimal-addition precision cap can NEVER rescale mid-fold "
    "(38-cap would silently truncate scale to 11 and red-hash — "
    "measured), and the scaled magnitude stays ≪ 2^53 so the final "
    "decimal→double cast is exact. sqrt of identical doubles is "
    "correctly rounded (IEEE) — identical.",
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ss = dec_to_double(
        F.aggregate(
            F.col("embedding"),
            F.lit(0).cast("decimal(32,12)"),
            lambda acc, x: (
                acc + (x.cast("double") * x.cast("double")).cast("decimal(20,12)")
            ).cast("decimal(32,12)"),
        ),
        12,
    )
    return (
        emb.select("vec_id", F.sqrt(ss).alias("l2_norm"))
        .orderBy(F.desc("l2_norm"), "vec_id")
        .limit(NORM_TOP_K)
    )


# --------------------------------------------------------------------------
# ANN recall evaluation
# --------------------------------------------------------------------------

#: Recall@K evaluation: query points, ground-truth depth, and the IVF
#: geometry (the shared IVF_N_CENTS constant: first-N vectors as
#: centroids, same geometry q_sim_ann_ivf searches).
RECALL_QUERIES = (0, 1, 2)
RECALL_K = 10
RECALL_N_CENTS = IVF_N_CENTS


@register(
    "q_ann_recall",
    oracle=f"""
    WITH cent AS (SELECT vec_id AS cent_id, embedding AS c_emb FROM embeddings
                  WHERE vec_id < {RECALL_N_CENTS}),
    assigned AS (SELECT vec_id, cent_id FROM (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_o_cos('e.embedding', 'c.c_emb')} DESC,
                                           c.cent_id) AS rn
        FROM embeddings e, cent c) WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
          WHERE vec_id IN {RECALL_QUERIES!r}),
    truth AS (SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_o_cos('e.embedding', 'q.q_emb')} DESC,
                                           e.vec_id) AS rn
        FROM embeddings e, q WHERE e.vec_id <> q.query_id) WHERE rn <= {RECALL_K}),
    qc AS (SELECT q.query_id, q.q_emb, a.cent_id AS q_cell
           FROM q JOIN assigned a ON a.vec_id = q.query_id),
    cand AS (SELECT qc.query_id, e.vec_id, e.embedding, qc.q_emb
             FROM embeddings e
             JOIN assigned a ON a.vec_id = e.vec_id
             JOIN qc ON a.cent_id = qc.q_cell
             WHERE e.vec_id <> qc.query_id),
    annk AS (SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_o_cos('embedding', 'q_emb')} DESC,
                                           vec_id) AS rn
        FROM cand) WHERE rn <= {RECALL_K}),
    ncand AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
              FROM cand GROUP BY query_id),
    hit AS (SELECT t.query_id, CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit
            FROM truth t LEFT JOIN annk a
              ON t.query_id = a.query_id AND t.vec_id = a.vec_id
            GROUP BY t.query_id)
    SELECT h.query_id, n.n_candidates, h.n_hit,
           CAST(h.n_hit AS DOUBLE) / {RECALL_K}.0 AS recall
    FROM hit h JOIN ncand n ON h.query_id = n.query_id
    """,
    tier="C",
    doc=f"ANN recall@{RECALL_K} report — the evaluation harness every "
    "vector index ships with: for each of "
    f"{len(RECALL_QUERIES)} query points, run BOTH the brute-force "
    "exact top-k (the q_sim_search path) and the IVF single-cell "
    "search (the q_sim_ann_ivf path, same first-"
    f"{RECALL_N_CENTS}-vectors centroid geometry), and report the "
    "candidate-set size (the cost actually paid) next to the recall "
    "(the quality actually delivered) — the two numbers that "
    "calibrate nprobe/cell-count tradeoffs before a config ships. "
    "Composes the REGISTERED operators' own machinery (assign_cells, "
    "broadcast query panel, per-query rank windows), so the report "
    "measures exactly what the production queries run. Scale: "
    "centroid table broadcasts; the ground-truth pass is the one "
    "full scan (that is what makes it ground truth — run it on an "
    "evaluation sample, not the corpus); the ANN pass scans one "
    "cell per query. Determinism: ranks tie-break on vec_id; "
    "recall is one exact-integer division.",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < RECALL_N_CENTS).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    # Assignments feed both the query-cell lookup and the candidate
    # join; the lazy localCheckpoint computes the corpus×centroid argmin
    # once instead of once per consumer.
    assigned = (
        assign_cells(emb, centroids)
        .select("vec_id", "cent_id")
        .localCheckpoint(eager=False)
    )
    queries = emb.where(F.col("vec_id").isin(*RECALL_QUERIES)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )

    scored = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine("embedding", "q_emb").alias("_c"))
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    truth = (
        scored.withColumn("_rn", F.row_number().over(w_q))
        .where(F.col("_rn") <= RECALL_K)
        .select("query_id", "vec_id")
    )

    qc = queries.join(
        assigned.withColumnRenamed("vec_id", "query_id"), "query_id"
    ).select("query_id", "q_emb", F.col("cent_id").alias("q_cell"))
    cand = (
        emb.join(assigned, "vec_id")
        .join(F.broadcast(qc), F.col("cent_id") == F.col("q_cell"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "embedding", "q_emb")
    )
    annk = (
        cand.select("query_id", "vec_id", cosine("embedding", "q_emb").alias("_c"))
        .withColumn("_rn", F.row_number().over(w_q))
        .where(F.col("_rn") <= RECALL_K)
        .select("query_id", F.col("vec_id").alias("ann_vec_id"))
    )
    ncand = cand.groupBy("query_id").agg(F.count("*").alias("n_candidates"))
    hit = (
        truth.join(
            annk,
            (truth["query_id"] == annk["query_id"])
            & (truth["vec_id"] == annk["ann_vec_id"]),
            "left",
        )
        .groupBy(truth["query_id"].alias("query_id"))
        .agg(F.count("ann_vec_id").alias("n_hit"))
    )
    return hit.join(ncand, "query_id").select(
        "query_id",
        "n_candidates",
        "n_hit",
        (F.col("n_hit").cast("double") / F.lit(float(RECALL_K))).alias("recall"),
    )
