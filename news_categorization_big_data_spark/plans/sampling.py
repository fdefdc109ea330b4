"""Registered queries for deterministic splitting / sampling
(operators/sampling.py) — the dataset-curation surface a training-data
pipeline runs before anything else touches the corpus.

Both queries compile to map-only plans (a per-row md5-bucket predicate,
no shuffle) and are fully oracle-verified: the id-hash membership rule
is bit-identical in DuckDB, unlike RNG-based ``df.sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_categorization_big_data_spark.operators.batching import (
    PACK_SEQ_LEN,
    PACK_SHARDS,
    assign_batches,
    pack_sequences,
)
from news_categorization_big_data_spark.operators.curation import ngram_contamination
from news_categorization_big_data_spark.operators.sampling import (
    assign_split,
    mixture_fractions,
    mixture_sample,
    stratified_sample,
)
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table

#: Stratified rebalance fractions (basis points kept per lang): the
#: corpus is English-dominant, so 'en' is downsampled hard, 'es'
#: moderately, and the long tail (zh/fr/de/…) is kept in full.
STRAT_FRACTIONS_BP = {"en": 2000, "es": 5000}
STRAT_DEFAULT_BP = 10_000


@register(
    "q_split_train_eval",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 800 THEN 'train'
                WHEN b < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 1000 AS b
          FROM documents)
    """,
    tier="C",
    doc="Deterministic 80/10/10 train/val/test assignment by id-hash "
    "bucket (operators/sampling.py): reproducible across engines and "
    "partitionings, leakage-free under corpus growth (a doc keeps its "
    "split for life), map-only — the replacement for RNG-seeded "
    "randomSplit in a 100-TB curation pipeline.",
)
def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return assign_split(docs, id_col="doc_id", train_permille=800, val_permille=100)


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang,
                 ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 AS b
          FROM documents)
    WHERE b < CASE lang WHEN 'en' THEN {STRAT_FRACTIONS_BP["en"]}
                        WHEN 'es' THEN {STRAT_FRACTIONS_BP["es"]}
                        ELSE {STRAT_DEFAULT_BP} END
    """,
    tier="C",
    doc="Deterministic per-stratum sampling (the sampleBy analog, "
    "operators/sampling.py): downsample the dominant language, keep the "
    "long tail — corpus rebalancing with an id-hash membership rule "
    "instead of an RNG, so the kept set is stable across runs, engines, "
    "and repartitionings. Map-only, zero shuffle.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        docs,
        id_col="doc_id",
        stratum_col="lang",
        fractions_bp=STRAT_FRACTIONS_BP,
        default_bp=STRAT_DEFAULT_BP,
    )


#: Target mixture (per-mille of the final corpus) for the data-mixing
#: query; sources not listed are excluded from the mix.
MIX_WEIGHTS_PERMILLE = {"src0": 400, "src1": 300, "src2": 200, "src3": 100}


@register(
    "q_mix_sources",
    oracle="""
    WITH counts AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (SELECT source, n_docs,
                 CASE source WHEN 'src0' THEN 400 WHEN 'src1' THEN 300
                             WHEN 'src2' THEN 200 WHEN 'src3' THEN 100
                             ELSE 0 END AS wt
          FROM counts),
    t AS (SELECT MIN(CAST(n_docs AS DOUBLE) / wt) AS t FROM w WHERE wt > 0),
    f AS (SELECT source, n_docs,
                 CASE WHEN wt > 0
                      THEN CASE WHEN CAST(n_docs AS DOUBLE) / wt = t.t
                                THEN 10000
                                ELSE least(10000,
                                           CAST(floor(10000 * t.t * wt / n_docs) AS BIGINT))
                           END
                      ELSE 0 END AS frac_bp
          FROM w, t),
    k AS (SELECT d.source, COUNT(*) AS n_kept
          FROM documents d JOIN f USING (source)
          WHERE ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  % 10000 < f.frac_bp
          GROUP BY d.source)
    SELECT f.source, f.n_docs, f.frac_bp, COALESCE(k.n_kept, 0) AS n_kept
    FROM f LEFT JOIN k USING (source)
    """,
    tier="C",
    doc="Data-mixture rebalancing (operators/sampling.py "
    "mixture_fractions/mixture_sample): given target per-source shares, "
    "derive the largest corpus honoring the mixture without upsampling "
    "(the scarcest-relative-to-target source binds at 100%), downsample "
    "every other source by the id-hash predicate, and report per-source "
    "observed count, keep fraction (bp), and kept count. The fraction "
    "table is dimension-sized and broadcast; membership stays map-only "
    "— the static data-mixing step of a pretraining pipeline.",
)
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    fracs = mixture_fractions(docs, "source", MIX_WEIGHTS_PERMILLE)
    kept = (
        mixture_sample(docs, "doc_id", "source", MIX_WEIGHTS_PERMILLE)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return fracs.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "frac_bp",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


def _curate_oracle() -> str:
    from news_categorization_big_data_spark.functions.text_exprs import STOPWORDS
    from news_categorization_big_data_spark.operators.curation import (
        QUALITY_MAX_CHARS_PER_TOKEN,
        QUALITY_MIN_CHARS_PER_TOKEN,
        QUALITY_MIN_DISTINCT_RATIO,
        QUALITY_MIN_STOPWORD_RATIO,
        QUALITY_MIN_TOKENS,
    )
    from news_categorization_big_data_spark.plans.dedup import _lsh_cand_ctes

    return f"""
    WITH RECURSIVE
    qs AS (SELECT doc_id, text,
                  len(t) AS n,
                  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dr,
                  CAST(len(list_filter(t, x -> x IN {tuple(STOPWORDS)!r})) AS DOUBLE)
                    / len(t) AS sr,
                  CAST(n_chars AS DOUBLE) / len(t) AS cpt
           FROM (SELECT doc_id, text, n_chars,
                        regexp_split_to_array(text, '\\s+') AS t
                 FROM documents WHERE text <> '')),
    kept AS (SELECT doc_id, text FROM qs
             WHERE NOT (n < {QUALITY_MIN_TOKENS}
                        OR dr < {QUALITY_MIN_DISTINCT_RATIO}
                        OR sr < {QUALITY_MIN_STOPWORD_RATIO}
                        OR cpt < {QUALITY_MIN_CHARS_PER_TOKEN}
                        OR cpt > {QUALITY_MAX_CHARS_PER_TOKEN})),
    src AS (SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text),
    {_lsh_cand_ctes(src="src")},
    edges AS (SELECT doc_a AS s, doc_b AS d FROM cand
              UNION ALL
              SELECT doc_b AS s, doc_a AS d FROM cand),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, lbl) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
    ),
    cc AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    canon AS (SELECT s.doc_id,
                     len(list_filter(regexp_split_to_array(s.text, '\\s+'),
                                     x -> x <> '')) AS tok
              FROM src s LEFT JOIN cc ON cc.id = s.doc_id
              WHERE cc.id IS NULL OR cc.component = s.doc_id),
    sp AS (SELECT CASE WHEN b < 800 THEN 'train'
                       WHEN b < 900 THEN 'val'
                       ELSE 'test' END AS split,
                  tok
           FROM (SELECT tok,
                        ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                          % 1000 AS b
                 FROM canon))
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS sum_tokens
    FROM sp GROUP BY split
    """


@register(
    "q_pipeline_curate",
    oracle=_curate_oracle(),
    tier="C",
    doc="The COMPLETE pretraining-curation pipeline as one DAG: quality "
    "filter (shared thresholds with q_quality_filter) → exact dedup "
    "(min-id per content hash) → near-dup canonicalization (banded-LSH "
    "candidates → connected components, keep each cluster's min id) → "
    "deterministic train/val/test split → per-split document and token "
    "budget. Every stage is the registered operator's own machinery "
    "(operators/curation.py, operators/dedup.py, operators/graph.py, "
    "operators/sampling.py) and the oracle is composed from the same "
    "generated CTE fragments — one source of truth per stage. The "
    "3-row output is the corpus report a training run starts from.",
)
def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_categorization_big_data_spark.functions.text_exprs import tokens
    from news_categorization_big_data_spark.operators.curation import quality_reasons
    from news_categorization_big_data_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from news_categorization_big_data_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    kept = docs.where(F.size(quality_reasons("text", "n_chars")) == 0)
    # Exact dedup: group on the 16-byte content hash (not the text) so
    # the shuffle key stays small; texts in a group are identical, so
    # first() is deterministic in value. fan_out(force=True): the
    # groupBy's exchange is AQE-coalesced to ~1 partition at runtime,
    # which would single-thread the downstream shingle/md5 stage — the
    # forced user-numbered repartition is a floor AQE respects.
    from news_categorization_big_data_spark.functions.partitioning import fan_out

    src = fan_out(
        kept.groupBy(F.md5("text").alias("_h")).agg(
            F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
        ),
        force=True,
    )
    # The deduped corpus feeds TWO consumers: the LSH signature lineage
    # and the survivor join below. A lazy localCheckpoint materializes it
    # exactly once (at the first action, i.e. the CC size probe) and
    # truncates lineage, so the scan → quality filter → md5 groupBy pass
    # is not recomputed for the join side — measured ~0.8 s of the
    # query's 3.2 s at sf0.1. Production at 100 TB would write this
    # stage to durable storage anyway (it IS the deduped corpus); the
    # checkpoint is the in-session equivalent, and its partitions keep
    # fan_out's forced width so the shingle stage stays parallel.
    src = src.localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs(minhash_signatures(src))
    cc = connected_components(pairs)
    surv = src.join(cc, src["doc_id"] == cc["doc_id"], "left").where(
        cc["doc_id"].isNull() | (F.col("component") == src["doc_id"])
    ).select(src["doc_id"], "text")
    tok = F.size(F.filter(tokens("text"), lambda t: t != "")).cast("long")
    split = assign_split(surv.select("doc_id", tok.alias("tok")))
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("sum_tokens")
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH d AS (SELECT doc_id,
                      CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                           x -> x <> '')) AS BIGINT) AS tok_count,
                      ('0x' || substr(md5('packshard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % {PACK_SHARDS} AS shard,
                      ('0x' || substr(md5('packorder:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                        AS ok
               FROM documents),
    s AS (SELECT doc_id, shard, tok_count,
                 CAST(COALESCE(SUM(tok_count) OVER (PARTITION BY shard ORDER BY ok, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS st
          FROM d)
    SELECT doc_id, shard, tok_count,
           CAST(floor(st / {PACK_SEQ_LEN}) AS BIGINT) AS seq_idx,
           st % {PACK_SEQ_LEN} AS seq_offset
    FROM s
    """,
    tier="C",
    doc="Deterministic sequence packing (operators/batching.py "
    f"pack_sequences): docs hash-bucketed into {PACK_SHARDS} shards, "
    "laid out in md5-hash order within each shard (a reproducible "
    "corpus shuffle), concatenated, and assigned to fixed "
    f"{PACK_SEQ_LEN}-token training sequences by cumulative offset. "
    "One per-shard window shuffle; parallelism = n_shards, which scales "
    "with the corpus (the constant here fits the testdata). All-integer "
    "outputs → oracle-exact.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, id_col="doc_id", text_col="text")


@register(
    "q_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
                  FROM documents WHERE text <> ''),
    -- linear list_zip shingles + relational DISTINCT (see
    -- plans/dedup.py _shingles_cte for why the lambda form is
    -- quadratic on giant docs; len(t) >= 3 guards the from-end slice
    -- edge at n=1)
    hh AS (SELECT doc_id,
                  ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
           FROM (SELECT DISTINCT doc_id,
                        u[1] || ' ' || u[2] || ' ' || u[3] AS shingle
                 FROM (SELECT doc_id,
                              unnest(list_zip(t[1:len(t)-2], t[2:len(t)-1],
                                              t[3:len(t)])) AS u
                       FROM toks WHERE len(t) >= 3))),
    sp AS (SELECT doc_id,
                  ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000 AS b
           FROM documents),
    ev AS (SELECT DISTINCT h FROM hh JOIN sp USING (doc_id) WHERE b >= 900)
    SELECT hh.doc_id, COUNT(*) AS n_overlap
    FROM hh JOIN sp USING (doc_id) JOIN ev USING (h)
    WHERE sp.b < 800
    GROUP BY hh.doc_id
    """,
    tier="C",
    doc="Eval-set decontamination (operators/curation.py "
    "ngram_contamination): train docs (80% id-hash split) sharing ≥1 "
    "3-word shingle with the held-out test split, with the count of "
    "overlapping shingles — the exact-substring train/test-overlap "
    "check of the GPT-3 appendix-C flavor. The holdout's distinct "
    "shingle-hash set is dimension-sized, so Spark BROADCASTS it and "
    "the 100-TB train side is never shuffled on n-grams; only actual "
    "hits reach the per-doc count.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("text") != "")
    )
    split = assign_split(docs, id_col="doc_id", train_permille=800, val_permille=100)
    train = split.where(F.col("split") == "train")
    holdout = split.where(F.col("split") == "test")
    return ngram_contamination(train, holdout, text_col="text", id_col="doc_id", k=3)


@register(
    "q_batch_assign",
    oracle="""
    WITH d AS (SELECT doc_id,
                      len(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x <> '')) AS tok_count
               FROM documents),
    b AS (SELECT doc_id, tok_count,
                 CASE WHEN tok_count <= 16 THEN 16
                      WHEN tok_count <= 32 THEN 32
                      WHEN tok_count <= 64 THEN 64
                      WHEN tok_count <= 128 THEN 128
                      WHEN tok_count <= 256 THEN 256
                      ELSE 512 END AS bucket
          FROM d),
    c AS (SELECT bucket, CAST(ceil(COUNT(*) / 32.0) AS BIGINT) AS nb
          FROM b GROUP BY bucket),
    a AS (SELECT b.bucket, b.tok_count,
                 ('0x' || substr(md5('batch:' || CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % c.nb AS batch_id
          FROM b JOIN c USING (bucket))
    SELECT bucket, batch_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tok_count) AS BIGINT) AS sum_tokens,
           MAX(tok_count) AS max_tokens,
           CAST(COUNT(*) * MAX(tok_count) - SUM(tok_count) AS BIGINT) AS padding_waste
    FROM a GROUP BY bucket, batch_id
    """,
    tier="C",
    doc="Length-bucketed training-batch construction with padding-waste "
    "accounting (operators/batching.py): power-of-two token buckets, "
    "hash-assigned batch membership (NO per-bucket global sort — the "
    "naive row_number construction collapses to one reducer per bucket "
    "at corpus scale), per-batch n/sum/max token stats and the pad-token "
    "waste a trainer would burn. All-integer outputs → oracle-exact.",
)
def q_batch_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return assign_batches(docs, id_col="doc_id", text_col="text")


# --------------------------------------------------------------------------
# Curation funnel attribution
# --------------------------------------------------------------------------


def _funnel_oracle() -> str:
    from news_categorization_big_data_spark.functions.text_exprs import STOPWORDS
    from news_categorization_big_data_spark.operators.curation import (
        QUALITY_MAX_CHARS_PER_TOKEN,
        QUALITY_MIN_CHARS_PER_TOKEN,
        QUALITY_MIN_DISTINCT_RATIO,
        QUALITY_MIN_STOPWORD_RATIO,
        QUALITY_MIN_TOKENS,
    )
    from news_categorization_big_data_spark.plans.dedup import _lsh_cand_ctes

    return f"""
    WITH RECURSIVE
    raw AS (SELECT doc_id, text, n_chars FROM documents WHERE text <> ''),
    qs AS (SELECT doc_id, text,
                  len(t) AS n,
                  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dr,
                  CAST(len(list_filter(t, x -> x IN {tuple(STOPWORDS)!r})) AS DOUBLE)
                    / len(t) AS sr,
                  CAST(n_chars AS DOUBLE) / len(t) AS cpt
           FROM (SELECT doc_id, text, n_chars,
                        regexp_split_to_array(text, '\\s+') AS t
                 FROM raw)),
    kept AS (SELECT doc_id, text FROM qs
             WHERE NOT (n < {QUALITY_MIN_TOKENS}
                        OR dr < {QUALITY_MIN_DISTINCT_RATIO}
                        OR sr < {QUALITY_MIN_STOPWORD_RATIO}
                        OR cpt < {QUALITY_MIN_CHARS_PER_TOKEN}
                        OR cpt > {QUALITY_MAX_CHARS_PER_TOKEN})),
    src AS (SELECT MIN(doc_id) AS doc_id, text FROM kept GROUP BY text),
    {_lsh_cand_ctes(src="src")},
    edges AS (SELECT doc_a AS s, doc_b AS d FROM cand
              UNION ALL
              SELECT doc_b AS s, doc_a AS d FROM cand),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, lbl) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
    ),
    cc AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    canon AS (SELECT s.doc_id FROM src s LEFT JOIN cc ON cc.id = s.doc_id
              WHERE cc.id IS NULL OR cc.component = s.doc_id),
    stages AS (
      SELECT 0 AS stage_idx, 'raw' AS stage,
             CAST((SELECT COUNT(*) FROM raw) AS BIGINT) AS n_docs
      UNION ALL SELECT 1, 'quality',
             CAST((SELECT COUNT(*) FROM kept) AS BIGINT)
      UNION ALL SELECT 2, 'exact_dedup',
             CAST((SELECT COUNT(*) FROM src) AS BIGINT)
      UNION ALL SELECT 3, 'near_dedup',
             CAST((SELECT COUNT(*) FROM canon) AS BIGINT))
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_docs,
           CAST(COALESCE(lag(n_docs) OVER (ORDER BY stage_idx), n_docs)
                - n_docs AS BIGINT) AS n_removed,
           CAST(n_docs AS DOUBLE)
             / CAST(first_value(n_docs) OVER (ORDER BY stage_idx) AS DOUBLE)
             AS kept_frac
    FROM stages
    """


@register(
    "q_curation_funnel",
    oracle=_funnel_oracle(),
    tier="C",
    doc="Curation funnel attribution — the per-stage accounting report "
    "next to q_pipeline_curate's final answer: how many documents "
    "each stage (quality filter → exact dedup → near-dup "
    "canonicalization) removed, and the cumulative keep fraction. "
    "This is the report that tells a data team WHICH stage cost the "
    "corpus (a dedup suddenly eating 40% is a pipeline bug; a "
    "quality filter eating 40% is a source problem). Every stage "
    "count reuses the SAME operator machinery and oracle CTE chain "
    "as q_pipeline_curate (one source of truth per stage — the "
    "numbers cannot drift from the pipeline they describe); the "
    "deduped corpus is lazily checkpointed once and the four stage "
    "counts assemble into a 4-row frame with window lag/first for "
    "attribution. All-integer counts; one final division per row.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_categorization_big_data_spark.operators.curation import quality_reasons
    from news_categorization_big_data_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from news_categorization_big_data_spark.operators.graph import connected_components
    from news_categorization_big_data_spark.functions.partitioning import fan_out

    raw = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    kept = raw.where(F.size(quality_reasons("text", "n_chars")) == 0)
    src = fan_out(
        kept.groupBy(F.md5("text").alias("_h")).agg(
            F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
        ),
        force=True,
    ).localCheckpoint(eager=False)
    cc = connected_components(lsh_candidate_pairs(minhash_signatures(src)))
    canon = src.join(cc, src["doc_id"] == cc["doc_id"], "left").where(
        cc["doc_id"].isNull() | (F.col("component") == src["doc_id"])
    )

    def stage(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_docs")).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "n_docs"
        )

    stages = (
        stage(0, "raw", raw)
        .unionAll(stage(1, "quality", kept))
        .unionAll(stage(2, "exact_dedup", src))
        .unionAll(stage(3, "near_dedup", canon))
    )
    w = Window.orderBy("stage_idx")
    return stages.select(
        "stage_idx",
        "stage",
        "n_docs",
        (
            F.coalesce(F.lag("n_docs").over(w), F.col("n_docs")) - F.col("n_docs")
        )
        .cast("long")
        .alias("n_removed"),
        # try_divide: an all-empty corpus makes the raw stage count 0
        # and kept_frac must be NULL like the oracle's x/0 (DuckDB:
        # NULL), not an ANSI crash (/tmp/skew6 empty-input finding)
        F.try_divide(
            F.col("n_docs").cast("double"),
            F.first("n_docs").over(w).cast("double"),
        ).alias("kept_frac"),
    )


# --------------------------------------------------------------------------
# Deterministic fixed-k uniform sample (the reservoir-sampling replacement)
# --------------------------------------------------------------------------

#: Exact sample size for q_sample_reservoir.
RESERVOIR_K = 200


@register(
    "q_sample_reservoir",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)), doc_id
    LIMIT {RESERVOIR_K}
    """,
    tier="C",
    doc=f"Exact fixed-size uniform sample ({RESERVOIR_K} docs) via "
    "keyed-hash global top-k — the deterministic replacement for "
    "reservoir sampling: rank every row by md5 of its id under a "
    "salt and keep the k smallest. Same statistical guarantee as a "
    "uniform reservoir (each doc's hash rank is exchangeable) but "
    "reproducible across engines, partitionings, and reruns, and "
    "composable (the same salt always picks the same sample, a new "
    "salt draws an independent one). Scale: compiles to "
    "TakeOrderedAndProject — each partition keeps a local top-k heap "
    "and only k rows per partition reach the driver-side merge, so "
    "100 TB costs one scan and k·P small rows of movement, never a "
    "global sort.",
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", "source", key.alias("_rk"))
        # doc_id tiebreak mirrors the oracle; md5 collisions are
        # 2^-64-improbable but the contract should not rest on that.
        .orderBy("_rk", "doc_id")
        .limit(RESERVOIR_K)
        .drop("_rk")
    )


# --------------------------------------------------------------------------
# Leakage-proof splitting (split by near-dup cluster, not by document)
# --------------------------------------------------------------------------


def _leakproof_oracle() -> str:
    from news_categorization_big_data_spark.plans.dedup import _lsh_cand_ctes

    return f"""
    WITH RECURSIVE {_lsh_cand_ctes()},
    edges AS (SELECT doc_a AS s, doc_b AS d FROM cand
              UNION ALL
              SELECT doc_b AS s, doc_a AS d FROM cand),
    verts AS (SELECT DISTINCT s AS id FROM edges),
    reach(id, lbl) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
    ),
    cc AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id),
    keyed AS (SELECT d.doc_id,
                     CAST(COALESCE(cc.component, d.doc_id) AS BIGINT) AS split_key
              FROM (SELECT doc_id FROM documents WHERE text <> '') d
              LEFT JOIN cc USING (doc_id)),
    s AS (SELECT doc_id, split_key,
                 ('0x' || substr(md5('split:' || CAST(split_key AS VARCHAR)), 1, 15))::BIGINT
                   % 1000 AS b
          FROM keyed)
    SELECT doc_id, split_key,
           CASE WHEN b < 800 THEN 'train'
                WHEN b < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM s
    """


@register(
    "q_split_leakproof",
    oracle=_leakproof_oracle(),
    tier="C",
    doc="Leakage-proof train/val/test assignment: the split hash is "
    "keyed on the document's NEAR-DUP CLUSTER canonical id (LSH "
    "candidates → connected components; singletons key on their own "
    "id), so two near-duplicate documents can never land in "
    "different splits — the eval-contamination failure q_split_train_"
    "eval's per-doc hashing cannot prevent (a 0.98-jaccard twin of a "
    "test doc in train IS the answer key). Same 80/10/10 id-hash "
    "rule, same operator machinery as q_dedup_cluster, and the "
    "oracle composes that query's own recursive-CTE chain. Scale: "
    "adds one broadcast-sized left join to the split pass — the "
    "cluster table is tiny next to the corpus; the split stays "
    "map-only per document.",
)
def q_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_categorization_big_data_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from news_categorization_big_data_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    cc = connected_components(lsh_candidate_pairs(minhash_signatures(docs)))
    keyed = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").cast("long").alias("split_key"),
        )
    )
    return assign_split(keyed, id_col="split_key").select(
        "doc_id", "split_key", "split"
    )


#: Per-stratum sample size for q_sample_per_group.
GROUP_RESERVOIR_K = 40


@register(
    "q_sample_per_group",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5('grsv:' || CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents)
    WHERE rn <= {GROUP_RESERVOIR_K}
    """,
    tier="C",
    doc=f"Exact fixed-k-PER-GROUP uniform sample ({GROUP_RESERVOIR_K} "
    "docs per language) — the balanced-eval-set builder: a global "
    "uniform sample reproduces the corpus's language imbalance, this "
    "draws the same number from every stratum (strata smaller than k "
    "contribute everything they have). Same keyed-hash determinism "
    "as q_sample_reservoir, but the rank runs per group: one "
    "hash-partitioned window whose per-partition sort is bounded by "
    "stratum size. At 100 TB with huge strata, swap the full window "
    "for a per-stratum TakeOrdered loop or an approximate "
    "hash-threshold prefilter (keep rows with hash below ~k/n_g "
    "quantile, then exact-rank the survivors) — documented, not "
    "needed at test scale.",
)
def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("grsv:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("_rn"))
        .where(F.col("_rn") <= GROUP_RESERVOIR_K)
        .drop("_rn")
    )
