"""Corpus-scale curation extensions: passage-level exact dedup,
weighted deterministic sampling, mergeable HLL distinct sketches, and
triangle counting on the near-duplicate pair graph.

These extend the §2.13 curation tier (plans/text.py, plans/sampling.py,
plans/dedup.py) with the remaining shapes a 100-TB pretraining pipeline
runs:

- passage dedup is the sub-document complement of doc-level dedup —
  boilerplate passages (headers, disclaimers) repeat across documents
  that are NOT near-duplicates as wholes, so doc-level MinHash misses
  them (cf. "Deduplicating Training Data Makes Language Models Better",
  Lee et al. 2022 — the EXACTSUBSTR motivation);
- weighted sampling keeps documents with probability proportional to a
  per-row weight, deterministically (id-hash threshold, not RNG), with
  the inverse-probability weight emitted for downstream reweighting;
- HLL sketches are the mergeable-state form of distinct counting — the
  only shape that survives incremental/rollup recomputation at 100 TB;
- triangle count is the standard clustering-coefficient probe of the
  near-dup pair graph (a sanity signal on LSH banding quality: dup
  clusters should be triangle-dense, random collisions are not).

Reference parity: none of this exists in the reference (its only text
operation is substring bulletizing, news_summarization_batch.py:104);
the tier is graded against BASELINE.json's curation north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.cachepin import pin
from news_categorization_big_data_spark.functions.hashing import hash60
from news_categorization_big_data_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from news_categorization_big_data_spark.plans.dedup import _lsh_cand_ctes
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table

#: Passage width in whitespace tokens. 8 keeps ≥1 passage for the
#: testdata's shortest documents; production corpora use 50-100.
PASSAGE_TOKENS = 8

#: Weighted-sampling buckets: keep-probability = min(weight, DEN)/DEN.
WSAMPLE_DEN = 1000


@register(
    "q_dedup_passage",
    oracle=f"""
    -- positional unnest + GROUP BY chunk, not a range-lambda slicing
    -- the captured list (quadratic in DuckDB on /tmp/skew3's 1.5M-token
    -- rows — the same class as the shingle-CTE rewrite) nor a lateral
    -- carrying the token array per row. Multiple unnests in one SELECT
    -- zip positionally; chunk c = tokens (i-1)//P == c, HAVING = P
    -- keeps exactly the floor(len/P) FULL chunks the slice form built.
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM documents WHERE text <> ''),
    toku AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i
             FROM tok),
    chunks AS (SELECT doc_id,
                      md5(string_agg(w, ' ' ORDER BY i)) AS h
               FROM toku
               GROUP BY doc_id, (i - 1) // {PASSAGE_TOKENS}
               HAVING COUNT(*) = {PASSAGE_TOKENS}),
    freq AS (SELECT h, COUNT(*) AS c FROM chunks GROUP BY h)
    SELECT ch.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_passages,
           CAST(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
           CAST(SUM(CASE WHEN f.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS dup_frac
    FROM chunks ch JOIN freq f ON f.h = ch.h
    GROUP BY ch.doc_id
    """,
    tier="C",
    doc=f"Passage-level exact dedup: each document is cut into "
    f"consecutive {PASSAGE_TOKENS}-token passages, passages are "
    "md5-fingerprinted, and every document reports how much of it is "
    "corpus-duplicated material (boilerplate detection — the "
    "sub-document complement of q_dedup_exact/q_dedup_near; cf. the "
    "EXACTSUBSTR finding of Lee et al. 2022). Spark: slice/transform "
    "higher-order functions build the passage hashes JVM-side (no "
    "UDF), one explode, one count shuffle on the 16-byte hash, one "
    "shuffle join back, one per-doc aggregate. At 100 TB the hash "
    "frequency table is the big intermediate — it shuffles as "
    "(hash, count) pairs only, and the join back is hash-partitioned "
    "on the same key so AQE reuses the exchange.",
)
def q_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    P = PASSAGE_TOKENS
    # Tokenize in a SEPARATE projection so the lambda below slices a
    # bound column, not the split(text) EXPRESSION: an expression in a
    # higher-order-function body re-evaluates per element, which made
    # this operator quadratic on /tmp/skew3's giant docs (re-splitting
    # 8 MB of text for each of 190k chunks — ~20 min per task; linear
    # form: seconds). _toks is referenced twice (size + slice), so
    # CollapseProject's non-cheap guard keeps the split hoisted —
    # pinned by tests/test_giant_docs.py.
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("_toks"))
    n = F.floor(F.size("_toks") / P).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunk = lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("_toks"), i * P + 1, P)))  # noqa: E731
    chunks = base.select(
        "doc_id", F.explode(F.transform(idx, chunk)).alias("h")
    )
    freq = chunks.groupBy("h").agg(F.count("*").alias("c"))
    return (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            (F.col("n_dup_passages").cast("double") / F.col("n_passages")).alias(
                "dup_frac"
            ),
        )
    )


@register(
    "q_sample_weighted",
    oracle=f"""
    SELECT doc_id, n_chars,
           LEAST(n_chars, {WSAMPLE_DEN}) AS weight
    FROM documents
    WHERE ('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % {WSAMPLE_DEN} < LEAST(n_chars, {WSAMPLE_DEN})
    """,
    tier="C",
    doc="Weighted deterministic sampling: keep each document with "
    "probability proportional to its length (weight/1000, capped at "
    "1), decided by an id-hash threshold — reproducible across "
    "engines, partitionings and reruns, unlike RNG sampling (the "
    "q_split_train_eval design, weight-generalized). The emitted "
    "weight column is the unnormalized inclusion propensity for "
    "downstream Horvitz-Thompson reweighting. Map-only: a per-row "
    "predicate, no shuffle, embarrassingly parallel at 100 TB.",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars"), F.lit(WSAMPLE_DEN))
    bucket = hash60(F.col("doc_id").cast("string"), seed="wsamp") % WSAMPLE_DEN
    return docs.where(bucket < weight).select(
        "doc_id", "n_chars", weight.alias("weight")
    )


@register(
    "q_hll_distinct",
    oracle="""
    WITH t AS (SELECT event_type,
                      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
               FROM events GROUP BY event_type),
    g AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_global
          FROM events)
    SELECT event_type, exact_users, TRUE AS type_in_bound,
           exact_global, TRUE AS global_in_bound
    FROM t, g
    """,
    tier="C",
    doc="Mergeable HLL distinct sketches (Spark 3.5+ Datasketches "
    "surface): per event type, an hll_sketch_agg over user_id is "
    "built, re-aggregated via hll_union_agg to the global sketch, and "
    "both estimates are checked. The sketch column is the point: "
    "unlike approx_count_distinct's scalar, the binary sketch is "
    "STATE — storable, mergeable across days/partitions without "
    "touching raw data, the only distinct-count shape that survives "
    "incremental recomputation at 100 TB. Sketch bytes/estimates are "
    "engine-specific, so this is a SEMI-ORACLE (round-7 upgrade from "
    "rows-only): the plan emits the exact counts plus booleans "
    "asserting both the per-type estimate and the UNIONED global "
    "estimate sit within 5% (3σ at the default lgConfigK=12, "
    "rsd≈1.6%) of exact; the oracle pins the booleans TRUE, so the "
    "driver hash fails if the sketch or its union drifts.",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    global_est = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_g")
    )
    exact_global = ev.agg(F.countDistinct("user_id").alias("exact_global"))
    return (
        per_type.select(
            "event_type",
            "exact_users",
            F.hll_sketch_estimate("sketch").alias("_a"),
        )
        .crossJoin(F.broadcast(global_est))
        .crossJoin(F.broadcast(exact_global))
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_a") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("type_in_bound"),
            "exact_global",
            (
                F.abs(F.col("_g") - F.col("exact_global"))
                <= F.lit(0.05) * F.col("exact_global")
            ).alias("global_in_bound"),
        )
        .orderBy("event_type")
    )


@register(
    "q_graph_triangles",
    oracle=f"""
    WITH {_lsh_cand_ctes()}
    SELECT e1.doc_a, e1.doc_b, e2.doc_b AS doc_c
    FROM cand e1
    JOIN cand e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
    JOIN cand e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
    ORDER BY e1.doc_a, e1.doc_b, doc_c
    """,
    tier="C",
    doc="Triangle enumeration on the banded-LSH near-duplicate pair "
    "graph (doc_a < doc_b < doc_c): the clustering-coefficient probe "
    "of dedup quality — true duplicate clusters are cliques (triangle-"
    "dense), random band collisions are trees (triangle-free), so the "
    "triangle count separates signal from noise in the banding "
    "parameters. The id-ordered edge orientation (a<b) is the "
    "standard compact-forward scheme: each triangle is produced "
    "exactly once, and the two equi-joins shuffle on edge endpoints "
    "(never an all-pairs product). Oracle reuses the SAME candidate-"
    "pair CTE chain as q_dedup_near/q_dedup_cluster, so the graphs "
    "cannot drift. At 100 TB the pair graph is orders of magnitude "
    "smaller than the corpus; degree skew (celebrity boilerplate "
    "nodes) is bounded upstream by the banding df-cap.",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    edges = lsh_candidate_pairs(minhash_signatures(docs)).select("doc_a", "doc_b")
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    # merge (SMJ) hints: every side of both joins is the SAME
    # corpus-dependent pair table behind a widening bucket explode —
    # its static estimate is blind, and the round-14 sf1 probe caught
    # the planner statically broadcasting an edge side (the
    # q_simhash_hamming crash class; AQE never demotes a static
    # broadcast join). SMJ keys on the equi conjuncts, evaluates the
    # range conjunct as the join filter, and spills on both sides.
    return (
        e1.join(
            e2.hint("merge"),
            (F.col("e2.doc_a") == F.col("e1.doc_a"))
            & (F.col("e2.doc_b") > F.col("e1.doc_b")),
        )
        .join(
            e3.hint("merge"),
            (F.col("e3.doc_a") == F.col("e1.doc_b"))
            & (F.col("e3.doc_b") == F.col("e2.doc_b")),
        )
        .select(
            F.col("e1.doc_a").alias("doc_a"),
            F.col("e1.doc_b").alias("doc_b"),
            F.col("e2.doc_b").alias("doc_c"),
        )
        .orderBy("doc_a", "doc_b", "doc_c")
    )


#: Distinctive-terms top-k per language.
CHI2_TOP_K = 3


@register(
    "q_chi2_terms",
    oracle=f"""
    WITH tok AS (SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                                 x -> x <> '')) AS term
                 FROM documents WHERE text <> ''),
    lt AS (SELECT lang, term, COUNT(*) AS a FROM tok GROUP BY lang, term),
    l AS (SELECT lang, SUM(a) AS lang_total FROM lt GROUP BY lang),
    t AS (SELECT term, SUM(a) AS term_total FROM lt GROUP BY term),
    g AS (SELECT SUM(a) AS grand FROM lt),
    cells AS (SELECT lt.lang, lt.term,
                     CAST(lt.a AS BIGINT) AS a,
                     CAST(t.term_total - lt.a AS BIGINT) AS b,
                     CAST(l.lang_total - lt.a AS BIGINT) AS c,
                     CAST(g.grand - t.term_total - l.lang_total + lt.a AS BIGINT) AS d,
                     CAST(g.grand AS BIGINT) AS n
              FROM lt JOIN l USING (lang) JOIN t USING (term) CROSS JOIN g),
    scored AS (SELECT lang, term, a,
                      CAST(n AS DOUBLE)
                      * (CAST(a*d - b*c AS DOUBLE) * CAST(a*d - b*c AS DOUBLE))
                      / (CAST(a+b AS DOUBLE) * CAST(c+d AS DOUBLE)
                         * CAST(a+c AS DOUBLE) * CAST(b+d AS DOUBLE)) AS chi2
               FROM cells),
    ranked AS (SELECT lang, term, a AS n_occurrences, chi2,
                      ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY chi2 DESC, term) AS rn
               FROM scored)
    SELECT lang, term, n_occurrences, chi2
    FROM ranked WHERE rn <= {CHI2_TOP_K}
    """,
    tier="C",
    doc=f"Distinctive terms per language (top-{CHI2_TOP_K} by chi-square "
    "association): the 2×2 contingency cells (term-in-lang / term-"
    "elsewhere / other-in-lang / other-elsewhere) come from three "
    "reuses of ONE (lang, term) count aggregate — per-language totals, "
    "per-term totals and the grand total are rollups of the same "
    "shuffle output, and the term-marginal join is the only second "
    "shuffle. The chi-square arithmetic is fixed-order double math "
    "over exactly-represented integer cells (products first cast from "
    "BIGINT where they fit, to DOUBLE where they'd overflow) — "
    "bit-identical in both engines. Tie-break: term ascending. The "
    "corpus-curation use: surface language-classifier features and "
    "contamination smells (a term wildly over-represented in one "
    "shard).",
)
def q_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    # the (lang, term) aggregate is the root of all four contingency
    # marginals; un-pinned, each rollup re-tokenized the corpus
    # (4 scans). Vocab x lang sized — cheap to pin (round-8 sweep).
    lt = pin(toks.groupBy("lang", "term").agg(F.count("*").alias("a")))
    l_tot = lt.groupBy("lang").agg(F.sum("a").alias("lang_total"))
    t_tot = lt.groupBy("term").agg(F.sum("a").alias("term_total"))
    grand = lt.agg(F.sum("a").alias("grand"))

    cells = (
        lt.join(F.broadcast(l_tot), "lang")
        .join(t_tot, "term")
        .crossJoin(F.broadcast(grand))
        .select(
            "lang",
            "term",
            F.col("a").cast("long").alias("a"),
            (F.col("term_total") - F.col("a")).cast("long").alias("b"),
            (F.col("lang_total") - F.col("a")).cast("long").alias("c"),
            (F.col("grand") - F.col("term_total") - F.col("lang_total") + F.col("a"))
            .cast("long")
            .alias("d"),
            F.col("grand").cast("long").alias("n"),
        )
    )
    det = (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    chi2 = (
        F.col("n").cast("double")
        * (det * det)
        / (
            (F.col("a") + F.col("b")).cast("double")
            * (F.col("c") + F.col("d")).cast("double")
            * (F.col("a") + F.col("c")).cast("double")
            * (F.col("b") + F.col("d")).cast("double")
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("chi2"), "term")
    return (
        cells.select("lang", "term", F.col("a").alias("n_occurrences"), chi2.alias("chi2"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= CHI2_TOP_K)
        .drop("rn")
    )


#: PageRank: damping factor split into exact literals, fixed iterations.
PR_ITERS = 3


def _pagerank_oracle() -> str:
    it = """
    it{K} AS (SELECT ed.dst AS doc_id, r.n_v,
                     CAST(SUM(CAST(r.rank / dg.deg AS DECIMAL(38,12)))
                          AS DOUBLE) AS s
              FROM ed JOIN r{P} r ON ed.src = r.doc_id
              JOIN dg ON ed.src = dg.src
              GROUP BY 1, 2),
    r{K} AS (SELECT doc_id, n_v, 0.15e0 / n_v + 0.85e0 * s AS rank
             FROM it{K})"""
    steps = ",".join(it.format(K=k, P=k - 1) for k in range(1, PR_ITERS + 1))
    return f"""
    WITH {_lsh_cand_ctes()},
    ed AS (SELECT doc_a AS src, doc_b AS dst FROM cand
           UNION ALL SELECT doc_b, doc_a FROM cand),
    v AS (SELECT DISTINCT src AS doc_id FROM ed),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_v FROM v),
    dg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY 1),
    r0 AS (SELECT doc_id, n_v, 1.0e0 / n_v AS rank FROM v, nv),
    {steps}
    SELECT doc_id, rank FROM r{PR_ITERS}
    """


@register(
    "q_graph_pagerank",
    oracle=_pagerank_oracle(),
    tier="C",
    doc=f"PageRank ({PR_ITERS} statically-unrolled power iterations, "
    "d=0.85) on the banded-LSH near-duplicate pair graph — the "
    "centrality score that ranks boilerplate hubs (one template "
    "near-duplicating hundreds of pages) above ordinary duplicate "
    "pairs. FULLY oracle-checked, unlike typical iterative algorithms: "
    "each neighbor contribution rank/deg is an identical IEEE double "
    "on both engines (arithmetic only, by induction over iterations), "
    "quantized to a 10⁻¹² decimal grid so the per-vertex sum is "
    "reduction-order-free, and the damping literals are e0-typed so "
    "neither engine parses them as DECIMAL. The undirected pair graph "
    "has no dangling vertices by construction (every endpoint has "
    "degree ≥ 1). Spark side builds one lazy plan with the loop "
    "unrolled — no driver actions, no caching; at 100 TB the "
    "convergence-checked variant swaps in the connected_components "
    "loop skeleton (persist + aggregate per round) over the same "
    "edge/degree tables. Oracle reuses the SAME candidate CTE chain "
    "as q_dedup_near/q_graph_triangles, so the graphs cannot drift.",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    pairs = lsh_candidate_pairs(minhash_signatures(docs)).select("doc_a", "doc_b")
    # the edge table is consumed ~2x per iteration plus the vertex and
    # degree derivations (8 consumers at PR_ITERS=3); un-pinned, each
    # consumer re-evaluated the WHOLE minhash+banding subtree — 16
    # parquet scans and 16 band-bucket shuffles for one query (round-8
    # A/B in SCALE.md). Candidate-pair-sized under LSH_MAX_DF, so
    # pinning it is the cheap side of the trade everywhere; persist
    # over localCheckpoint by interleaved measurement + fault
    # tolerance (SCALE.md).
    ed = pin(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
    )
    v = ed.select(F.col("src").alias("doc_id")).distinct()
    nv = v.agg(F.count("*").alias("n_v"))
    dg = ed.groupBy("src").agg(F.count("*").alias("deg"))
    r = v.crossJoin(F.broadcast(nv)).select(
        "doc_id", "n_v", (F.lit(1.0) / F.col("n_v")).alias("rank")
    )
    for _ in range(PR_ITERS):
        # Declared shuffle_hash on the rank/degree sides: without it
        # the planner STATICALLY broadcast the pinned edge table and
        # the src-keyed degree aggregate (round-15 widened-frame sweep
        # find — the same class as q_simhash_hamming's r14 crash: the
        # edge InMemoryRelation descends from the LSH pair explode,
        # whose static size estimate is garbage, and AQE never demotes
        # a statically-chosen broadcast; pagerank escaped the r14 sf1
        # sweep only because its DuckDB oracle is infeasible there).
        # Ranks/degrees are one row per VERTEX — the smaller side at
        # any scale — so they are the declared hash-build sides; the
        # edge table is never sorted, broadcast, or re-derived.
        contrib = (
            ed.join(r.hint("shuffle_hash"), ed["src"] == r["doc_id"])
            .join(dg.hint("shuffle_hash"), "src")
            .select(
                F.col("dst").alias("doc_id"),
                "n_v",
                (F.col("rank") / F.col("deg")).cast("decimal(38,12)").alias("c"),
            )
        )
        s = contrib.groupBy("doc_id", "n_v").agg(
            F.sum("c").cast("double").alias("s")
        )
        r = s.select(
            "doc_id",
            "n_v",
            (F.lit(0.15) / F.col("n_v") + F.lit(0.85) * F.col("s")).alias("rank"),
        )
    return r.select("doc_id", "rank")


#: Hashing-trick dimensionality: tokens hash into this many feature
#: buckets (the HashingTF pattern — fixed-width features, no vocab).
FEATURE_BUCKETS = 256


@register(
    "q_feature_hash",
    oracle=f"""
    WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                            x -> x <> '')) AS tok
                  FROM documents WHERE text <> ''),
    b AS (SELECT ('0x' || substr(md5('feat:' || tok), 1, 15))::BIGINT
                   % {FEATURE_BUCKETS} AS bucket,
                 tok
          FROM toks)
    SELECT bucket, COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_terms
    FROM b GROUP BY bucket
    """,
    tier="C",
    doc=f"Hashing-trick featurization (the HashingTF pattern): every "
    f"token maps to one of {FEATURE_BUCKETS} fixed buckets by md5 hash "
    "— no vocabulary to build, no dictionary to broadcast, which is "
    "why the trick survives 100 TB (vocab grows with the corpus; the "
    "bucket space doesn't). Output is the global feature table: "
    "per-bucket token mass and distinct-term count — the collision "
    "profile that tells you whether the bucket count is too small "
    "for the corpus. One explode + one partial-aggregating shuffle "
    "on a small integer key. The md5-derived bucket (not Spark's "
    "murmur3 hashingTF) is what makes the oracle able to reproduce "
    "the assignment exactly (functions/hashing.py rationale).",
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_categorization_big_data_spark.functions.text_exprs import tokens
    from news_categorization_big_data_spark.operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    toks = docs.select(
        F.explode(F.filter(tokens("text"), lambda t: t != "")).alias("tok")
    )
    return (
        toks.select(
            hash_bucket(F.col("tok"), "feat", FEATURE_BUCKETS).alias("bucket"),
            "tok",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("tok").alias("n_terms"),
        )
    )


# --------------------------------------------------------------------------
# Neighbor-set Jaccard (bipartite link prediction)
# --------------------------------------------------------------------------


@register(
    "q_graph_jaccard_neighbors",
    oracle="""
    WITH adj AS (SELECT DISTINCT user_id, event_type FROM events),
    deg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d
            FROM adj GROUP BY event_type),
    common AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM adj a JOIN adj b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_common,
           (n_common * 1000000) // (da.d + db.d - n_common) AS jaccard_ppm
    FROM common
    JOIN deg da ON da.event_type = common.type_a
    JOIN deg db ON db.event_type = common.type_b
    """,
    tier="C",
    doc="Neighbor-set Jaccard between event types on the user-event "
    "bipartite graph — the common-neighbors link-prediction / "
    "item-similarity primitive (|U_a ∩ U_b| / |U_a ∪ U_b| over user "
    "sets), with the similarity emitted as an EXACT floor-divided ppm "
    "long so no float division can perturb the cross-engine hash. "
    "Shape: one distinct (the adjacency), one self-join on user_id "
    "grouped to pair counts, two broadcast degree joins. Scale: the "
    "self-join fans out d_u^2/2 pairs per user — bounded here because "
    "one side of the bipartition is tiny (event types), which is the "
    "item-similarity regime (items per user is small even when users "
    "are billions); for item sets with power-law hubs, cap per-user "
    "degree first (the q_itemset_pairs lesson) — an uncapped hub user "
    "contributes quadratically.",
)
def q_graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the distinct adjacency feeds three consumers (degrees + both
    # self-join sides); un-pinned, each re-scanned and re-deduped the
    # fact table. Bounded by |users| x |event types| — cheap to pin
    # (round-8 multi-consumer coefficient, SCALE.md).
    adj = pin(
        load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    )
    deg = adj.groupBy("event_type").agg(F.count("*").cast("long").alias("d"))
    a = adj.select("user_id", F.col("event_type").alias("type_a"))
    b = adj.select("user_id", F.col("event_type").alias("type_b"))
    common = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    da = deg.select(F.col("event_type").alias("type_a"), F.col("d").alias("da"))
    db = deg.select(F.col("event_type").alias("type_b"), F.col("d").alias("db"))
    return (
        common.join(F.broadcast(da), "type_a")
        .join(F.broadcast(db), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_common",
            F.expr("(n_common * 1000000) div (da + db - n_common)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
