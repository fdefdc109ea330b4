"""Corpus-refinement & weighted-selection tier (round 6, late batch).

Four operators a training-data platform runs after near-dup removal and
before mixture assembly: a bigram-LM fluency/boilerplate score per
document, a fixed-size weighted sample WITHOUT replacement, an
entity-resolution blocking-key profile, and a time-weighted average over
the event stream (the duration-weighted mean that plain AVG gets wrong
whenever observations arrive unevenly).

House determinism rules (plans/analytics.py / plans/registry.py):
exact integer counts everywhere they fit; conditional probabilities on
an exact floor-divided ppm grid (the q_bigram_lm convention); every
cross-row double sum routed through DECIMAL (decimal addition is
associative, double addition is not); md5-derived priorities for
data-derived "random" choices (functions/hashing.hash60); ties broken
on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.hashing import hash60
from news_categorization_big_data_spark.functions.partitioning import fan_out
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.plans.relational import nonfinite
from news_categorization_big_data_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Bigram-LM document fluency score
# --------------------------------------------------------------------------

#: Heads must be seen this often for their conditional row to survive
#: LM pruning (the q_bigram_lm floor — rare heads carry no signal and
#: at corpus scale pruning is what bounds the LM table).
FLUENCY_MIN_HEAD = 10


@register(
    "q_doc_fluency",
    oracle=f"""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
                  FROM documents WHERE text <> ''),
    -- list_zip, not a lateral range-unnest: the lateral carries the
    -- whole token array per emitted index (quadratic bytes on giant
    -- docs — see q_bigram_lm's oracle note). Same (t[i], t[i+1]) pairs.
    pairs AS (SELECT doc_id, u[1] AS head, u[2] AS nxt
              FROM (SELECT doc_id,
                           unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS u
                    FROM toks)
              WHERE u[1] <> '' AND u[2] <> ''),
    lm AS (SELECT head, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM pairs GROUP BY head, nxt),
    lmh AS (SELECT head, nxt,
                   CAST(cnt * 1000000
                        // SUM(cnt) OVER (PARTITION BY head) AS BIGINT) AS cond_ppm,
                   SUM(cnt) OVER (PARTITION BY head) AS head_total
            FROM lm),
    lmp AS (SELECT head, nxt, cond_ppm FROM lmh
            WHERE head_total >= {FLUENCY_MIN_HEAD}),
    docb AS (SELECT doc_id, head, nxt, CAST(COUNT(*) AS BIGINT) AS k
             FROM pairs GROUP BY doc_id, head, nxt)
    SELECT d.doc_id,
           CAST(SUM(d.k) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN l.cond_ppm IS NOT NULL THEN d.k ELSE 0 END)
                AS BIGINT) AS lm_hits,
           CAST(SUM(d.k * COALESCE(l.cond_ppm, 0)) // SUM(d.k)
                AS BIGINT) AS mean_cond_ppm
    FROM docb d LEFT JOIN lmp l USING (head, nxt)
    GROUP BY d.doc_id
    """,
    tier="C",
    doc="Per-document fluency/boilerplate score under the corpus bigram "
    "LM: the frequency-weighted mean of P(next | head) in exact "
    "floor-divided ppm over the document's bigrams, with bigrams "
    f"whose head was seen < {FLUENCY_MIN_HEAD} times backing off to 0 "
    "(the same pruning floor that bounds the LM table at corpus "
    "scale). High score = the text keeps taking the corpus's most "
    "predictable next step (template/boilerplate); low score = "
    "surprising text. This is the filtering role perplexity plays in "
    "corpus curation, expressed on an integer grid instead of a "
    "float log-sum so the result is bit-stable across engines (a "
    "true log-perplexity would hinge on cross-libm ln agreement — "
    "mean conditional probability is a different statistic, not a "
    "monotone transform of perplexity, and the docs say so). Plan: "
    "one pair explode feeding BOTH the LM aggregate and the per-doc "
    "bigram counts, a (head,nxt)-keyed equi-join of doc bigrams to "
    "the pruned LM — unhinted, so AQE broadcasts a small LM and "
    "shuffles a corpus-scale one — then a doc_id-keyed final "
    "aggregate. All integers; "
    "overflow-safe (k*ppm <= n_bigrams*1e6 per doc).",
)
def q_doc_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Keyed fan_out before the bigram explode (guide §2.5): the single-
    # row-group bench fixture makes the scan 1 task, and `pairs` feeds
    # TWO aggregates, so the split+zip+explode ran twice, single-core.
    # The doc_id hash exchange (a) parallelizes the explode and (b) is
    # deduplicated by ReuseExchange, so both consumers read ONE
    # materialized shuffle instead of recomputing the explode lineage —
    # the cheap-shared-subtree alternative to the persist the comment
    # below rejects. No-op on cluster-width scans. Measured: sf1
    # 6.09->1.63 s, sf0.1 0.85->0.75 s, oracle-MATCH.
    docs = fan_out(
        load_table(spark, sf_dir, "documents").where(F.col("text") != ""),
        by=("doc_id",),
    )
    t = F.split(F.lower("text"), r"\s+")
    n = F.size(t)
    zipped = F.arrays_zip(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
    )
    pairs = (
        docs.select("doc_id", F.explode(zipped).alias("p"))
        .select("doc_id", F.col("p.0").alias("head"), F.col("p.1").alias("nxt"))
        .where((F.col("head") != "") & (F.col("nxt") != ""))
    )
    # pairs feeds two different-keyed aggregates, but persisting it
    # measured ~2x WORSE cold at the sf1 decade (2.2 s -> 4.2 s):
    # unlike jaccard's compact shingle-hash table, the exploded pair
    # rows are corpus-sized strings — writing them to cache costs more
    # than re-running the cheap explode. The multi-consumer persist
    # rule (SCALE.md) needs the shared subtree to be SMALLER than its
    # recompute, not just multiply consumed.
    lm = pairs.groupBy("head", "nxt").agg(F.count("*").cast("long").alias("cnt"))
    w_head = Window.partitionBy("head")
    lmp = (
        lm.select(
            "head",
            "nxt",
            F.expr("cnt * 1000000 div sum(cnt) over (partition by head)")
            .cast("long")
            .alias("cond_ppm"),
            F.sum("cnt").over(w_head).alias("head_total"),
        )
        .where(F.col("head_total") >= FLUENCY_MIN_HEAD)
        .drop("head_total")
    )
    docb = pairs.groupBy("doc_id", "head", "nxt").agg(
        F.count("*").cast("long").alias("k")
    )
    joined = docb.join(lmp, ["head", "nxt"], "left")
    return joined.groupBy("doc_id").agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("cond_ppm").isNotNull(), F.col("k")).otherwise(0))
        .cast("long")
        .alias("lm_hits"),
        F.expr("sum(k * coalesce(cond_ppm, 0)) div sum(k)")
        .cast("long")
        .alias("mean_cond_ppm"),
    )


# --------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (fixed size)
# --------------------------------------------------------------------------

#: Sample size, weight cap, and the replication band width: a document
#: of weight w gets ceil(w / WOR_BAND) seeded hash tickets (<= 4 at the
#: cap), and the sample is the WOR_K docs holding the smallest best
#: ticket.
WOR_K = 100
WOR_WCAP = 2000
WOR_BAND = 500


@register(
    "q_sample_wor",
    oracle=f"""
    WITH w AS (SELECT doc_id, LEAST(n_chars, {WOR_WCAP}) AS weight
               FROM documents WHERE LEAST(n_chars, {WOR_WCAP}) >= 1),
    rep AS (SELECT doc_id, weight, i.i AS i
            FROM w, unnest(range(1, (weight + {WOR_BAND - 1}) // {WOR_BAND} + 1))
                     AS i(i)),
    pri AS (SELECT doc_id, weight,
                   MIN(('0x' || substr(md5('wor:' || CAST(doc_id AS VARCHAR)
                        || ':' || CAST(i AS VARCHAR)), 1, 15))::BIGINT)
                     AS priority
            FROM rep GROUP BY doc_id, weight)
    SELECT doc_id, weight, priority
    FROM pri ORDER BY priority, doc_id LIMIT {WOR_K}
    """,
    tier="C",
    doc=f"Fixed-size weighted sample WITHOUT replacement ({WOR_K} docs): "
    "each document draws ceil(weight/band) seeded md5 tickets "
    f"(weight = chars capped at {WOR_WCAP}, band {WOR_BAND}, so <= 4 "
    "tickets) and keeps its best; the sample is the global top-K by "
    "best ticket. Min-of-r-uniform-hashes makes a heavier doc's best "
    "ticket stochastically smaller, so inclusion probability rises "
    "with weight — the hash-replication weighted sampler (the "
    "integer-exact cousin of Efraimidis-Spirakis A-Res, whose "
    "u^(1/w) keys would hinge on cross-libm pow/ln agreement; the "
    "banded-replication distribution is documented, not hidden). "
    "Complements q_sample_weighted (Bernoulli, random SIZE) with the "
    "fixed-size guarantee mixture recipes need. Plan: map-side "
    "bounded explode (<= 4x), partial min per doc, one "
    "TakeOrderedAndProject — no full sort, no full shuffle; at "
    "100 TB the top-K heap per partition is all that moves. "
    "Deterministic across engines, partitionings and reruns; ties "
    "broken on doc_id.",
)
def q_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars"), F.lit(WOR_WCAP))
    base = docs.select("doc_id", weight.alias("weight")).where(
        F.col("weight") >= 1
    )
    r = F.expr(f"(weight + {WOR_BAND - 1}) div {WOR_BAND}")
    rep = base.select(
        "doc_id",
        "weight",
        F.explode(F.sequence(F.lit(1), r.cast("int"))).alias("i"),
    )
    pri = hash60(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("i").cast("string")),
        seed="wor",
    )
    best = rep.groupBy("doc_id", "weight").agg(F.min(pri).alias("priority"))
    return best.orderBy("priority", "doc_id").limit(WOR_K)


# --------------------------------------------------------------------------
# Entity-resolution blocking profile
# --------------------------------------------------------------------------

#: Length-bucket width (chars) and the number of heaviest blocks shown.
ERB_BUCKET = 500
ERB_TOPN = 50


@register(
    "q_er_blocking",
    oracle=f"""
    WITH keyed AS (
      SELECT lang,
             (regexp_split_to_array(lower(trim(text)), '\\s+'))[1] AS tok1,
             n_chars // {ERB_BUCKET} AS len_bucket
      FROM documents WHERE trim(text) <> ''),
    blocks AS (SELECT lang, tok1, len_bucket,
                      CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM keyed GROUP BY lang, tok1, len_bucket)
    SELECT lang, tok1, CAST(len_bucket AS BIGINT) AS len_bucket, n_docs,
           CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS cand_pairs
    FROM blocks WHERE n_docs >= 2
    ORDER BY cand_pairs DESC, lang, tok1, len_bucket LIMIT {ERB_TOPN}
    """,
    tier="C",
    doc="Entity-resolution blocking-key profile: key every document by "
    f"(lang, first token, {ERB_BUCKET}-char length bucket) — the "
    "standard cheap blocking scheme — and report the "
    f"{ERB_TOPN} heaviest blocks with their candidate-pair load "
    "n*(n-1)/2. This is the go/no-go artifact before any pairwise "
    "matcher: blocking is only viable if no block is quadratically "
    "explosive, and the heavy hitters here are exactly the keys that "
    "need splitting (or salting) before the match join runs. Plan: "
    "one map-side key projection, one partial-aggregating shuffle to "
    "block keys, TakeOrderedAndProject for the top-N — block "
    "cardinality, not corpus size, bounds everything after the "
    "first aggregate. Exact integers throughout; ties broken on the "
    "full key.",
)
def q_er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.trim(F.col("text")) != ""
    )
    keyed = docs.select(
        "lang",
        F.element_at(F.split(F.lower(F.trim("text")), r"\s+"), 1).alias("tok1"),
        F.expr(f"n_chars div {ERB_BUCKET}").alias("len_bucket"),
    )
    blocks = keyed.groupBy("lang", "tok1", "len_bucket").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return (
        blocks.where(F.col("n_docs") >= 2)
        .select(
            "lang",
            "tok1",
            F.col("len_bucket").cast("long").alias("len_bucket"),
            "n_docs",
            F.expr("n_docs * (n_docs - 1) div 2").cast("long").alias("cand_pairs"),
        )
        .orderBy(F.col("cand_pairs").desc(), "lang", "tok1", "len_bucket")
        .limit(ERB_TOPN)
    )


# --------------------------------------------------------------------------
# Time-weighted average (TWAP)
# --------------------------------------------------------------------------


@register(
    "q_twap",
    oracle="""
    WITH s AS (SELECT event_type, event_id, epoch_us(ts) AS tus,
                      NOT isfinite(value) AS rpois,
                      CAST(CAST((CASE WHEN isfinite(value) THEN value END)
                                AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                        AS v_micro
               FROM events WHERE value IS NOT NULL),
    d AS (SELECT event_type, v_micro, rpois,
                 LEAD(tus) OVER (PARTITION BY event_type
                                 ORDER BY tus, event_id) - tus AS dur_us
          FROM s)
    -- poison -> NULL TWAP when any interval-opening value is
    -- non-finite (a silently-short weighted sum is a wrong price);
    -- the interval counts/durations are time facts and stay
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CASE WHEN NOT BOOL_OR(rpois) THEN
           CAST(SUM(CAST(v_micro AS HUGEINT) * dur_us) // SUM(dur_us)
                AS BIGINT) END AS twap_micro,
           CASE WHEN NOT BOOL_OR(rpois) THEN
           CAST(CAST(SUM(CAST(v_micro AS HUGEINT) * dur_us) // SUM(dur_us)
                     AS DOUBLE) / 1000000 AS DOUBLE) END AS twap
    FROM d WHERE dur_us IS NOT NULL
    GROUP BY event_type
    """,
    tier="C",
    doc="Time-weighted average of `value` per event type: each priced "
    "observation holds until the next priced observation of the same "
    "type, and the mean weights each value by how long it held "
    "(epoch-µs integer durations; the trailing open interval is "
    "excluded). This is THE correct average for unevenly sampled "
    "series — plain AVG over-weights bursts — and the TWAP/uptime "
    "shape metering, billing and market data all need. NULL-priced "
    "events are excluded BEFORE the window so durations span to the "
    "next real price and the count, duration sum and value sum all "
    "describe the same interval set (the q_rolling_corr "
    "missing-data lesson, plans/warehouse.py). Determinism: value "
    "on an exact micro-unit integer grid, value*duration summed as "
    "exact 128-bit integers (DECIMAL(38,0) / HUGEINT), then ONE "
    "floor division to integer twap_micro — never casting a >2^53 "
    "accumulator to double, which double-rounds differently across "
    "engines (int128->double then /1e6 vs one correctly-rounded "
    "BigDecimal conversion; bitten at sf0.001). The double `twap` "
    "is derived from the SMALL exact integer, one rounding on both "
    "engines. Values are non-negative so truncating `div` == floor. "
    "Plan: one shuffle to event_type, one per-partition sort for "
    "LEAD, partial-aggregated final rollup.",
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.unix_micros(F.col("ts")).alias("tus"),
            F.coalesce(nonfinite("value"), F.lit(False)).alias("rpois"),
            (F.col("value").cast("decimal(18,6)") * 1_000_000)
            .cast("long")
            .alias("v_micro"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("tus", "event_id")
    d = ev.select(
        "event_type",
        "v_micro",
        "rpois",
        (F.lead("tus").over(w) - F.col("tus")).alias("dur_us"),
    ).where(F.col("dur_us").isNotNull())
    agg = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("dur_us").cast("long").alias("total_us"),
        # poison -> NULL TWAP (see the oracle note; /tmp/skew7)
        F.when(
            ~F.max("rpois"),
            F.expr(
                "sum(cast(v_micro as decimal(38,0)) * dur_us) div sum(dur_us)"
            ).cast("long"),
        ).alias("twap_micro"),
    )
    return agg.select(
        "event_type",
        "n_intervals",
        "total_us",
        "twap_micro",
        (F.col("twap_micro").cast("double") / F.lit(1_000_000)).alias("twap"),
    )
