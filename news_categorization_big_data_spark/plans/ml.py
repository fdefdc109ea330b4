"""ML surface queries (SURVEY.md §2.12 "(ml)" rows): classification
pipeline and extractive summarization as registered queries.

Model outputs are engine-specific (hash-TF feature spaces, LBFGS fit) →
rows-only driver checks; quality is asserted in tests/test_ml.py
(accuracy threshold on a separable fixture, fallback contract, schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_categorization_big_data_spark.operators import classify as clf
from news_categorization_big_data_spark.operators.summarize import extractive_summarize
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table


@register(
    "q_ml_classify",
    oracle=None,  # model internals are engine-specific → rows-only check
    tier="C",
    doc="MLlib classification pipeline (RegexTokenizer → HashingTF → IDF → "
    "LogisticRegression), the engine-native replacement for the "
    "reference's zero-shot model (news_categorization_streaming.py:59-112)."
    " Trained on documents labeled by lang; output preserves the "
    "(id, category, confidence) contract with ('unknown', 0.0) fallbacks.",
)
def q_ml_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    model = clf.fit(docs, text_col="text", label_col="lang")
    return clf.classify(model, docs, id_col="doc_id", text_col="text")


@register(
    "q_summarize_extractive",
    oracle="""
    WITH base AS (SELECT doc_id, left(text, 5000) AS text
                  FROM documents WHERE text <> ''),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM base),
    toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM base),
    units AS (SELECT doc_id, CAST(u.i AS INT) AS pos,
                     array_to_string(t[u.i * 12 + 1 : (u.i + 1) * 12], ' ') AS unit
              FROM toks,
                   UNNEST(range(0, CAST(ceil(len(t) / 12.0) AS BIGINT))) AS u(i)),
    units_f AS (SELECT * FROM units WHERE unit <> ''),
    tok AS (SELECT doc_id, pos, unit,
                   unnest(regexp_split_to_array(unit, '\\s+')) AS token
            FROM units_f),
    dfreqs AS (SELECT token, COUNT(*) AS dfreq
               FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
    scored AS (SELECT t.doc_id, t.pos, t.unit,
                      SUM(CAST(floor((1000000.0 * n.n_docs) / dfreqs.dfreq) AS BIGINT))
                        AS score
               FROM tok t JOIN dfreqs USING (token), n
               GROUP BY t.doc_id, t.pos, t.unit),
    top AS (SELECT doc_id, pos, unit FROM (
              SELECT doc_id, pos, unit,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, pos) AS rn
              FROM scored) WHERE rn <= 2)
    SELECT doc_id,
           '- ' || string_agg(unit, E'\n- ' ORDER BY pos) AS summary,
           COUNT(*) AS n_units
    FROM top GROUP BY doc_id
    """,
    tier="C",
    doc="Extractive summarization in pure DataFrame ops (unit split → "
    "integer corpus-rarity scoring → top-2 units per doc in document "
    "order), the deterministic replacement for the reference's t5-small "
    "UDF (news_summarization_batch.py:52-73). The '- ' bullet format "
    "matches news_summarization_batch.py:102-104. Integer unit scores "
    "(floor(1e6·n_docs/df) summed in BIGINT) make the whole pipeline — "
    "chunking, scoring, ranking, rejoin — oracle-exact; the previous "
    "float log-idf scoring was reduction-order/libm-sensitive and "
    "therefore rows-only.",
)
def q_summarize_extractive(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    return extractive_summarize(docs, id_col="doc_id", text_col="text", top_k=2)
