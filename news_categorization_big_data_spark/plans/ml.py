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
    oracle=None,  # TF-IDF unit scoring is SQL-expressible but the rejoin is
    # not worth a 100-line oracle; rows-only + golden tests (test_ml.py)
    tier="C",
    doc="Extractive summarization in pure DataFrame ops (unit split → "
    "corpus-TF-IDF scoring → top-2 units per doc in document order), the "
    "deterministic replacement for the reference's t5-small UDF "
    "(news_summarization_batch.py:52-73). The '- ' bullet format matches "
    "news_summarization_batch.py:102-104.",
)
def q_summarize_extractive(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    return extractive_summarize(docs, id_col="doc_id", text_col="text", top_k=2)
