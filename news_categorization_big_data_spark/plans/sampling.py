"""Registered queries for deterministic splitting / sampling
(operators/sampling.py) — the dataset-curation surface a training-data
pipeline runs before anything else touches the corpus.

Both queries compile to map-only plans (a per-row md5-bucket predicate,
no shuffle) and are fully oracle-verified: the id-hash membership rule
is bit-identical in DuckDB, unlike RNG-based ``df.sample``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from news_categorization_big_data_spark.operators.sampling import (
    assign_split,
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
