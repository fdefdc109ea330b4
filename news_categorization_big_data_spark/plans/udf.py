"""Python UDF surface (SURVEY.md §2.10): scalar ``@pandas_udf`` and
grouped-map ``applyInPandas`` as registered, oracle-checked queries.

The reference's only Python hooks are two ``mapInPandas`` model stages
(news_categorization_streaming.py:59-112, news_summarization_batch.py:
52-73 — engine-native replacements in operators/classify.py and
operators/summarize.py). These two queries exercise the *other* Python
entry points an engine must support — Arrow-vectorized Series→Series
scalar functions and per-group pandas transforms — with deterministic
arithmetic so DuckDB can oracle-check the values exactly:

- every float op used (divide, floor, clip, max-min, element pick) is a
  single IEEE-754 double operation on identical operands → bit-identical
  across engines; no accumulation-order-sensitive reductions;
- the grouped median is the *lower* median (an order statistic — a
  picked element, not an interpolated average), exact by construction.

Scale notes: a pandas UDF ships Arrow batches across the JVM↔Python
boundary — ~10-100× cheaper than row-at-a-time Python UDFs but still
the slow path vs built-in Column expressions (both queries here have
pure-native equivalents; the UDFs exist to verify the surface).
``applyInPandas`` additionally shuffles on the group key and
materializes each group in one Python worker's memory — at 100 TB keep
groups bounded (user_id-sized, never corpus-sized).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table


def _value_band(v: pd.Series) -> pd.Series:
    """Series→Series banding: floor(value/50) clamped to [0, 5].

    Mirrors the reference's clamp idiom min(100, max(20, n//3))
    (news_summarization_batch.py:67) as a vectorized Arrow batch op.
    Wrapped with @pandas_udf at call time, NOT at module level: the
    decorator needs an active session, and Python workers re-import
    this module when unpickling the grouped-map function below.
    Nullable Int32 out: a NULL value propagates as NULL (matching the
    oracle's SQL semantics) instead of crashing the astype.
    """
    return v.floordiv(50.0).clip(0, 5).astype("Int32")


@register(
    "q_udf_scalar",
    oracle="""
    SELECT event_id,
           CAST(least(greatest(floor(value / 50), 0), 5) AS INT) AS value_band,
           'b' || CAST(CAST(least(greatest(floor(value / 50), 0), 5) AS INT) AS VARCHAR)
             AS band_label
    FROM events
    """,
    tier="B",
    doc="Scalar @pandas_udf (Series→Series over Arrow batches): clamp-band "
    "each event value. floor + clip are single double ops — engine-exact. "
    "The band label is derived natively AFTER the UDF: keep string "
    "formatting in codegen, spend the Python boundary on the math only.",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    band_udf = pandas_udf(_value_band, "int")
    banded = ev.select("event_id", band_udf("value").alias("value_band"))
    return banded.withColumn(
        "band_label", F.concat(F.lit("b"), F.col("value_band").cast("string"))
    )


def _group_profile(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user profile: count, lower-median (order statistic — exact),
    and value range (one subtraction of identical doubles — exact)."""
    vals = pdf["value"].sort_values(kind="mergesort").to_numpy()
    n = len(vals)
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [n],
            "median_low": [vals[(n - 1) // 2]],
            "value_range": [vals[n - 1] - vals[0]],
        }
    )


@register(
    "q_udaf_grouped",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           list_sort(list(value))[(COUNT(*) - 1) // 2 + 1] AS median_low,
           (max(value) - min(value)) AS value_range
    FROM events GROUP BY user_id
    """,
    tier="B",
    doc="Grouped-map applyInPandas: one pandas frame per user_id group → "
    "one profile row. Exactly one shuffle on the group key; each group "
    "materializes in a single Python worker (bounded: one user's events). "
    "Median is the lower order statistic, picked not interpolated, so the "
    "value is an element of the input — oracle-exact.",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    return ev.groupBy("user_id").applyInPandas(
        _group_profile,
        schema="user_id long, n_events long, median_low double, value_range double",
    )
