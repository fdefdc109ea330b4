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
    -- non-finite banding pinned to NULL: pandas' clip keeps NaN and
    -- the nullable-Int32 cast maps NaN AND ±Inf to NA, while DuckDB's
    -- NaN-sorts-greatest would band NaN as 5 — the CASE mirrors the
    -- engine (an unmeasurable value has no band; the /tmp/skew7
    -- finding).
    WITH b AS (SELECT event_id,
                      CASE WHEN isfinite(value)
                           THEN CAST(least(greatest(floor(value / 50), 0), 5) AS INT)
                      END AS value_band
               FROM events)
    SELECT event_id, value_band,
           'b' || CAST(value_band AS VARCHAR) AS band_label
    FROM b
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
    and value range (one subtraction of identical doubles — exact).

    Order statistics run over the FINITE subset: NaN has no defined
    sort position (pandas sorts it last, DuckDB's comparisons treat it
    as greatest — cross-engine divergence, the /tmp/skew7 finding) and
    a range against ±Inf is ±Inf/NaN. n_events still counts every row;
    a group with no finite values profiles as NULL."""
    import numpy as np

    vals = pdf["value"].to_numpy(dtype="float64")
    fin = np.sort(vals[np.isfinite(vals)], kind="mergesort")
    m = len(fin)
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(vals)],
            "median_low": [float(fin[(m - 1) // 2]) if m else None],
            "value_range": [float(fin[m - 1] - fin[0]) if m else None],
        }
    )


@register(
    "q_udaf_grouped",
    oracle="""
    -- order statistics over the FINITE subset (fv): NaN/±Inf and NULL
    -- are excluded on both engines — see _group_profile; n_events
    -- still counts every row
    WITH fin AS (SELECT user_id,
                        CASE WHEN isfinite(value) THEN value END AS fv
                 FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           list_sort(list(fv) FILTER (fv IS NOT NULL))
               [(COUNT(fv) - 1) // 2 + 1] AS median_low,
           (max(fv) - min(fv)) AS value_range
    FROM fin GROUP BY user_id
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
