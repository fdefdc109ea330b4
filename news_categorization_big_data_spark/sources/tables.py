"""Parquet table catalog for the engine's canonical store.

The engine's canonical storage format is Parquet (columnar, splittable,
predicate-pushdown- and column-pruning-friendly) — the Spark-native
replacement for the reference's MongoDB document store
(database_storage.py:16-32): full scans become parquet scans, Mongo
``find({"created_at": {"$gt": ts}})`` range scans become pushed-down
predicates, and at scale tables would be partitioned/z-ordered by the
range-scan key so partition pruning kicks in before row-group pruning.

Timestamp normalization: the driver testdata writes ``events.ts`` as
INT64 TIMESTAMP(NANOS). Spark 4 reads it (only) as a raw nanosecond long
under ``spark.sql.legacy.parquet.nanosAsLong``; we convert to a
microsecond timestamp with integer floor-division — bit-for-bit the same
truncation DuckDB applies when it reads the ns column, so both engines
see identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from news_categorization_big_data_spark.session import tune_session

#: Tables in the driver-generated testdata (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing ns-precision timestamps to µs."""
    tune_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if isinstance(field.dataType, T.LongType) and field.name == "ts":
            # ns → µs truncation (matches DuckDB's read of the same file).
            df = df.withColumn(field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a dict of DataFrames (all lazy)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for ``spark.sql`` entry points."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
