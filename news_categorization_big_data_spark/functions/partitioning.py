"""Partition-shape guards.

Small-file inputs (one parquet row group) arrive as a single partition,
which serializes every downstream transform onto one core. ``fan_out``
repartitions up to the session's default parallelism — but ONLY when the
input has fewer partitions than cores, so on a real cluster where a scan
already yields thousands of partitions it is a no-op (no extra shuffle).

Use it in compute-heavy operators (hashing, shingling, vector math), not
in plain scans/filters — those should keep their scan-aligned partitions
and pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition only if the input is narrower than the target."""
    spark = df.sparkSession
    target = partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
