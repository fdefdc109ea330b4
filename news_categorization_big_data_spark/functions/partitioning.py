"""Partition-shape guards.

Small-file inputs (one parquet row group) arrive as a single partition,
which serializes every downstream transform onto one core. ``fan_out``
round-robin-repartitions CPU-heavy subtrees (hashing, shingling, vector
math) to the session's default parallelism so they use every core.

The decision is **conf-driven, not plan-driven**: probing the input's
partition count via ``df.rdd`` would force an analyzer round-trip per
call and is unsupported on Spark Connect. Instead:

- ``spark.graft.fanout.enabled`` (default ``true``) — set ``false`` on a
  real cluster, where scans already yield thousands of partitions and an
  extra round-robin exchange is pure cost. At 100 TB the scan width is
  governed by ``spark.sql.files.maxPartitionBytes``; this knob exists
  for the single-row-group small-file regime only.
- ``spark.graft.fanout.partitions`` (default: ``defaultParallelism``) —
  explicit width override.

Use it in compute-heavy operators, not plain scans/filters — those keep
their scan-aligned partitions and pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition a CPU-heavy subtree to full parallelism (conf-gated)."""
    spark = df.sparkSession
    if spark.conf.get("spark.graft.fanout.enabled", "true").lower() == "false":
        return df
    target = partitions or int(
        spark.conf.get("spark.graft.fanout.partitions", "0")
    ) or spark.sparkContext.defaultParallelism
    return df.repartition(target)
