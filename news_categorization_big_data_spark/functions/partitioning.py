"""Partition-shape guards.

Small-file inputs (one parquet row group) arrive as a single partition,
which serializes every downstream transform onto one core. ``fan_out``
round-robin-repartitions CPU-heavy subtrees (hashing, shingling, vector
math) to the session's default parallelism so they use every core — and
NEVER shrinks an already-wide input.

Decision order:

1. ``spark.graft.fanout.enabled=false`` → no-op (set on real clusters
   where scans already yield thousands of partitions; at 100 TB scan
   width is governed by ``spark.sql.files.maxPartitionBytes``).
2. ``spark.graft.fanout.partitions`` / explicit ``partitions`` arg →
   repartition to exactly that width (operator knows best).
3. Default: probe the current width and repartition only when the input
   is NARROWER than ``defaultParallelism``. The probe costs one
   plan→RDD analyzer round-trip on classic Spark; on Spark Connect
   (where neither ``df.rdd`` nor ``sparkContext`` exists) the probe
   fails and fan_out degrades to a safe no-op — use the confs there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Widen a CPU-heavy subtree to full parallelism (see module doc).

    The explicit path sets the TARGET width, never the exact width —
    fan_out NEVER shrinks an already-wide input (collapsing a
    2000-partition scan to a conf-sized handful and paying a shuffle
    for it is the exact pathology this module exists to prevent). The
    only exception is Spark Connect with an explicit width, where the
    current width can't be probed and the conf owner's number wins.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.graft.fanout.enabled", "true").lower() == "false":
        return df
    explicit = partitions or int(spark.conf.get("spark.graft.fanout.partitions", "0"))
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no sparkContext/rdd probe
        current = None
    if explicit:
        if current is not None and current >= explicit:
            return df
        return df.repartition(explicit)
    if current is None:
        return df  # Connect without explicit width: safe no-op
    target = spark.sparkContext.defaultParallelism
    if current >= target:
        return df
    return df.repartition(target)
