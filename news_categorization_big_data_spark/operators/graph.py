"""Distributed connected components: turn near-duplicate PAIRS into
duplicate CLUSTERS so a dedup pass can keep one canonical document per
cluster (min id) instead of dropping both sides of every pair.

Algorithm: min-label propagation — every vertex starts labeled with its
own id; each round, every vertex takes the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed =
graph diameter, and near-dup graphs are shallow (clusters are cliques
or short chains from banded LSH), so 2-4 rounds is typical.

This is the one operator family where a driver-side loop with an eager
per-round action is the *correct* distributed shape (same contract as
GraphX/GraphFrames connectedComponents or MLlib's iterative solvers):
the convergence test IS a distributed aggregate, and each round's label
table is cached so round N+1 reads a materialized RDD instead of an
ever-deeper lineage. For planet-scale graphs swap in the large-star/
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) — same loop skeleton, fewer rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_out: str = "doc_id",
    component_out: str = "component",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex appearing in ``pairs``; the
    component label is the minimum vertex id in the component.

    Vertices not in any pair are singletons and are intentionally NOT
    emitted — at corpus scale the pair graph is tiny next to the corpus,
    and the caller left-joins this table to tag duplicates (null
    component ⇒ unique document).

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge (a
    diameter-25 near-dup cluster means the candidate generator is
    broken, not that more rounds are needed).
    """
    # The pair graph is orders of magnitude smaller than whatever corpus
    # produced it, but its lineage (e.g. an LSH distinct) can carry
    # hundreds of shuffle partitions. Coalesce the cached tables to the
    # cluster's core count so each propagation round schedules O(cores)
    # tasks, not O(upstream partitions) — coalesce never shuffles and
    # never increases the count. (Spark Connect exposes no
    # sparkContext — skip the trim there, same graceful degradation as
    # functions/partitioning.py:fan_out.)
    edges = pairs.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).union(
        pairs.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))
    )
    try:
        edges = edges.coalesce(
            max(1, pairs.sparkSession.sparkContext.defaultParallelism)
        )
    except Exception:  # Spark Connect: no sparkContext
        pass
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        edges.select(F.col("_s").alias("_id"))
        .distinct()
        .select("_id", F.col("_id").alias("_lbl"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # `cached` tracks the PERSISTED frame backing `labels`: unpersist()
    # must be called on the exact frame that was persisted — calling it
    # on a derived projection (e.g. after .drop) is a silent no-op and
    # leaks one cached table per round.
    cached = labels
    try:
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels, edges["_s"] == labels["_id"])
                .groupBy("_d")
                .agg(F.min("_lbl").alias("_nbr"))
            )
            new_labels = (
                labels.join(nbr_min, labels["_id"] == nbr_min["_d"], "left")
                .select(
                    "_id",
                    F.least("_lbl", F.coalesce("_nbr", "_lbl")).alias("_lbl"),
                    (F.col("_nbr") < F.col("_lbl")).alias("_chg"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            # Full-scan aggregate, not limit(1): the convergence job must
            # touch EVERY partition so the round's label table is fully
            # cached — a short-circuit count would leave holes that next
            # round recomputes through already-unpersisted lineage.
            changed = new_labels.agg(
                F.coalesce(F.sum(F.col("_chg").cast("int")), F.lit(0))
            ).collect()[0][0]
            cached.unpersist()
            cached = new_labels
            labels = new_labels.drop("_chg")
            if changed == 0:
                # localCheckpoint (eager) materializes the result and
                # TRUNCATES lineage, so every intermediate — including
                # the final persisted label table — can be released
                # here instead of leaking one cached table per call;
                # the checkpoint itself is reclaimed by the
                # ContextCleaner once the returned frame is unreferenced.
                result = labels.select(
                    F.col("_id").alias(id_out), F.col("_lbl").alias(component_out)
                ).localCheckpoint(eager=True)
                return result
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()
        cached.unpersist()
