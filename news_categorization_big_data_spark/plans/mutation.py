"""Mutation-shaped batch operators: MERGE / upsert semantics expressed
as pure DataFrame plans.

The reference's store is MongoDB and its writes are point upserts
(main.py's insert path; SURVEY §2.1 "Point insert"). A warehouse engine
expresses the same intent as a set-based MERGE: target ⟕⟖ source on the
key, matched rows update, unmatched source rows insert, unmatched target
rows carry forward. Spark has no built-in MERGE INTO against raw parquet
(that is the table format's job — Delta/Iceberg/Hudi layer it on this
exact join), so the engine provides the canonical full-outer formulation
— which is also precisely what those formats execute underneath, minus
their file-level pruning.

At 100 TB: a MERGE is one co-partitioned full-outer shuffle on the key.
The scale levers are (a) bucketing both sides on the merge key so the
shuffle disappears (q_join_bucketed demonstrates the layout), and
(b) a table format that prunes untouched files — noted, not simulated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.exact import (
    dec_to_double,
    o_dec_to_double,
)
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.plans.relational import (
    o_fin,
    o_poisoned,
    poisoned_flag,
)
from news_categorization_big_data_spark.sources.tables import load_table

#: Merged per-user value (decimal add of the two snapshots' sums,
#: hoisted for o_dec_to_double).
_O_MERGED_V = (
    "COALESCE(t.v, CAST(0 AS DECIMAL(18,2)))"
    " + COALESCE(s.v, CAST(0 AS DECIMAL(18,2)))"
)

#: Events before the cutoff form the target snapshot; events at or
#: after it form the source batch being merged in.
MERGE_CUTOFF = "2024-01-16 00:00:00"


def _profile(events: DataFrame) -> DataFrame:
    """Per-user profile: the merge unit on both sides. The poison flag
    is mergeable state like the sums (bool OR across snapshots)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        poisoned_flag("value").alias("p"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "q_merge_upsert",
    oracle=f"""
    WITH t AS (
      SELECT user_id, COUNT(*) AS n, {o_poisoned('value')} AS p,
             SUM(CAST({o_fin('value')} AS DECIMAL(18,2))) AS v, MAX(ts) AS last_ts
      FROM events WHERE ts < TIMESTAMP '{MERGE_CUTOFF}' GROUP BY user_id
    ), s AS (
      SELECT user_id, COUNT(*) AS n, {o_poisoned('value')} AS p,
             SUM(CAST({o_fin('value')} AS DECIMAL(18,2))) AS v, MAX(ts) AS last_ts
      FROM events WHERE ts >= TIMESTAMP '{MERGE_CUTOFF}' GROUP BY user_id
    )
    SELECT COALESCE(t.user_id, s.user_id) AS user_id,
           CASE WHEN t.user_id IS NULL THEN 'insert'
                WHEN s.user_id IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action,
           CAST(COALESCE(t.n, 0) + COALESCE(s.n, 0) AS BIGINT) AS n_events,
           -- poison -> NULL merged total when EITHER snapshot of the
           -- user saw a non-finite value (/tmp/skew7)
           CASE WHEN NOT COALESCE(t.p, FALSE) AND NOT COALESCE(s.p, FALSE)
                THEN {o_dec_to_double(_O_MERGED_V, 2)} END AS total_value,
           GREATEST(COALESCE(t.last_ts, s.last_ts),
                    COALESCE(s.last_ts, t.last_ts)) AS last_ts
    FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
    """,
    tier="B",
    doc="MERGE / upsert as a set-based plan (the engine-native form of "
    "the reference's Mongo point upserts, main.py — and the exact join "
    "Delta/Iceberg run under MERGE INTO): target snapshot (events "
    "before the cutoff, aggregated per user) full-outer-joined to the "
    "source batch (events after it) on the merge key. Matched keys "
    "update (sums combine, latest timestamp wins), source-only keys "
    "insert, target-only keys carry forward — the action is emitted as "
    "an auditable column. Money combines in DECIMAL (exact); the "
    "full-outer is a single co-partitioned shuffle on user_id, and "
    "bucketing both sides on the key (q_join_bucketed's layout) would "
    "eliminate even that.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(MERGE_CUTOFF).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    target = _profile(ev.where(F.col("ts") < cutoff)).select(
        F.col("user_id").alias("t_user"),
        F.col("n").alias("t_n"),
        F.col("p").alias("t_p"),
        F.col("v").alias("t_v"),
        F.col("last_ts").alias("t_last"),
    )
    source = _profile(ev.where(F.col("ts") >= cutoff)).select(
        F.col("user_id").alias("s_user"),
        F.col("n").alias("s_n"),
        F.col("p").alias("s_p"),
        F.col("v").alias("s_v"),
        F.col("last_ts").alias("s_last"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    merged = target.join(source, F.col("t_user") == F.col("s_user"), "full_outer")
    return merged.select(
        F.coalesce("t_user", "s_user").alias("user_id"),
        F.when(F.col("t_user").isNull(), "insert")
        .when(F.col("s_user").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
        (F.coalesce("t_n", F.lit(0)) + F.coalesce("s_n", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        F.when(
            ~F.coalesce("t_p", F.lit(False)) & ~F.coalesce("s_p", F.lit(False)),
            dec_to_double(F.coalesce("t_v", zero) + F.coalesce("s_v", zero), 2),
        ).alias("total_value"),
        F.greatest(
            F.coalesce("t_last", "s_last"), F.coalesce("s_last", "t_last")
        ).alias("last_ts"),
    )
