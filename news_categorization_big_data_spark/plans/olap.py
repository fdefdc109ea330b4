"""OLAP surface extensions: deterministic grouped mode, full-frame
window navigation (first/last/nth), skyline (Pareto frontier), and
time-bucket OHLC resampling.

These round out the §2.4/§2.5 aggregation and window families
(relational.py) with shapes a warehouse workload asks for but no single
Spark builtin covers one-to-one — each is a composition of built-in
operators that stays entirely inside whole-stage codegen (zero UDFs).

Determinism contract: every window ordering carries a unique tie-break
(event_id / p_partkey), modal ties resolve lexicographically, OHLC
open/close pick by an (epoch-µs, event_id) composite key via
min_by/max_by (arg_min/arg_max in DuckDB — both compare the composite
lexicographically), and sums quantize to decimal before reduction.

Reference parity: the reference's only aggregate is a streaming
per-category count (news_categorization_streaming.py:77-81); this tier
is engine-added (SURVEY.md §2.13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.plans.relational import dsum, o_dsum
from news_categorization_big_data_spark.sources.tables import load_table

#: OHLC bucket width. Hourly over the testdata's one-month event span;
#: at 100 TB the bucket is a parameter — the plan shape is unchanged.
OHLC_BUCKET = "hour"


@register(
    "q_group_mode",
    oracle="""
    WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
               FROM events GROUP BY user_id, event_type),
    r AS (SELECT user_id, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rn
          FROM c)
    SELECT user_id, event_type AS mode_event, n AS n_events
    FROM r WHERE rn = 1
    """,
    tier="B",
    doc="Deterministic grouped MODE: each user's most frequent event "
    "type, ties resolved lexicographically (Spark's and DuckDB's "
    "native mode() aggregates are both tie-nondeterministic, so the "
    "engine composes count → ranked window — same answer on every "
    "engine, every run). Plan: one shuffle for the (user, type) count "
    "(partial+final), then the ranked window runs on user-partitioned "
    "data ≤ |event-type domain| rows per user. At 100 TB the count "
    "output is |users|·|types| — the window never sees raw events.",
)
def q_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), F.col("n").alias("n_events"))
    )


@register(
    "q_window_nth",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tier="B",
    doc="Full-frame window navigation — first_value / last_value / "
    "nth_value(2) of each user's value sequence attached to every "
    "event row. The frame is explicitly UNBOUNDED PRECEDING … "
    "UNBOUNDED FOLLOWING (last_value under the default frame is the "
    "running current row — the classic window footgun both engines "
    "share); ordering carries event_id as the unique tie-break. One "
    "shuffle on user_id, one sort, all three navigators evaluated in "
    "a single window pass.",
)
def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "q_skyline",
    oracle="""
    WITH per_price AS (SELECT p_retailprice, MAX(p_size) AS best_size
                       FROM part GROUP BY p_retailprice),
    sky AS (SELECT p_retailprice, best_size,
                   MAX(best_size) OVER (ORDER BY p_retailprice
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS prev_best
            FROM per_price)
    SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
    FROM part p
    JOIN sky s ON p.p_retailprice = s.p_retailprice
              AND p.p_size = s.best_size
    WHERE s.prev_best IS NULL OR s.best_size > s.prev_best
    ORDER BY p.p_retailprice, p.p_partkey
    """,
    tier="B",
    doc="Skyline / Pareto frontier (minimize p_retailprice, maximize "
    "p_size): a part survives iff no other part is ≤ on price and ≥ on "
    "size with one strict. Instead of the O(n²) dominance self-join, "
    "the plan aggregates to one row per distinct price (max size), "
    "runs a running-max window over the price-ordered aggregate, and "
    "keeps prices whose best size strictly exceeds every cheaper "
    "price's best — then joins back (broadcast: the frontier is "
    "dimension-sized) to recover the part rows, preserving equal-"
    "(price,size) co-frontier duplicates. The global-order window runs "
    "on |distinct prices| rows, not |parts| — at 100 TB the "
    "aggregate's output is the only single-partition data, and it is "
    "orders of magnitude smaller than the fact.",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(F.max("p_size").alias("best_size"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    sky = (
        per_price.withColumn("prev_best", F.max("best_size").over(w))
        .where(F.col("prev_best").isNull() | (F.col("best_size") > F.col("prev_best")))
        .select(F.col("p_retailprice").alias("sky_price"), F.col("best_size"))
    )
    return (
        part.join(
            F.broadcast(sky),
            (part.p_retailprice == F.col("sky_price")) & (part.p_size == F.col("best_size")),
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


@register(
    "q_resample_ohlc",
    oracle=f"""
    SELECT event_type, date_trunc('{OHLC_BUCKET}', ts) AS bucket,
           arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS close,
           {o_dsum('value')} AS volume,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type, bucket
    """,
    tier="B",
    doc="Time-bucket OHLC resampling (downsample to hourly bars per "
    "event type): open/close select the value at the bucket's earliest/"
    "latest event via min_by/max_by on an (epoch-µs, event_id) "
    "composite key — a single hash aggregate, no window, no sort of "
    "the raw stream (the naive first_value-over-window plan sorts "
    "every event; this one reduces map-side). The composite key is a "
    "fixed-width zero-padded string (lexicographic = numeric; DuckDB's "
    "arg_min/arg_max don't take list keys), identical in both engines. "
    "Volume sums via per-row decimal quantization "
    "(dsum). At 100 TB: one shuffle keyed (type, bucket), partial "
    "aggregation absorbs the per-bucket fan-in before the exchange.",
)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return ev.groupBy(
        "event_type", F.date_trunc(OHLC_BUCKET, F.col("ts")).alias("bucket")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        dsum("value").alias("volume"),
        F.count("*").alias("n_events"),
    )
