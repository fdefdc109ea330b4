"""Event-time windowing: batch analogs of the streaming operator surface
(SURVEY.md §2.9) plus the as-of join.

Spark's `window()` / `session_window()` work identically over batch and
streaming DataFrames, so the oracle-checked batch queries here pin the
exact semantics the live streaming topology (streaming/topology.py)
reuses; the live variants are smoke-tested in tests/test_streaming.py
with file/rate sources and processAllAvailable().

The reference has NO event-time processing at all (its stream is a 1s
processing-time micro-batch with no windows or watermarks —
news_categorization_streaming.py:114-120); this module is the engine
surface that makes its topology scale-correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.operators.asof import asof_join
from news_categorization_big_data_spark.functions.exact import (
    dec_to_double,
    o_dec_to_double,
)
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.plans.relational import nonfinite
from news_categorization_big_data_spark.sources.tables import load_table


@register(
    "q_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type, COUNT(*) AS cnt
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
    tier="B",
    doc="Tumbling 10-minute window count — groupBy(window(ts, '10 minutes')). "
    "NULL event times are unassignable to a window: Spark's window()/session_window DROPS them (the TimeWindowing rule injects isnotnull) and the oracle filters explicitly (skew10 axis). "
    "Epoch-aligned on both engines. In streaming this is the canonical "
    "watermarked aggregation; partial aggregation happens map-side per "
    "micro-batch.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


@register(
    "q_stream_sliding",
    oracle="""
    WITH starts AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type
      FROM events WHERE ts IS NOT NULL
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type
      FROM events WHERE ts IS NOT NULL
    )
    SELECT window_start, event_type, COUNT(*) AS cnt FROM starts GROUP BY 1, 2
    """,
    tier="B",
    doc="Sliding window (10-minute width, 5-minute slide): every event lands "
    "NULL event times are unassignable to a window: Spark's window()/session_window DROPS them (the TimeWindowing rule injects isnotnull) and the oracle filters explicitly (skew10 axis). "
    "in exactly width/slide = 2 windows; the oracle materializes both "
    "epoch-aligned starts explicitly.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


@register(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      -- (ts, event_id) — the SAME total order as the lag window. A
      -- ROWS frame ordered by ts alone is tie-nondeterministic: with
      -- duplicate timestamps (the sf1 replica corpus has 10 rows per
      -- ts) the running sum may cross a new_sess=1 row in different
      -- positions run to run, shifting boundary rows between adjacent
      -- sessions — observed as DuckDB itself returning 99233 vs 99235
      -- rows on identical sf1 data (round-14 find).
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    tier="B",
    doc="Session window (5-minute gap) per user — session_window(ts, '5 "
    "NULL event times are unassignable to a window: Spark's window()/session_window DROPS them (the TimeWindowing rule injects isnotnull) and the oracle filters explicitly (skew10 axis). "
    "minutes'). Spark sessions are [first_ts, last_ts + gap): an event at "
    "exactly prev_ts + gap starts a NEW session (end-exclusive), which the "
    "gaps-and-islands oracle mirrors with `ts >= lag(ts) + gap`.",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .select("user_id", "session_start", "n_events")
    )


@register(
    "q_stream_watermark",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, COUNT(*) AS cnt
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL '24 hours' FROM events)
    GROUP BY 1
    """,
    tier="B",
    doc="Watermark batch analog: rows older than max(event_time) - delay are "
    "dropped, then windowed-counted — exactly what "
    "withWatermark('ts', '24 hours') admits in streaming. The max is a "
    "broadcast scalar, not a driver collect.",
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("_max_ts"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .where(F.col("ts") >= F.col("_max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


@register(
    "q_stream_dedup",
    oracle="""
    SELECT window_start, COUNT(*) AS uniq_cnt FROM (
      SELECT DISTINCT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             user_id, event_type
      FROM events WHERE ts IS NOT NULL)
    GROUP BY window_start
    """,
    tier="B",
    doc="Stream dedup analog — dropDuplicates on (window, user, type) ≙ "
    "NULL event times are unassignable to a window: Spark's window()/session_window DROPS them (the TimeWindowing rule injects isnotnull) and the oracle filters explicitly (skew10 axis). "
    "dropDuplicatesWithinWatermark keyed per hour. State is bounded by the "
    "watermark horizon in the live variant.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.window("ts", "1 hour").alias("w"), "user_id", "event_type"
        )
        .select(F.col("w.start").alias("window_start"), "user_id", "event_type")
        .dropDuplicates(["window_start", "user_id", "event_type"])
        .groupBy("window_start")
        .agg(F.count("*").alias("uniq_cnt"))
    )


@register(
    "q_asof_join",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 1 AS side, event_id,
             NULL::BIGINT AS p_id, NULL::DOUBLE AS p_val
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, 0 AS side, NULL, event_id, value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, side, event_id,
             last_value(CASE WHEN side = 0 AND ts IS NOT NULL
                             THEN struct_pack(pid := p_id, pval := p_val)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, side, CASE WHEN side = 0 THEN p_id END NULLS LAST
                     ROWS UNBOUNDED PRECEDING) AS carried
      FROM u)
    SELECT event_id, user_id, ts,
           CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
                THEN (carried).pid END AS purchase_event_id,
           CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
                THEN (carried).pval END AS purchase_value
    FROM c WHERE side = 1
    """,
    tier="C",
    doc="As-of join (no Spark built-in): each error event matched to the "
    "latest purchase of the same user at-or-before it; among purchases "
    "TIED on ts, the greatest event_id wins (tie_break — mandatory once "
    "duplicate timestamps exist: the sf1 replica corpus has 10 rows per "
    "ts, and both an un-tie-broken last() and DuckDB's native ASOF JOIN "
    "pick arbitrary tied rows, found as a round-14 sf1 hash mismatch). "
    "Implemented as the union + last(ignorenulls) window pattern in "
    "operators/asof.py — one shuffle on the `by` key, no range "
    "cross-join. Oracle: the same union trick in DuckDB SQL with the "
    "identical (ts, side, id) total order — native ASOF can't express "
    "the tie-break.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error")
    purchases = ev.where(F.col("event_type") == "purchase")
    return asof_join(
        left=errors.select("event_id", "user_id", "ts"),
        right=purchases.select(
            "user_id", "ts", F.col("event_id").alias("purchase_event_id"), F.col("value").alias("purchase_value")
        ),
        on="ts",
        by="user_id",
        tie_break="purchase_event_id",
    ).select("event_id", "user_id", "ts", "purchase_event_id", "purchase_value")


@register(
    "q_window_time_range",
    oracle=f"""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS cnt_1h,
           -- poison -> NULL trailing sum for frames touching a
           -- non-finite value (o_fin keeps the decimal cast reachable
           -- only for finite rows; /tmp/skew7)
           CASE WHEN NOT BOOL_OR(NOT isfinite(value)) OVER w THEN
           {o_dec_to_double(
               "SUM(CAST((CASE WHEN isfinite(value) THEN value END)"
               " AS DECIMAL(18,2))) OVER w", 2)}
           END AS val_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tier="B",
    doc="Event-time RANGE frame: per user, the trailing one-hour event "
    "count and value sum at every event — the per-entity moving "
    "aggregate q_window_frame's ROWS frame can't express (a row count "
    "is not a time span). Ordered by epoch-µs longs so the frame "
    "bounds are integer arithmetic; the value sum is decimal-exact. "
    "One shuffle on user_id, one per-partition sort, single window "
    "pass — the batch twin of a sliding stream aggregate, exact "
    "rather than slide-quantized.",
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("cnt_1h"),
        F.when(
            F.max(
                F.coalesce(nonfinite("value"), F.lit(False)).cast("int")
            ).over(w)
            == 0,
            dec_to_double(
                F.sum(F.col("value").cast("decimal(18,2)")).over(w), 2
            ),
        ).alias("val_1h"),
    )


@register(
    "q_asof_forward",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, 1 AS side, event_id,
             NULL::BIGINT AS p_id, NULL::DOUBLE AS p_val
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, 0 AS side, NULL, event_id, value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, side, event_id,
             last_value(CASE WHEN side = 0 AND ts IS NOT NULL
                             THEN struct_pack(pid := p_id, pval := p_val)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts DESC, side,
                              CASE WHEN side = 0 THEN p_id END DESC NULLS LAST
                     ROWS UNBOUNDED PRECEDING) AS carried
      FROM u)
    SELECT event_id, user_id, ts,
           CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
                THEN (carried).pid END AS next_purchase_id,
           CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
                THEN (carried).pval END AS next_purchase_value
    FROM c WHERE side = 1
    """,
    tier="C",
    doc="FORWARD as-of join: each error event matched to the user's "
    "EARLIEST purchase at-or-after it (the 'what happened next' "
    "direction — outcome attribution, next-action labeling); among "
    "purchases tied on ts the SMALLEST event_id wins (tie_break — see "
    "q_asof_join: duplicate timestamps make un-tie-broken as-of "
    "engine-dependent, the round-14 sf1 find). Same union + "
    "last(ignorenulls) single-shuffle plan as q_asof_join with the "
    "per-partition sort reversed (operators/asof.py direction="
    "'forward'); oracle: the mirrored union-window SQL (native ASOF "
    "can't express the tie-break).",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error")
    purchases = ev.where(F.col("event_type") == "purchase")
    return asof_join(
        left=errors.select("event_id", "user_id", "ts"),
        right=purchases.select(
            "user_id",
            "ts",
            F.col("event_id").alias("next_purchase_id"),
            F.col("value").alias("next_purchase_value"),
        ),
        on="ts",
        by="user_id",
        direction="forward",
        tie_break="next_purchase_id",
    ).select("event_id", "user_id", "ts", "next_purchase_id", "next_purchase_value")


#: Tolerance for the bounded as-of variant: 30 minutes.
ASOF_TOLERANCE_S = 1800


@register(
    "q_asof_tolerance",
    oracle=f"""
    WITH u AS (
      SELECT user_id, ts, 1 AS side, event_id,
             NULL::BIGINT AS p_id, NULL::DOUBLE AS p_val
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, 0 AS side, NULL, event_id, value
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, side, event_id,
             last_value(CASE WHEN side = 0 AND ts IS NOT NULL
                             THEN struct_pack(pid := p_id, pval := p_val,
                                              pts := ts)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, side, CASE WHEN side = 0 THEN p_id END NULLS LAST
                     ROWS UNBOUNDED PRECEDING) AS carried
      FROM u),
    m AS (
      SELECT event_id, user_id, ts,
             CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
                  THEN carried END AS carried
      FROM c WHERE side = 1)
    SELECT event_id, user_id, ts,
           CASE WHEN epoch_us(ts) - epoch_us((carried).pts)
                     <= {ASOF_TOLERANCE_S} * 1000000
                THEN (carried).pid END AS purchase_event_id,
           CASE WHEN epoch_us(ts) - epoch_us((carried).pts)
                     <= {ASOF_TOLERANCE_S} * 1000000
                THEN (carried).pval END AS purchase_value
    FROM m
    """,
    tier="C",
    doc=f"As-of join with a staleness bound (pandas merge_asof "
    f"tolerance): the latest at-or-before purchase counts only within "
    f"{ASOF_TOLERANCE_S}s; older nearest-matches become NULL — "
    "nullifying the nearest candidate IS the no-match-within-tolerance "
    "semantics, because any other candidate is further away. Among "
    "equal-ts purchases the greatest event_id wins (tie_break, the "
    "round-14 sf1 duplicate-timestamp find — note the tie does NOT "
    "change the gap, so the tolerance verdict is tie-invariant; the "
    "MATCHED ID is what needed pinning). The operator carries the "
    "matched row's own timestamp inside the atomic struct for the "
    "integer-µs gap check; the oracle is the mirrored union-window "
    "SQL applying the identical CASE.",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error")
    purchases = ev.where(F.col("event_type") == "purchase")
    return asof_join(
        left=errors.select("event_id", "user_id", "ts"),
        right=purchases.select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        ),
        on="ts",
        by="user_id",
        tolerance_seconds=ASOF_TOLERANCE_S,
        tie_break="purchase_event_id",
    ).select("event_id", "user_id", "ts", "purchase_event_id", "purchase_value")


#: Rate-anomaly flag: day error-share must exceed the trailing-week
#: share by this integer factor, with minimum daily support.
RATE_SPIKE_FACTOR = 2
RATE_MIN_EVENTS = 20


@register(
    "q_rate_anomaly",
    oracle=f"""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      COUNT(*) AS n,
                      CAST(count_if(event_type = 'error') AS BIGINT) AS n_err
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    w AS (SELECT day, n, n_err,
                 CAST(SUM(n) OVER t AS BIGINT) AS n_prev,
                 CAST(SUM(n_err) OVER t AS BIGINT) AS err_prev
          FROM d
          WINDOW t AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT strftime(day, '%Y-%m-%d') AS day, n, n_err, n_prev, err_prev,
           (n >= {RATE_MIN_EVENTS} AND err_prev > 0
            AND n_err * n_prev > {RATE_SPIKE_FACTOR} * err_prev * n)
             AS is_spike
    FROM w
    """,
    tier="B",
    doc="Error-rate spike detection: each day's error share compared to "
    "its trailing 7-day share, flagged when it exceeds "
    f"{RATE_SPIKE_FACTOR}× with ≥ {RATE_MIN_EVENTS} events of support "
    "— the drift/incident monitor a pipeline runs over every quality "
    "metric it tracks. The comparison is pure INTEGER cross-"
    "multiplication (n_err·n_prev > k·err_prev·n — no rate division, "
    "no float boundary can flip a flag; products stay far under 2^53 "
    "because both sides are day-level counts). Plan: one day-grain "
    "aggregate shuffle, then the trailing window runs over |days| "
    "rows — dimension-sized at any corpus scale. The day renders as "
    "an ISO string (DATE output columns are driver-canon-hostile).",
)
def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # the trailing-7-day baseline is a day SERIES: a NULL event time is
    # not a day and cannot sit in the series (skew10 policy)
    ev = ev.where(F.col("ts").isNotNull())
    d = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.count_if(F.col("event_type") == "error").cast("long").alias("n_err"),
    )
    t = Window.orderBy("day").rowsBetween(-7, -1)
    w = d.select(
        "day",
        "n",
        "n_err",
        F.sum("n").over(t).cast("long").alias("n_prev"),
        F.sum("n_err").over(t).cast("long").alias("err_prev"),
    )
    is_spike = (
        (F.col("n") >= RATE_MIN_EVENTS)
        & (F.col("err_prev") > 0)
        & (
            F.col("n_err") * F.col("n_prev")
            > F.lit(RATE_SPIKE_FACTOR) * F.col("err_prev") * F.col("n")
        )
    )
    return w.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        "n_err",
        "n_prev",
        "err_prev",
        is_spike.alias("is_spike"),
    )


@register(
    "q_seasonality",
    oracle="""
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hr,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
    tier="B",
    doc="Seasonality profile: the (day-of-week × hour-of-day) activity "
    "heat map — the load-shaping / staleness-tolerance input every "
    "time-partitioned store sizes its compaction and retention "
    "schedules from. Single partial-aggregating shuffle onto a "
    "≤ 7×24-row grid; Spark's dayofweek is Sunday=1 while DuckDB's is "
    "Sunday=0 (the oracle adds 1), hour is session-UTC on both. At "
    "100 TB the grid is the same 168 rows — the reduction is entirely "
    "map-side.",
)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "q_stream_trending",
    oracle="""
    WITH wc AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    rk AS (
      SELECT window_start, event_type, cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY window_start
                                     ORDER BY cnt DESC, event_type) AS INT) AS rnk
      FROM wc)
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, cnt, rnk
    FROM rk WHERE rnk <= 3
    """,
    tier="B",
    doc="Trending items: top-3 event types per tumbling hour — the "
    "NULL event times are unassignable to a window: Spark's window()/session_window DROPS them (the TimeWindowing rule injects isnotnull) and the oracle filters explicitly (skew10 axis). "
    "windowed-leaderboard streaming analytic ('what spiked this "
    "hour'). Batch analog of the live pattern (windowed count -> "
    "rank), with a total tiebreak (cnt DESC, type) so rank order can "
    "never differ between engines. Streaming form: the windowed count "
    "is the watermarked stateful stage; the top-k rank runs per "
    "CLOSED window downstream (foreachBatch or a second job over the "
    "window-complete sink) since rank-over-updating-state is not "
    "monotone. Scale: count state is windows x types (tiny, "
    "mergeable); the rank window rides the COUNT table, never raw "
    "events.",
)
def q_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wc = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "cnt",
        )
    )
    rk = Window.partitionBy("window_start").orderBy(
        F.col("cnt").desc(), "event_type"
    )
    return (
        wc.select(
            "window_start",
            "event_type",
            "cnt",
            F.row_number().over(rk).cast("int").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )
