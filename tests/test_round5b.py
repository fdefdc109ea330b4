"""Property tests for the late round-5 additions: date-arithmetic clamp
conventions, NULL-semantics invariants, the real WAV decode round-trip,
and the SQL-UDF inlining guarantee. Hash parity runs in
test_oracle_parity.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.plans.quality import NULL_SEMANTICS_CUTOFF
from news_categorization_big_data_spark.plans.text import (
    MM_RATE_BASE,
    MM_RATE_MOD,
    MM_RATE_STEP,
)
from news_categorization_big_data_spark.sources.tables import load_table


# -- q_date_arith -----------------------------------------------------------


def test_date_arith_matches_python_calendar(spark, sf_dir):
    """add_months clamps to month end; last_day/quarter/age agree with
    Python's calendar for a sample of rows."""
    rows = REGISTRY["q_date_arith"].builder(spark, sf_dir).collect()
    src = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    import calendar

    for r in rows[:: max(1, len(rows) // 40)]:
        d = src[r.o_orderkey].date()
        # add_months with end-of-month clamp
        m = d.month - 1 + 3
        y, m = d.year + m // 12, m % 12 + 1
        dim = calendar.monthrange(y, m)[1]
        assert r.due_date == datetime.date(y, m, min(d.day, dim)).isoformat()
        dim_cur = calendar.monthrange(d.year, d.month)[1]
        assert r.month_end == datetime.date(d.year, d.month, dim_cur).isoformat()
        assert r.days_in_month == dim_cur
        q_start_month = (d.month - 1) // 3 * 3 + 1
        assert r.quarter_start == datetime.date(d.year, q_start_month, 1).isoformat()
        assert r.age_days == (datetime.date(2002, 1, 1) - d).days


# -- q_null_semantics -------------------------------------------------------


def test_null_semantics_invariants(spark, sf_dir):
    """Counts must satisfy the null-skip identities, and the ranked-first
    id must belong to the per-type minimum NON-null value (NULLS LAST)."""
    rows = REGISTRY["q_null_semantics"].builder(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    per_type: dict = {}
    for r in ev.collect():
        per_type.setdefault(r.event_type, []).append(r)
    for row in rows:
        recs = per_type[row.event_type]
        nonnull = [r for r in recs if r.value >= NULL_SEMANTICS_CUTOFF]
        assert row.n_rows == len(recs)
        assert row.n_nonnull == len(nonnull)
        assert row.n_null == len(recs) - len(nonnull)
        assert row.n_rows == row.n_nonnull + row.n_null
        assert row.n_distinct == len({r.value for r in nonnull})
        assert row.min_v == min(r.value for r in nonnull)
        assert row.max_v == max(r.value for r in nonnull)
        best = min(nonnull, key=lambda r: (r.value, r.event_id))
        assert row.first_id_nulls_last == best.event_id, row.event_type


# -- q_audio_decode ---------------------------------------------------------


def test_audio_decode_all_ok_and_params_derived(spark, sf_dir):
    rows = REGISTRY["q_audio_decode"].builder(spark, sf_dir).collect()
    assert rows and all(r.ok for r in rows)
    for r in rows[:: max(1, len(rows) // 25)]:
        assert r.sample_rate == MM_RATE_BASE + (r.doc_id % MM_RATE_MOD) * MM_RATE_STEP
        assert r.n_channels == 1 + r.doc_id % 2


# -- q_sql_udf --------------------------------------------------------------


def test_sql_udf_inlines_no_python_node(spark, sf_dir):
    """A SQL UDF must inline into Catalyst: the executed plan may not
    contain any Python evaluation operator, and the aggregate must stay
    a plain two-phase hash aggregate over the scan."""
    df = REGISTRY["q_sql_udf"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas"):
        assert node not in plan, f"SQL UDF failed to inline: found {node}"
    assert "HashAggregate" in plan


# -- q_cms_counts -----------------------------------------------------------


def test_cms_one_sided_bound_and_error_tail(spark, sf_dir):
    """CMS never under-counts (counters only increment), and at this
    width the collision mass must keep most estimates exact."""
    rows = REGISTRY["q_cms_counts"].builder(spark, sf_dir).collect()
    assert rows
    assert all(r.cms_est >= r.exact_n for r in rows), "CMS under-counted"
    n_total = sum(r.exact_n for r in rows)
    # standard CMS guarantee: err ≤ e/width · N per probe with prob
    # 1 - e^-depth; assert the generous version of the bound holds
    # for EVERY key (depth-4 min over 1024 buckets at testdata scale).
    import math

    bound = math.e / 1024 * n_total + 1
    assert all(r.cms_est - r.exact_n <= bound for r in rows)
    exact_share = sum(1 for r in rows if r.cms_est == r.exact_n) / len(rows)
    assert exact_share >= 0.5, f"only {exact_share:.0%} of estimates exact"


# -- q_bitmap_setops --------------------------------------------------------


def test_bitmap_setops_match_python_sets(spark, sf_dir):
    rows = REGISTRY["q_bitmap_setops"].builder(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    users: dict = {}
    for r in ev.collect():
        users.setdefault(r.event_type, set()).add(r.user_id)
    import itertools

    expect_pairs = {
        tuple(sorted(p)) for p in itertools.combinations(users, 2)
    }
    assert {(r.type_a, r.type_b) for r in rows} == expect_pairs
    for r in rows:
        a, b = users[r.type_a], users[r.type_b]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.n_union == len(a | b)
        assert r.n_intersect == len(a & b)
        assert r.n_only_a == len(a - b)


# -- q_ml_auc ---------------------------------------------------------------


def test_auc_matches_sklearn_free_python(spark, sf_dir):
    """The Mann-Whitney form must equal a direct Python AUC (probability
    a random positive outranks a random negative, ties = 1/2)."""
    row = REGISTRY["q_ml_auc"].builder(spark, sf_dir).collect()[0]
    from news_categorization_big_data_spark.plans.ml import AUC_POSITIVE_TYPE

    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    pos = sorted(r.value for r in ev if r.event_type == AUC_POSITIVE_TYPE)
    neg = sorted(r.value for r in ev if r.event_type != AUC_POSITIVE_TYPE)
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    import bisect

    # For each positive: #neg below + 0.5 * #neg tied, via bisect.
    wins = 0.0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo + 0.5 * (hi - lo)
    assert abs(row.auc - wins / (len(pos) * len(neg))) < 1e-12
    assert 0.0 <= row.auc <= 1.0


def test_auc_perfect_and_random_separation(spark):
    """Hand-built sanity: perfectly separated scores give AUC 1.0;
    identical scores give exactly 0.5 (tie handling)."""
    from news_categorization_big_data_spark.plans.ml import AUC_POSITIVE_TYPE

    def run(rows):
        df = spark.createDataFrame(rows, "event_type string, value double")
        df.createOrReplaceTempView("events_auc_test")
        # reuse the registered expression shape inline
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        s = df.select(
            F.col("value").alias("score"),
            F.when(F.col("event_type") == AUC_POSITIVE_TYPE, 1)
            .otherwise(0)
            .alias("label"),
        )
        r = s.select(
            "label",
            F.rank().over(Window.orderBy("score")).alias("r_lo"),
            F.count("*").over(Window.partitionBy("score")).alias("ties"),
        )
        a = r.agg(
            F.sum(
                F.when(
                    F.col("label") == 1,
                    F.lit(2) * F.col("r_lo") + F.col("ties") - F.lit(1),
                )
            )
            .cast("long")
            .alias("s2"),
            F.sum("label").cast("long").alias("np"),
            (F.count("*") - F.sum("label")).cast("long").alias("nn"),
        ).collect()[0]
        return (a.s2 - a.np * (a.np + 1)) / (2 * a.np * a.nn)

    perfect = [("view", 1.0), ("view", 2.0), ("purchase", 3.0), ("purchase", 4.0)]
    assert run(perfect) == 1.0
    all_tied = [("view", 7.0), ("view", 7.0), ("purchase", 7.0), ("purchase", 7.0)]
    assert run(all_tied) == 0.5


# -- q_ml_eval --------------------------------------------------------------


def test_ml_eval_matches_python_confusion(spark, sf_dir):
    from news_categorization_big_data_spark.plans.ml import (
        AUC_POSITIVE_TYPE,
        EVAL_THRESHOLD,
    )

    row = REGISTRY["q_ml_eval"].builder(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    tp = sum(1 for r in ev if r.event_type == AUC_POSITIVE_TYPE and r.value >= EVAL_THRESHOLD)
    fp = sum(1 for r in ev if r.event_type != AUC_POSITIVE_TYPE and r.value >= EVAL_THRESHOLD)
    fn = sum(1 for r in ev if r.event_type == AUC_POSITIVE_TYPE and r.value < EVAL_THRESHOLD)
    tn = len(ev) - tp - fp - fn
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.precision_ == tp / (tp + fp)
    assert row.recall_ == tp / (tp + fn)
    assert row.f1 == 2 * tp / (2 * tp + fp + fn)
