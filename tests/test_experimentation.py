"""Experimentation-suite checks (q_did_effect, q_cuped): internal
consistency, variance-reduction direction, and plan-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_did_identity_and_range(spark, sf_dir):
    r = REGISTRY["q_did_effect"].builder(spark, sf_dir).first()
    assert r["did"] == (r["t_post"] - r["t_pre"]) - (r["c_post"] - r["c_pre"])
    lo, hi = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .agg(F.min("value"), F.max("value"))
        .first()
    )
    for cell in ("t_pre", "t_post", "c_pre", "c_post"):
        assert lo <= r[cell] <= hi, (cell, r[cell])
    # hash arms on a no-effect log: the DiD point estimate is noise
    # around zero, far inside the value range
    assert abs(r["did"]) < (hi - lo)


def test_did_single_pass(spark, sf_dir):
    # one conditional-aggregate pass: the events scan appears once
    plan = _plan(REGISTRY["q_did_effect"].builder(spark, sf_dir))
    assert plan.count("events.parquet") <= 1, plan


def test_cuped_variance_reduction_and_bounds(spark, sf_dir):
    rows = REGISTRY["q_cuped"].builder(spark, sf_dir).collect()
    assert len(rows) == 2 and {r["arm"] for r in rows} == {0, 1}
    for r in rows:
        assert r["n_users"] >= 2
        assert r["var_post"] >= 0 and r["var_adj"] >= 0
        # pooled theta minimizes POOLED adjusted variance; per-arm it
        # can exceed raw variance only by estimation noise
        assert r["var_adj"] <= r["var_post"] * 1.05 + 1e-9, r
        # adjusting by a centered covariate moves the mean by a bounded
        # amount: |mean_adj - mean_post| = |theta| * |arm pre-mean - mu|
        assert abs(r["mean_adj"] - r["mean_post"]) < abs(r["theta"]) * 1e5 + 1e-9


def test_cuped_theta_shared_across_arms(spark, sf_dir):
    rows = REGISTRY["q_cuped"].builder(spark, sf_dir).collect()
    assert rows[0]["theta"] == rows[1]["theta"]  # pooled fit, not per-arm
