"""Invariant tests for the round-5c batch (RRF fusion, channel
attribution, table checksum, k-anonymity) — properties the oracle hash
can't express: fusion-score reconstruction, purchase conservation, and
the checksum's edit/duplication sensitivity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.plans.quality import KANON_K, cksum_agg
from news_categorization_big_data_spark.plans.retrieval import RRF_K, RRF_TOP
from news_categorization_big_data_spark.sources.tables import load_table


def test_rrf_score_reconstructs_from_ranks(spark, sf_dir):
    rows = REGISTRY["q_rrf_fusion"].builder(spark, sf_dir).collect()
    assert 0 < len(rows) <= RRF_TOP
    for r in rows:
        expect = 1.0 / (RRF_K + float(r["rank_a"])) + 1.0 / (
            RRF_K + float(r["rank_b"])
        )
        assert r["rrf"] == expect, r
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_attrib_conserves_purchases_and_value(spark, sf_dir):
    rows = REGISTRY["q_attrib_channel"].builder(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    agg = ev.agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("v"),
    ).collect()[0]
    assert sum(r["n_purchases"] for r in rows) == agg["n"]
    assert math.isclose(
        sum(r["attributed_value"] for r in rows), agg["v"], rel_tol=1e-12
    )
    allowed = {"view", "click", "signup", "error", "none", "stale"}
    assert {r["channel"] for r in rows} <= allowed


def test_checksum_detects_edit_and_duplication(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    base = cksum_agg(cust).collect()[0]

    # single-field edit → xor fingerprint changes
    edited = cust.withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") == 1, F.col("c_acctbal") + 0.01).otherwise(
            F.col("c_acctbal")
        ),
    )
    e = cksum_agg(edited).collect()[0]
    assert e["n_rows"] == base["n_rows"]
    assert e["xor_fp"] != base["xor_fp"]

    # duplicating a row is INVISIBLE to xor (pairs cancel) but caught
    # by the sum fold — the reason the fingerprint carries both
    dup = cust.unionAll(cust.where(F.col("c_custkey") == 1))
    d = cksum_agg(dup).collect()[0]
    assert d["n_rows"] == base["n_rows"] + 1
    assert d["xor_fp"] != base["xor_fp"]  # odd count flips parity once
    dup2 = cust.unionAll(cust.where(F.col("c_custkey") == 1)).unionAll(
        cust.where(F.col("c_custkey") == 1)
    )
    d2 = cksum_agg(dup2).collect()[0]
    assert d2["xor_fp"] == base["xor_fp"]  # xor blind to the pair...
    assert d2["sum_fp"] != base["sum_fp"]  # ...the sum fold is not


def test_k_anonymity_consistent_with_brute_force(spark, sf_dir):
    row = REGISTRY["q_k_anonymity"].builder(spark, sf_dir).collect()[0]
    groups = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .count()
        .collect()
    )
    ks = [g["count"] for g in groups]
    assert row["n_groups"] == len(ks)
    assert row["min_k"] == min(ks)
    assert row["n_rows_at_risk"] == sum(k for k in ks if k < KANON_K)
    assert math.isclose(
        row["risk_share"], sum(k for k in ks if k < KANON_K) / sum(ks),
        rel_tol=1e-12,
    )


def test_rfm_conserves_customers_and_value(spark, sf_dir):
    rows = REGISTRY["q_rfm_segments"].builder(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_band"] <= 5
        assert 1 <= r["f_band"] <= 5
        assert 1 <= r["m_band"] <= 5
    total = (
        orders.agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("t")
        ).collect()[0]["t"]
    )
    assert math.isclose(
        sum(r["segment_value"] for r in rows), total, rel_tol=1e-9
    )


def test_peak_concurrency_matches_brute_force(spark, sf_dir):
    got = REGISTRY["q_peak_concurrency"].builder(spark, sf_dir).collect()[0]
    sessions = [
        (r["session_start"], r["session_end"])
        for r in REGISTRY["q_sessionize"].builder(spark, sf_dir).collect()
    ]
    # brute force: concurrency at every session-start instant
    peak = max(
        sum(1 for s2, e2 in sessions if s2 <= s <= e2) for s, _ in sessions
    )
    assert got["peak"] == peak
    assert got["n_at_peak"] >= 1


def test_ann_recall_report_bounds(spark, sf_dir):
    from news_categorization_big_data_spark.plans.similarity import (
        RECALL_K,
        RECALL_QUERIES,
    )

    rows = REGISTRY["q_ann_recall"].builder(spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert {r["query_id"] for r in rows} == set(RECALL_QUERIES)
    for r in rows:
        assert 0 <= r["n_hit"] <= RECALL_K
        assert r["recall"] == r["n_hit"] / RECALL_K
        # the IVF scan must touch strictly less than the corpus — the
        # whole point of the report's cost column
        assert 0 < r["n_candidates"] < n_emb


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_curation_funnel"].builder(spark, sf_dir).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows] == [
        "raw", "quality", "exact_dedup", "near_dedup",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # each stage only removes
    for prev, r in zip(rows, rows[1:]):
        assert r["n_removed"] == prev["n_docs"] - r["n_docs"]
    assert rows[0]["kept_frac"] == 1.0
    # the funnel's terminal count must equal the pipeline's own corpus
    pipeline = REGISTRY["q_pipeline_curate"].builder(spark, sf_dir).collect()
    assert rows[-1]["n_docs"] == sum(r["n_docs"] for r in pipeline)


def test_rolling_corr_bounds_and_frames(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_rolling_corr"].builder(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    from news_categorization_big_data_spark.plans.warehouse import ROLLCORR_DAYS

    for i, r in enumerate(rows):
        assert r["n_days"] == min(i + 1, ROLLCORR_DAYS)
        if r["roll_corr"] is not None:
            assert abs(r["roll_corr"]) <= 1.0 + 1e-9


def test_anova_matches_brute_force(spark, sf_dir):
    row = REGISTRY["q_anova_f"].builder(spark, sf_dir).collect()[0]
    data = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in data:
        groups.setdefault(r["event_type"], []).append(r["value"])
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["df_between"] == k - 1
    assert row["df_within"] == n - k
    assert math.isclose(row["f_stat"], f, rel_tol=1e-6)
    assert row["f_stat"] >= 0


def test_gini_matches_brute_force(spark, sf_dir):
    row = REGISTRY["q_gini_spend"].builder(spark, sf_dir).collect()[0]
    spends = sorted(
        r["cents"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
        )
        .collect()
    )
    n = len(spends)
    t = sum(spends)
    rs = sum((i + 1) * x for i, x in enumerate(spends))
    want = (2 * rs - (n + 1) * t) / (n * t)
    assert row["n_customers"] == n
    assert math.isclose(row["gini"], want, rel_tol=1e-9)
    assert 0.0 <= row["gini"] < 1.0


def test_calibration_ece_partitions_population(spark, sf_dir):
    rows = REGISTRY["q_calibration_ece"].builder(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["avg_conf"] <= 1.0 + 1e-12
        assert 0.0 <= r["obs_rate"] <= 1.0
    ece = sum(r["w_abs_gap"] for r in rows)
    assert 0.0 <= ece <= 1.0


def test_seq_cooccur_matches_brute_force(spark, sf_dir):
    rows = REGISTRY["q_seq_cooccur"].builder(spark, sf_dir).collect()
    data = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    per_user: dict[int, dict[str, list]] = {}
    for r in data:
        per_user.setdefault(r["user_id"], {}).setdefault(
            r["event_type"], []
        ).append(r["ts"])
    want: dict[tuple[str, str], int] = {}
    for types in per_user.values():
        for a, ats in types.items():
            for b, bts in types.items():
                if a != b and min(ats) < max(bts):
                    want[(a, b)] = want.get((a, b), 0) + 1
    got = {(r["type_a"], r["type_b"]): r["n_support"] for r in rows}
    assert got == want
    n_users = len(per_user)
    for r in rows:
        assert r["support"] == r["n_support"] / n_users
