"""Invariant tests for the feature-engineering & evaluation tier
(plans/features.py) — properties the oracle hash can't express: budget
conservation, band partitioning, BFS frontier soundness, and the
salted-rewrite equivalence."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.plans.features import (
    ALLOC_BUDGET,
    BENFORD_EXPECTED,
    BFS_HOPS,
    BFS_SEEDS,
    LIFT_BANDS,
    TE_FOLDS,
)
from news_categorization_big_data_spark.sources.tables import load_table


def test_alloc_budget_conserved(spark, sf_dir):
    rows = REGISTRY["q_alloc_budget"].builder(spark, sf_dir).collect()
    # exact conservation — the property naive round(B*share) violates
    assert sum(r["alloc"] for r in rows) == ALLOC_BUDGET
    # every stratum gets floor-or-floor+1 of its exact quota
    n_g = sum(r["n_customers"] for r in rows)
    for r in rows:
        base = (ALLOC_BUDGET * r["n_customers"]) // n_g
        assert r["alloc"] in (base, base + 1)


def test_lift_bands_partition_population(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_lift_bands"].builder(spark, sf_dir).collect(),
        key=lambda r: r["band"],
    )
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    assert all(1 <= r["band"] <= LIFT_BANDS for r in rows)
    # capture is cumulative and ends at exactly 1.0 (P/P)
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)
    assert math.isclose(caps[-1], 1.0, rel_tol=0, abs_tol=1e-12)


def test_target_encode_probabilities_and_folds(spark, sf_dir):
    rows = REGISTRY["q_target_encode"].builder(spark, sf_dir).collect()
    assert all(0.0 < r["te"] < 1.0 for r in rows)
    by_cat: dict[str, set[int]] = {}
    for r in rows:
        by_cat.setdefault(r["category"], set()).add(r["fold"])
    # every category sees every fold at this data size
    assert all(folds == set(range(TE_FOLDS)) for folds in by_cat.values())


def test_corr_matrix_bounds(spark, sf_dir):
    rows = REGISTRY["q_corr_matrix"].builder(spark, sf_dir).collect()
    assert len(rows) == 6  # C(4,2) upper triangle
    assert all(abs(r["corr"]) <= 1.0 + 1e-12 for r in rows)


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["q_benford_digits"].builder(spark, sf_dir).collect()
    assert all(1 <= r["digit"] <= 9 for r in rows)
    assert math.isclose(
        sum(r["obs_share"] for r in rows), 1.0, rel_tol=0, abs_tol=1e-9
    )
    # the host-side expectation itself is a proper distribution
    assert math.isclose(sum(BENFORD_EXPECTED), 1.0, rel_tol=0, abs_tol=1e-12)


def test_graph_bfs_frontier_sound(spark, sf_dir):
    from news_categorization_big_data_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    dist = REGISTRY["q_graph_bfs"].builder(spark, sf_dir)
    rows = dist.collect()
    assert all(0 <= r["hops"] <= BFS_HOPS for r in rows)
    assert sum(1 for r in rows if r["hops"] == 0) == min(BFS_SEEDS, len(rows))

    # every hop-h vertex (h>0) must have a neighbor at hop h-1 — the
    # BFS frontier property brute-checkable at smoke scale
    docs = load_table(spark, sf_dir, "documents").where(F.col("text") != "")
    pairs = lsh_candidate_pairs(minhash_signatures(docs)).select("doc_a", "doc_b")
    adj: dict[int, set[int]] = {}
    for p in pairs.collect():
        adj.setdefault(p["doc_a"], set()).add(p["doc_b"])
        adj.setdefault(p["doc_b"], set()).add(p["doc_a"])
    hop = {r["doc_id"]: r["hops"] for r in rows}
    for v, h in hop.items():
        if h > 0:
            assert any(hop.get(u) == h - 1 for u in adj[v]), (v, h)


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    salted = {
        r["event_type"]: (r["n_events"], r["total_value"])
        for r in REGISTRY["q_salted_agg"].builder(spark, sf_dir).collect()
    }
    plain = {
        r["event_type"]: (r["n"], r["tv"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("tv"),
        )
        .collect()
    }
    # bit-exact equality — the decimal partials make the rewrite lossless
    assert salted == plain


def test_tfidf_pairs_shape(spark, sf_dir):
    rows = REGISTRY["q_tfidf_pairs"].builder(spark, sf_dir).collect()
    assert rows, "expected at least one similar pair at smoke scale"
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
    assert all(r["cos"] <= 1.0 + 1e-9 for r in rows)
    cosines = [r["cos"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
