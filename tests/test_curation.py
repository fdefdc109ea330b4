"""Unit tests for the corpus-hygiene operators: eval-set
decontamination, repetition stats, and near-dup cluster canonicalization
(connected components)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_categorization_big_data_spark.operators.curation import (
    ngram_contamination,
    repetition_stats,
)
from news_categorization_big_data_spark.operators.graph import connected_components


def test_contamination_flags_overlapping_train_doc(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about gardening tips here"),
        ],
        ["doc_id", "text"],
    )
    holdout = spark.createDataFrame(
        [(9, "we observed the quick brown fox in the wild")],
        ["doc_id", "text"],
    )
    hits = {r["doc_id"]: r["n_overlap"] for r in ngram_contamination(train, holdout).collect()}
    # doc 1 shares exactly one 3-gram with the holdout: "the quick brown"
    # and "quick brown fox" -> two overlapping shingles; doc 2 shares none.
    assert hits == {1: 2}


def test_contamination_uses_broadcast_join(spark, sf_dir):
    from news_categorization_big_data_spark.plans import REGISTRY

    plan = (
        REGISTRY["q_decontaminate"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_ratio_separates_prose_from_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "click here click here click here click here"),
            (2, "each word appears exactly once in this sentence"),
            (3, "x"),  # single word: no bigrams -> excluded
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2}
    # 7 bigrams, only 2 distinct ("click here", "here click").
    assert rows[1]["n_grams"] == 7 and rows[1]["n_distinct"] == 2
    assert rows[1]["dup_ratio"] == pytest.approx(round(5 / 7, 4))
    assert rows[2]["dup_ratio"] == 0.0


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 8)], ["doc_a", "doc_b"]
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}


def test_connected_components_matches_union_find(spark):
    """Property check against a driver-side union-find on a pseudo-random
    pair set (deterministic: edges derived from arithmetic, no RNG)."""
    edges = [((i * 7) % 23, (i * 11) % 23 + 30) for i in range(18)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in parent}

    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_connected_components_raises_when_budget_too_small(spark):
    # A 5-vertex path needs more than one propagation round.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=1)
