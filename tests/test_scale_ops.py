"""Scale-operator quality tests: LSH candidate recall vs exact Jaccard,
IVF/LSH ANN recall vs brute force, HLL error bound, MLlib-vs-handrolled
dedup agreement (SURVEY.md §5.2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_categorization_big_data_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").where(F.col("text") != "")


def test_lsh_candidates_cover_true_near_dups(spark, sf_dir):
    """Every exact-Jaccard≥0.8 pair must appear among the banded-LSH
    candidates (at j≈0.98 the per-band collision probability is ≈1)."""
    docs = _docs(spark, sf_dir)
    truth = {(r.doc_a, r.doc_b) for r in jaccard_pairs(docs, 0.8).collect()}
    cands = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()}
    assert truth, "testdata should contain planted near-duplicates"
    assert truth <= cands, f"LSH missed true pairs: {truth - cands}"
    # and LSH should not degenerate to all-pairs
    n = docs.count()
    assert len(cands) < n * (n - 1) / 4


def test_mllib_lsh_agrees_on_planted_dups(spark, sf_dir):
    truth = {(r.doc_a, r.doc_b) for r in jaccard_pairs(_docs(spark, sf_dir), 0.8).collect()}
    mllib = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q_dedup_mllib_lsh"].builder(spark, sf_dir).collect()
    }
    assert truth <= mllib


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = [r.vec_id for r in REGISTRY["q_sim_search"].builder(spark, sf_dir).collect()]
    ivf = [r.vec_id for r in REGISTRY["q_sim_ann_ivf"].builder(spark, sf_dir).collect()]
    # the IVF cell holds a fraction of the corpus; require ≥2/5 of its
    # answers to be true top-10 neighbors (recall at reduced scan cost)
    overlap = len(set(ivf) & set(brute))
    assert overlap >= 2, f"IVF recall collapsed: {overlap}/5 in true top-10"


def test_hll_error_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r.event_type: r.approx_users
        for r in REGISTRY["q_group_approx"].builder(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.exact
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact")).collect()
    }
    for key, exact_n in exact.items():
        rel_err = abs(approx[key] - exact_n) / max(exact_n, 1)
        assert rel_err < 0.05, f"{key}: HLL rel err {rel_err:.3f}"
