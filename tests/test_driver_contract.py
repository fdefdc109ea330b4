"""The external-driver contract, codified (mirrors the verify recipe's
probes): entry() idempotence, one query across two scale factors in one
session, clean failure on a bad sf_dir, and the registry's structural
invariants (insertion-order window, builder/oracle pairing)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from news_categorization_big_data_spark.plans import REGISTRY


def test_entry_idempotent(spark):
    a = sorted(map(str, entrymod.entry(spark).collect()))
    b = sorted(map(str, entrymod.entry(spark).collect()))
    assert a and a == b


def test_same_query_two_sf_dirs_one_session(spark):
    """Loaders must re-read per sf_dir — no cached path/view leakage."""
    build = REGISTRY["q_scan_parquet"].builder
    n_small = build(spark, "/root/testdata/sf0.001").count()
    n_big = build(spark, "/root/testdata/sf0.01").count()
    assert 0 < n_small < n_big


def test_bad_sf_dir_raises_cleanly(spark):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        REGISTRY["q_scan_parquet"].builder(spark, "/root/testdata/sf-nope").count()


def test_registry_window_contains_round6_priorities():
    """The driver evaluates the first 50 insertion-order entries. The
    round-6 window must hold: every round-5 ROTATION_PENDING query
    (45 names, first official row) plus the five canaries — after
    which EVERY query registered through round 5 has an official
    driver row."""
    window = list(REGISTRY)[:50]
    round5_pending = [
        "q_sql_recursive",
        "q_bloom_join",
        "q_cdc_apply",
        "q_zone_map",
        "q_interval_coverage",
        "q_date_dim",
        "q_simhash_hamming",
        "q_weighted_median",
        "q_rolling_median",
        "q_snapshot_diff",
        "q_sequence_gaps",
        "q_date_arith",
        "q_null_semantics",
        "q_audio_decode",
        "q_sql_udf",
        "q_geo_grid_join",
        "q_ivm_join_agg",
        "q_cms_counts",
        "q_bitmap_setops",
        "q_graph_kcore",
        "q_scan_evolved",
        "q_udtf_table_arg",
        "q_ml_auc",
        "q_ml_eval",
        "q_target_encode",
        "q_lift_bands",
        "q_graph_bfs",
        "q_tfidf_pairs",
        "q_corr_matrix",
        "q_benford_digits",
        "q_alloc_budget",
        "q_salted_agg",
        "q_rrf_fusion",
        "q_attrib_channel",
        "q_table_checksum",
        "q_k_anonymity",
        "q_rfm_segments",
        "q_peak_concurrency",
        "q_ann_recall",
        "q_curation_funnel",
        "q_rolling_corr",
        "q_anova_f",
        "q_gini_spend",
        "q_calibration_ece",
        "q_seq_cooccur",
    ]
    canaries = [
        "q_group_stats",
        "q_scan_json",
        "q_udf_scalar",
        "q_pipeline_curate",
        "q_dedup_ngram_jaccard",
    ]
    assert len(round5_pending) == 45
    for name in round5_pending + canaries:
        assert name in window, f"{name} fell outside the driver's 50-entry window"


def test_registry_window_covers_all_unofficial_queries():
    """Every query without an official CORRECTNESS row from rounds 1-5
    (i.e. anything registered this round) must sit inside the 50-entry
    window — or be explicitly declared ROTATION_PENDING (registered
    after the window's 50 slots were already committed)."""
    import json
    from pathlib import Path

    from news_categorization_big_data_spark.plans import ROTATION_PENDING

    repo = Path(__file__).resolve().parents[1]
    official = set()
    for rnd in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
    ):
        with open(repo / rnd) as f:
            official |= set(json.load(f))
    window = set(list(REGISTRY)[:50])
    missing = [
        q
        for q in REGISTRY
        if q not in official and q not in window and q not in ROTATION_PENDING
    ]
    assert not missing, f"no official row in any round for: {missing}"
    # the pending set is genuinely pending (not shadow-listing window
    # or official entries), and every pending name exists
    assert ROTATION_PENDING <= set(REGISTRY) - window - official


def test_queries_and_oracles_paired():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is non-trivial SQL; every rows-only omission is a
    # deliberate None in the spec (not a lost entry)
    for name, sql in oracles.items():
        assert "SELECT" in sql.upper(), name
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        name for name, spec in REGISTRY.items() if spec.oracle is None
    }


def test_catalog_in_sync_with_registry():
    """CATALOG.md is generated from the registry (tools/gen_catalog.py);
    a registered query missing from the committed catalog means the
    generator wasn't re-run."""
    from pathlib import Path

    catalog = (Path(__file__).resolve().parents[1] / "CATALOG.md").read_text()
    missing = [q for q in REGISTRY if f"| {q} |" not in catalog]
    assert not missing, f"re-run tools/gen_catalog.py; missing: {missing}"
