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


def test_registry_window_contains_llm_tier():
    """The driver evaluates the first 50 insertion-order entries; the
    Tier-C LLM-pipeline contract set must sit inside that window."""
    window = list(REGISTRY)[:50]
    for name in [
        "q_dedup_near",
        "q_sim_search",
        "q_knn_label",
        "q_text_stats",
        "q_multimodal_cols",
        "q_ml_classify",
        "q_dedup_embedding",
        "q_udf_scalar",
        "q_udaf_grouped",
        "q_udtf_chunks",
        "q_scan_json",
        "q_agg_filtered",
    ]:
        assert name in window, f"{name} fell outside the driver's 50-entry window"


#: Queries registered after this round's 50-entry window froze: they are
#: pytest/driver_sim-verified but get no official row until round 3
#: rotates them in — so they must lead the tail (positions 51+).
ROTATION_PENDING = ["q_join_full_outer", "q_tpch_q6", "q_sql_correlated"]


def test_registry_window_covers_all_unofficial_queries():
    """Every query without a round-1 CORRECTNESS row must sit inside the
    50-entry window (rounds 1∪2 jointly give every registered query an
    official row) — except the declared rotation-pending ones, which
    must be the FIRST tail entries so the round-3 rotation is
    mechanical."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    with open(repo / "CORRECTNESS_r01.json") as f:
        r01 = set(json.load(f))
    names = list(REGISTRY)
    window = set(names[:50])
    missing = [
        q for q in REGISTRY
        if q not in r01 and q not in window and q not in ROTATION_PENDING
    ]
    assert not missing, f"no official row in either round for: {missing}"
    assert names[50 : 50 + len(ROTATION_PENDING)] == ROTATION_PENDING


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
