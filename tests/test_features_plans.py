"""Physical-plan assertions for the feature-engineering tier — pins the
scale claims each docstring makes (single-pass moments, windows riding
aggregates not raw rows, broadcast corpus stats, top-k via
TakeOrderedAndProject) so a careless refactor fails fast."""

from __future__ import annotations

from news_categorization_big_data_spark.plans import REGISTRY
from news_categorization_big_data_spark.plans.features import BFS_HOPS


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_corr_matrix_is_one_aggregate_pass(spark, sf_dir):
    """All 15 moments from a single partial+final aggregate — the whole
    point of the query is one scan, not one corr() scan per pair."""
    plan = _plan(REGISTRY["q_corr_matrix"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_salted_agg_is_two_phase_no_join(spark, sf_dir):
    """Exactly two shuffles: the (key, salt) partial and the final
    merge — and nothing else."""
    plan = _plan(REGISTRY["q_salted_agg"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan


def test_benford_window_rides_digit_aggregate(spark, sf_dir):
    """One shuffle for the 9-digit aggregate, one single-partition
    exchange for the total window over those 9 rows — the raw orders
    are never windowed."""
    plan = _plan(REGISTRY["q_benford_digits"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan
    assert "Window" in plan, plan


def test_target_encode_windows_ride_cell_table(spark, sf_dir):
    """The only row-count-sized shuffle is the (category, fold) cell
    aggregate; every window runs on the cell table."""
    plan = _plan(REGISTRY["q_target_encode"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 3, plan


def test_alloc_budget_windows_ride_stratum_table(spark, sf_dir):
    plan = _plan(REGISTRY["q_alloc_budget"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 3, plan


def test_lift_bands_no_join_aggregates_before_windows(spark, sf_dir):
    plan = _plan(REGISTRY["q_lift_bands"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    # distinct-score agg + its global window + band agg + band window
    assert plan.count("Exchange") <= 4, plan


def test_tfidf_pairs_broadcast_stats_and_topk(spark, sf_dir):
    plan = _plan(REGISTRY["q_tfidf_pairs"].builder(spark, sf_dir))
    # the 1-row corpus count reaches every posting via broadcast
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # top-k pairs never global-sort: TakeOrderedAndProject
    assert "TakeOrderedAndProject" in plan, plan


def test_graph_bfs_unrolls_min_regroups_no_cartesian(spark, sf_dir):
    plan = _plan(REGISTRY["q_graph_bfs"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # one min-hop regroup per unrolled round survives in the plan
    assert plan.count("partial_min") >= BFS_HOPS, plan


def test_attrib_channel_one_window_node(spark, sf_dir):
    """The doc's claim, enforceable: both IGNORE-NULLS carries share one
    collapsed Window node over one user-keyed sort — a second sort or
    window would mean the carries could diverge."""
    plan = _plan(REGISTRY["q_attrib_channel"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window [") == 1, plan
    assert plan.count("Sort [") == 1, plan
    assert plan.count("Exchange") == 2, plan


def test_rrf_fusion_postings_bounded_topk(spark, sf_dir):
    plan = _plan(REGISTRY["q_rrf_fusion"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan  # dims/stats all broadcast
    assert "TakeOrderedAndProject" in plan, plan


def test_checksum_single_scan_no_join(spark, sf_dir):
    plan = _plan(REGISTRY["q_table_checksum"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan  # distinct-agg two-phase


def test_k_anonymity_two_level_agg(spark, sf_dir):
    plan = _plan(REGISTRY["q_k_anonymity"].builder(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 2, plan  # QI groups + 1-row summary


def test_peak_concurrency_no_interval_self_join(spark, sf_dir):
    plan = _plan(REGISTRY["q_peak_concurrency"].builder(spark, sf_dir))
    assert "Join" not in plan, plan


def test_rolling_corr_day_grain_plan_shape(spark, sf_dir):
    """The round-7 exact-moment rewrite: day-grain aggregate, one
    min-centering window pass, frame membership exploded into a
    BROADCAST equi-join of day-grain contributions (the join rides the
    tiny day table, never facts), int64-limb partial sums. Pins: the
    join is broadcast (never a shuffle join over exploded frames), no
    cartesian, and the raw event table is scanned exactly once."""
    plan = _plan(REGISTRY["q_rolling_corr"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    # the day-grain series is localCheckpointed once and BOTH join
    # sides read the materialized table — the fact scan never doubles
    assert plan.count("Scan ExistingRDD") == 2, plan
    assert plan.count("FileScan parquet") == 0, plan


def test_rfm_and_ann_recall_never_cartesian(spark, sf_dir):
    for name in ("q_rfm_segments", "q_ann_recall"):
        plan = _plan(REGISTRY[name].builder(spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
