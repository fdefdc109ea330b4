"""Query-scoped cache pins (functions/cachepin.py, ADVICE round 8).

The external driver runs every registered query through ONE long-lived
session; plan builders that persist a multi-consumer intermediate must
not accumulate cached blocks across the whole window. The registry
wrapper releases the previous query's pins when the next builder runs,
so at most one query's pins are live at any time.
"""

from __future__ import annotations

from news_categorization_big_data_spark.functions import cachepin
from news_categorization_big_data_spark.plans import REGISTRY

NO_STORAGE = "Serialized 1x Replicated"  # StorageLevel.NONE description


def _build_and_collect(spark, sf_dir, name):
    df = REGISTRY[name].builder(spark, sf_dir)
    df.collect()
    return df


def test_pin_survives_own_collect_and_releases_on_next_build(spark, sf_dir):
    cachepin.release_pins()
    # q_tfidf_pairs pins its postings table (plans/features.py).
    _build_and_collect(spark, sf_dir, "q_tfidf_pairs")
    assert cachepin._PINNED, "q_tfidf_pairs should pin its postings table"
    pinned = list(cachepin._PINNED)
    assert all(p.storageLevel.useMemory or p.storageLevel.useDisk for p in pinned)

    # Building the NEXT query releases the previous query's pins.
    _build_and_collect(spark, sf_dir, "q_group_stats")
    for p in pinned:
        assert not (p.storageLevel.useMemory or p.storageLevel.useDisk), (
            "previous query's pin must be unpersisted at next build"
        )
    assert not cachepin._PINNED, "q_group_stats pins nothing"


def test_pinned_queries_bound_cached_footprint(spark, sf_dir):
    """After running three pinning queries back-to-back, only the LAST
    query's pins may remain cached — accumulation is bounded by design,
    not by LRU eviction."""
    cachepin.release_pins()
    for name in ("q_mad_outliers", "q_chi2_terms", "q_semantic_dedup"):
        _build_and_collect(spark, sf_dir, name)
    live = len(cachepin._PINNED)
    assert 1 <= live <= 2, f"only the last query's pins should remain, got {live}"
    cachepin.release_pins()
    assert not cachepin._PINNED


def test_release_is_correctness_neutral(spark, sf_dir):
    """Collecting a frame AFTER its pins were released recomputes
    through lineage and yields identical rows."""
    cachepin.release_pins()
    df = REGISTRY["q_tfidf_pairs"].builder(spark, sf_dir)
    before = sorted(map(tuple, df.collect()))
    cachepin.release_pins()
    after = sorted(map(tuple, df.collect()))
    assert before == after
