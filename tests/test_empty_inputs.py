"""Empty-input regression pins — the 15 round-13 /tmp/skew6 fixes.

tools/make_skew6.py writes every table as a ZERO-ROW parquet with the
production schema; the round-13 sweep found 15 defects in four classes
(SCALE.md "Round 13: the EMPTY-INPUT axis"). This file regenerates the
fixture into the test's own tmp dir (instant — it is just empty
parquet) and pins every fixed query oracle-green ON EMPTY INPUT, so a
refactor that reintroduces an inference-dependent read-back, an
unguarded division, or a bare MLlib fit fails here instead of at the
next fixture sweep."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.conftest import assert_oracle_match
from news_categorization_big_data_spark.plans import REGISTRY

#: The 15 queries the /tmp/skew6 sweep caught (four classes — see
#: SCALE.md for the class table).
FIXED = [
    # inference-dependent round-trips
    "q_scan_json",
    "q_scan_partitioned",
    "q_scan_zorder",
    "q_sink_partitioned_roundtrip",
    "q_sink_pyds_roundtrip",
    # ANSI divide-by-zero
    "q_dq_checks",
    "q_ab_srm",
    "q_curation_funnel",
    # grouping-sets grand-total contract
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    # estimator guards + count_if parity
    "q_ml_classify",
    "q_ml_kmeans",
    "q_sim_ann_lsh",
    "q_table_profile",
]

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    from tools import make_skew6

    dst = tmp_path_factory.mktemp("skew6")
    old_argv = sys.argv
    sys.argv = ["make_skew6.py", str(dst)]
    try:
        make_skew6.main()
    finally:
        sys.argv = old_argv
    return str(dst)


@pytest.fixture(scope="module")
def empty_duck(empty_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{empty_sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FIXED)
def test_empty_input_fix_holds(spark, empty_sf_dir, empty_duck, name):
    spec = REGISTRY[name]
    assert spec.oracle is not None, name
    df = spec.builder(spark, empty_sf_dir)
    assert_oracle_match(df, empty_duck, spec.oracle, name=f"{name}@skew6")


def test_fixture_is_actually_empty(empty_sf_dir):
    import pyarrow.parquet as pq

    for t in ("orders", "events", "documents"):
        tab = pq.read_table(f"{empty_sf_dir}/{t}.parquet")
        assert tab.num_rows == 0 and tab.num_columns > 0
