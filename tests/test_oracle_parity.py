"""The primary correctness gate: every registered query with an oracle is
hash-compared against DuckDB exactly the way the driver does (SURVEY.md
§5.2.1), at the smoke scale factor. Queries without an oracle get a
schema/rows smoke check."""

from __future__ import annotations

import pytest

from news_categorization_big_data_spark.plans import REGISTRY
from tests.conftest import assert_oracle_match

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    assert_oracle_match(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_smoke(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    rows = df.collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"lang", "n_docs", "digest"}


def test_contract_shape():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40
