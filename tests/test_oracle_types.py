"""Guard against the oracle-typing bug class behind every red hash in
rounds 1 and 2: the external driver fetches DuckDB oracle rows via
pandas, where HUGEINT (count_if, un-cast SUM over BIGINT) converts to
float64 and renders "150.0" against Spark's "150" — rows and schema
match, the value hash doesn't. DESCRIBE plans each oracle without
executing it, so this sweep is cheap and covers every registered query.
"""

from __future__ import annotations

import duckdb
import pytest

from news_categorization_big_data_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: Types pandas renders as float64 (or object-decimal), breaking the
#: driver's repr()-based value hash against Spark's integer rendering.
FORBIDDEN = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


ORACLE_QUERIES = sorted(n for n, spec in REGISTRY.items() if spec.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_emits_no_pandas_lossy_types(con, name):
    rows = con.execute(f"DESCRIBE {REGISTRY[name].oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(f in typ.upper() for f in FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} would reach the driver as "
        "pandas float64/object and red-hash against Spark's integer "
        "rendering — CAST them to BIGINT/DOUBLE in the oracle SQL"
    )
