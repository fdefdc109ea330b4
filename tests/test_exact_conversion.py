"""Property tests for functions/exact.py — the deterministic
DECIMAL→DOUBLE conversion must agree bit-for-bit between Spark and
DuckDB at ANY magnitude (that's its whole contract), and must equal the
single correctly-rounded conversion below 2^53 (that's what keeps every
existing sf0.01 driver hash valid after adopting it)."""

from __future__ import annotations

import decimal
import struct

import duckdb
import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from news_categorization_big_data_spark.functions.exact import (
    LIMB,
    dec_to_double,
    o_dec_to_double,
    sql_dec_to_double,
)

SCALES = (2, 6, 9)


def _bits(x):
    return None if x is None else struct.pack("<d", x)


def _spark_convert(spark, scaled_ints, scale):
    """Convert scaled integers through dec_to_double via a decimal col."""
    dec = f"decimal(38,{scale})"
    df = spark.createDataFrame(
        [(str(decimal.Decimal(v).scaleb(-scale)),) for v in scaled_ints], ["s"]
    ).select(dec_to_double(F.col("s").cast(dec), scale).alias("d"))
    return [r["d"] for r in df.collect()]


def _duck_convert(scaled_ints, scale):
    con = duckdb.connect()
    try:
        vals = ", ".join(
            f"(CAST('{decimal.Decimal(v).scaleb(-scale)}' AS DECIMAL(38,{scale})))"
            for v in scaled_ints
        )
        sql = f"SELECT {o_dec_to_double('s', scale)} AS d FROM (VALUES {vals}) t(s)"
        return [r[0] for r in con.execute(sql).fetchall()]
    finally:
        con.close()


EDGES = [
    0,
    1,
    -1,
    (1 << 53) - 1,
    1 << 53,
    (1 << 53) + 1,
    -((1 << 53) + 1),
    LIMB - 1,
    LIMB,
    LIMB + 1,
    (1 << 63) + 12345,
    -((1 << 63) + 12345),
    10**25 + 7,
    3 * (1 << 53) + 1,
]


@pytest.mark.parametrize("scale", SCALES)
def test_edge_scaled_integers_bit_identical(spark, scale):
    s = _spark_convert(spark, EDGES, scale)
    d = _duck_convert(EDGES, scale)
    for v, a, b in zip(EDGES, s, d):
        assert _bits(a) == _bits(b), f"scaled={v} scale={scale}: spark={a!r} duck={b!r}"


@pytest.mark.parametrize("scale", SCALES)
def test_below_2_53_equals_correct_rounding(spark, scale):
    """For |scaled| < 2^53 the limb chain must reproduce the single
    correctly-rounded conversion — the hash-neutrality guarantee."""
    vals = [0, 3, -12345, (1 << 53) - 1, -((1 << 53) - 1), 10**15 + 1]
    out = _spark_convert(spark, vals, scale)
    for v, got in zip(vals, out):
        want = float(decimal.Decimal(v).scaleb(-scale))  # one correct rounding
        assert _bits(got) == _bits(want), f"scaled={v}: {got!r} != {want!r}"


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**30), max_value=10**30), min_size=20, max_size=60
    )
)
def test_random_magnitudes_bit_identical(spark_global, scaled):
    s = _spark_convert(spark_global, scaled, 6)
    d = _duck_convert(scaled, 6)
    for v, a, b in zip(scaled, s, d):
        assert _bits(a) == _bits(b), f"scaled={v}: spark={a!r} duck={b!r}"


@pytest.fixture(scope="module")
def spark_global(spark):
    # hypothesis forbids function-scoped fixtures interacting with @given;
    # re-expose the session fixture at module scope.
    return spark


@pytest.mark.parametrize("scale", SCALES)
def test_sql_emitter_matches_column_form_and_duckdb(spark, scale):
    """sql_dec_to_double (the Spark-SQL text form used by q_sql_udf)
    must agree bit-for-bit with BOTH the Column form and DuckDB across
    the same edge magnitudes."""
    dec = f"decimal(38,{scale})"
    df = spark.createDataFrame(
        [(str(decimal.Decimal(v).scaleb(-scale)),) for v in EDGES], ["s"]
    ).select(F.col("s").cast(dec).alias("s"))
    df.createOrReplaceTempView("_exact_probe")
    sql_out = [
        r["d"]
        for r in spark.sql(
            f"SELECT {sql_dec_to_double('s', scale)} AS d FROM _exact_probe"
        ).collect()
    ]
    col_out = [r["d"] for r in df.select(dec_to_double(F.col("s"), scale).alias("d")).collect()]
    duck_out = _duck_convert(EDGES, scale)
    for v, a, b, c in zip(EDGES, sql_out, col_out, duck_out):
        assert _bits(a) == _bits(b) == _bits(c), (
            f"scaled={v} scale={scale}: sql={a!r} col={b!r} duck={c!r}"
        )


def test_dsum_limb_form_bit_identical_to_decimal_sum(spark):
    """dsum's round-10 limb-split accumulation (three native long sums
    over arithmetic-shift limbs) must reassemble EXACTLY the integer the
    decimal aggregate would have produced — for signed values too (the
    two's-complement identity q = (q>>40)·2^40 + ((q>>20)&m)·2^20 +
    (q&m) holds for negative q with arithmetic shift). Reference form =
    decimal sum + the same conversion chain."""
    from news_categorization_big_data_spark.plans.relational import dsum

    df = spark.range(200_000).select(
        (F.col("id") % 7).alias("k"),
        ((F.col("id") % 2001) - 1000.25).alias("v"),  # signed, fractional
    )
    ref = df.groupBy("k").agg(
        dec_to_double(F.sum(F.col("v").cast("decimal(30,6)")), 6).alias("s")
    )
    fast = df.groupBy("k").agg(dsum("v", 6).alias("s"))
    ref_rows = {r["k"]: r["s"] for r in ref.collect()}
    fast_rows = {r["k"]: r["s"] for r in fast.collect()}
    assert set(ref_rows) == set(fast_rows)
    for k in ref_rows:
        assert _bits(ref_rows[k]) == _bits(fast_rows[k]), k


def test_null_propagates(spark):
    df = spark.range(1).select(
        dec_to_double(F.lit(None).cast("decimal(38,6)"), 6).alias("d")
    )
    assert df.collect()[0]["d"] is None


#: The round-11 dsum sweep: every converted query must produce output
#: BIT-IDENTICAL under the limb accumulation and the decimal-buffer
#: reference (DSUM_MODE toggle). Representative sample spanning every
#: swept file/shape — plain money sums, weighted sums, squared sums,
#: conditional (when) sums, scale-9/12 bounded sums, two-level sums.
_SWEEP_SAMPLE = [
    "q_tpch_q3",        # join + money sum, scale 4
    "q_tpch_q6",        # product-of-decimals sum
    "q_tpch_q9",        # difference sum, scale 5
    "q_decay_agg",      # decimal x int-weight sum
    "q_grouped_moments",  # s1/s2 limb + t3/t4 decimal (mixed — the skip)
    "q_ab_ttest",       # conditional when() sums incl. squared
    "q_hhi_concentration",  # share^2 at scale 12
    "q_anova_f",        # two-level sum (dsum over dsum output)
    "q_rrf_fusion",     # scale-9 weight sum
    "q_rfm_segments",   # warehouse money sums
]


@pytest.mark.parametrize("name", _SWEEP_SAMPLE)
def test_dsum_sweep_bit_identical_under_mode_toggle(spark, name):
    """Round-11 conversion sweep: for each swept query, the registered
    plan under DSUM_MODE='limb' (shipped) and DSUM_MODE='decimal' (the
    pre-sweep buffer) must be row-for-row, bit-for-bit identical at
    sf0.001 — the same invariant round 10 proved for dsum in isolation,
    asserted through the real query plans."""
    from news_categorization_big_data_spark.plans import REGISTRY, relational

    sf = "/root/testdata/sf0.001"
    spec = REGISTRY[name]

    def rows(mode):
        relational.DSUM_MODE = mode
        try:
            df = spec.builder(spark, sf)
            cols = df.columns
            out = []
            for r in df.collect():
                out.append(
                    tuple(_bits(v) if isinstance(v, float) else v for v in (r[c] for c in cols))
                )
            return sorted(out, key=repr)
        finally:
            relational.DSUM_MODE = "limb"

    limb, dec = rows("limb"), rows("decimal")
    assert len(limb) == len(dec)
    for a, b in zip(limb, dec):
        assert a == b


def test_det_log2_bit_identical_across_engines_and_accurate(spark, duck):
    """det_log2_sql (functions/exact.py): the engine-pinned log2 that
    round 12 swapped in for q_group_entropy's bounded lookup. Pins
    (a) BIT-identity between Spark and DuckDB over a wide count
    domain — the property the whole construction exists for — and
    (b) ~1e-14 accuracy vs true log2."""
    import math
    import struct

    from pyspark.sql import functions as F

    from news_categorization_big_data_spark.functions.exact import det_log2_sql

    hi = 50_000
    sdf = (
        spark.range(1, hi + 1)
        .select(F.col("id").alias("n"))
        .selectExpr("n", det_log2_sql("n", "spark") + " AS l2")
    )
    srows = {r["n"]: r["l2"] for r in sdf.collect()}
    drows = dict(
        duck.execute(
            f"SELECT n, {det_log2_sql('n', 'duckdb')} "
            f"FROM (SELECT unnest(range(1, {hi + 1})) + 0 AS n)"
        ).fetchall()
    )
    assert len(srows) == len(drows) == hi
    for n in (1, 2, 3, 7, 1024, 1025, 31337, hi):
        assert abs(srows[n] - math.log2(n)) < 1e-13, (n, srows[n])
    diff = [
        n
        for n in srows
        if struct.pack("<d", srows[n]) != struct.pack("<d", drows[n])
    ]
    assert not diff, f"{len(diff)} bit-differing log2 values, e.g. {diff[:5]}"
