"""At-the-bound proofs for the overflow-sensitive exact-arithmetic family
(round-9 VERDICT "Next round" #1).

Every query in this family argues in its docstring that some scaled
integer/decimal accumulator "stays under 2^53" (or deliberately routes a
>2^53 accumulator through DECIMAL(38)/HUGEINT so it never double-rounds).
All official driver hashes run at sf0.01, where no sum approaches any
bound — so the gate structurally cannot catch a wrong bound argument.
These tests close that hole: each constructs a synthetic table whose
relevant accumulator lands AT the documented limit (asserted in-test,
not assumed), then runs the REGISTERED builder and its REGISTERED oracle
on that table and demands the same driver-style hash parity the official
gate uses. Where the arithmetic is pure-integer, a Python big-int
cross-check pins the value itself, not just cross-engine agreement.

Companion to the sf0.1 MATCH table in SCALE.md (round 10): that run
proves the family at one decade above the official stamp scale; these
prove it at the boundary the docstrings name.
"""

from __future__ import annotations

import datetime
import hashlib
from fractions import Fraction

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_categorization_big_data_spark.plans import REGISTRY
from tests.conftest import assert_oracle_match

TWO53 = 1 << 53
TS = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731


def _write_events(path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"))


def _write_orders(path, rows):
    """rows: list of (o_orderkey, o_custkey, o_totalprice)."""
    tbl = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(rows), pa.string()),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [TS("2024-01-05 00:00:00")] * len(rows), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "orders.parquet"))


def _write_lineitem(path, rows):
    """rows: list of (l_quantity, l_extendedprice, l_discount, l_tax)."""
    n = len(rows)
    tbl = pa.table(
        {
            "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
            "l_discount": pa.array([r[2] for r in rows], pa.float64()),
            "l_tax": pa.array([r[3] for r in rows], pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(
                [TS("2024-01-05 00:00:00")] * n, pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(path / "lineitem.parquet"))


def _assert_parity(spark, tmp_path, name, tables):
    """Run the registered builder AND its registered oracle on the
    adversarial dir; compare the driver's way."""
    spec = REGISTRY[name]
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'"
            )
        df = spec.builder(spark, str(tmp_path))
        assert_oracle_match(df, con, spec.oracle, name=f"{name}@bound")
        return {r["__k__"] if "__k__" in df.columns else i: r for i, r in enumerate(df.collect())}
    finally:
        con.close()


def test_twap_product_sum_past_2_53(spark, tmp_path):
    """q_twap routes Σ(v_micro·dur_us) through DECIMAL(38,0)/HUGEINT
    precisely because it EXCEEDS 2^53 (refinement.py docstring: 'never
    casting a >2^53 accumulator to double'). Construct intervals whose
    product sum is ~2^80 and pin the floor-divided twap_micro against
    Python big-int arithmetic. Values stay INSIDE the documented
    events.value domain (~[0,500] — the oracle's DECIMAL(18,6) is sized
    to it); the bound is crossed through month-long µs durations:
    per-interval product ~5e8·2.6e12 ≈ 1.3e21 ≫ 2^53."""
    rows, vals, ts_us = [], [500.0, 499.0, 500.25, 498.5], []
    base = TS("2024-01-01 00:00:00")
    for i, v in enumerate(vals):
        t = base + datetime.timedelta(days=30 * i, seconds=i)
        rows.append((i + 1, t, 1, "view", v))
        ts_us.append(int(t.timestamp() * 1_000_000))
    _write_events(tmp_path, rows)

    v_micro = [int(v * 1_000_000) for v in vals]
    durs = [b - a for a, b in zip(ts_us, ts_us[1:])]
    prod_sum = sum(v * d for v, d in zip(v_micro, durs))
    assert prod_sum > TWO53, "fixture failed to cross the documented bound"
    expected_twap_micro = prod_sum // sum(durs)

    df = _assert_parity(spark, tmp_path, "q_twap", ["events"])
    row = REGISTRY["q_twap"].builder(spark, str(tmp_path)).collect()[0]
    assert row["twap_micro"] == expected_twap_micro
    assert row["total_us"] == sum(durs)


def test_gini_rank_product_past_int64(spark, tmp_path):
    """q_gini_spend sums cents × rank-units in DECIMAL(38,0) because the
    product sum 'overflows int64 at corpus scale' (analytics.py). Build a
    population whose rank sum actually exceeds 2^63 and pin the Gini
    against exact-Fraction arithmetic."""
    n = 70_000
    # distinct per-customer cents ~1e10 → Σ cents·rank ≈ 1e10·n²/2 ≈ 2.4e19 > 2^63.
    rows = [(i + 1, i + 1, 1.0e8 + i) for i in range(n)]
    _write_orders(tmp_path, rows)

    cents = sorted(int(round((1.0e8 + i) * 100)) for i in range(n))
    rank_sum = sum(c * (i + 1) for i, c in enumerate(cents))
    assert rank_sum > (1 << 63), "fixture failed to cross int64"
    t = sum(cents)
    gini_exact = Fraction(2 * rank_sum - (n + 1) * t, 1) / Fraction(n * t, 1)

    _assert_parity(spark, tmp_path, "q_gini_spend", ["orders"])
    row = REGISTRY["q_gini_spend"].builder(spark, str(tmp_path)).collect()[0]
    assert row["n_customers"] == n
    # double chain: both engines cast the exact integers to double once.
    assert row["gini"] == pytest.approx(float(gini_exact), rel=1e-12)


def test_grouped_moments_adversarial_skew_past_2_53(spark, tmp_path):
    """q_grouped_moments' original docstring argued the 10⁻⁹-grid t⁴ sum
    stays ≪ 2^53 via |t| ≤ ~5 — FALSE under in-domain adversarial skew:
    a group of n−1 zeros + one outlier has Σt⁴ = (n−1)², crossing 2^53
    at n ≈ 3002, and the pre-fix direct decimal→double cast hash-flipped
    at n = 20001 (measured, round 10 — DuckDB double-rounds, Spark
    doesn't). This test pins THAT exact case as a regression test for
    the dec_to_double conversion now in place."""
    n = 20001
    big = 500.0  # in-domain
    rows = [(i + 1, TS("2024-01-05 00:00:00"), 1, "view", 0.0) for i in range(n - 1)]
    rows.append((n, TS("2024-01-05 00:00:00"), 1, "view", big))
    _write_events(tmp_path, rows)

    scaled_t4 = (n - 1) ** 2 * 10**9  # Σt⁴ = (n−1)² for max skew
    assert scaled_t4 > TWO53, "fixture no longer crosses the bound"

    _assert_parity(spark, tmp_path, "q_grouped_moments", ["events"])


def test_cuped_moment_sums_at_2_53(spark, tmp_path):
    """q_cuped's per-user covariate is integer cents of the pre-mean,
    'bounded by max value, NOT by activity — so the user-table moment
    sums stay under 2^53' (quality.py). Construct per-arm Σx² just under
    2^53 (two users per arm at cents 6.7e7) and demand parity."""

    def arm(uid: int) -> int:
        return int(hashlib.md5(f"cuped:{uid}".encode()).hexdigest()[:15], 16) % 2

    uids0 = [u for u in range(1, 60) if arm(u) == 0][:2]
    uids1 = [u for u in range(1, 60) if arm(u) == 1][:2]
    val = 670_000.0  # cents 6.7e7 → x² 4.489e15; Σ over 2 users 8.978e15 < 2^53
    per_arm_sxx = 2 * int(val * 100) ** 2
    assert (1 << 52) < per_arm_sxx < TWO53, f"fixture off the bound: {per_arm_sxx:.3e}"

    rows, eid = [], 0
    for u in uids0 + uids1:
        for ts in ("2024-01-10 00:00:00", "2024-01-20 00:00:00"):  # pre + post
            eid += 1
            rows.append((eid, TS(ts), u, "view", val))
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_cuped", ["events"])


def test_ewma_scaled_weighted_sum_at_2_53(spark, tmp_path):
    """q_ewma_smooth sizes EWMA_HORIZON and the DECIMAL scale together so
    the scaled weighted sum stays under 2^53 (quality.py EWMA_HORIZON
    note). A fully-covered target day sums v·(2^24−1); put the daily
    value at 4.8e6 so the ×100-scaled sum is ~8.05e15 — inside
    [2^52, 2^53) — and demand parity across 30 covered days."""
    from news_categorization_big_data_spark.plans.quality import EWMA_NORM

    daily_v = 4_800_000.0
    scaled_full = int(daily_v * 100) * EWMA_NORM
    assert (1 << 52) < scaled_full < TWO53, f"fixture off the bound: {scaled_full:.3e}"

    rows = [
        (d + 1, TS("2024-01-01 00:00:00") + datetime.timedelta(days=d), 1, "view", daily_v)
        for d in range(30)
    ]
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_ewma_smooth", ["events"])


def test_decay_agg_scaled_sum_at_2_53(spark, tmp_path):
    """q_decay_agg's decimal(18,2)·int31 sum is exact at any magnitude;
    the conversion risk is the FINAL decimal→double cast, which is
    single-rounded on both engines only while the scaled integer is
    below 2^53 (the EWMA_HORIZON note's DuckDB-int128 vs
    Spark-BigDecimal caveat). Park the scaled decayed sum just under
    2^53 and demand parity."""
    from news_categorization_big_data_spark.plans.analytics import (
        DECAY_ANCHOR,
        DECAY_WINDOW,
    )

    anchor = datetime.date.fromisoformat(DECAY_ANCHOR)
    day = anchor - datetime.timedelta(days=1)  # weight = DECAY_WINDOW - 1 = 30
    w = DECAY_WINDOW - 1
    n, val = 100, 29_000_000_000.0  # Σ val·w·100 = 8.7e15 < 2^53 ≈ 9.007e15
    scaled = n * int(val * 100) * w
    assert (1 << 52) < scaled < TWO53, f"fixture off the bound: {scaled:.3e}"

    ts = datetime.datetime.combine(day, datetime.time(12, 0))
    rows = [(i + 1, ts, 1, "view", val) for i in range(n)]
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_decay_agg", ["events"])


def test_corr_limb_quantum_at_int64(spark, tmp_path):
    """q_corr_matrix's limb-split sums are exact while each per-row
    micro-quantum floor(expr·10⁶) fits int64 (features.py). Put the
    largest moment (extendedprice²) at ~0.995·2^63 per row and demand
    parity plus a finite correlation."""
    price = 3_030_000.0  # price²·1e6 ≈ 9.18e18 < 2^63 ≈ 9.223e18
    q_max = int(price * price * 1_000_000)
    assert 0.9 * (1 << 63) < q_max < (1 << 63), f"fixture off the bound: {q_max:.3e}"

    rows = [
        (10.0, price, 0.05, 0.02),
        (20.0, price - 1000.0, 0.06, 0.03),
        (30.0, price - 2500.0, 0.04, 0.01),
        (40.0, price - 4000.0, 0.07, 0.04),
    ]
    _write_lineitem(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_corr_matrix", ["lineitem"])
    out = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in REGISTRY["q_corr_matrix"].builder(spark, str(tmp_path)).collect()
    }
    c = out[("l_quantity", "l_extendedprice")]
    assert c is not None and -1.0 <= c <= 1.0


@pytest.mark.parametrize(
    "name,mkrows",
    [
        # These fixture SHAPES hash-flipped against the direct
        # decimal→double cast before round 10's dec_to_double fix
        # (scaled accumulators ~5e17 / ~6e17 / ~3e17 — well past 2^53).
        # Values sit on the binary-exact 0.25 grid so the double→
        # DECIMAL(18,2) input cast is unambiguous on both engines and
        # the test isolates the ACCUMULATOR conversion under test (at
        # 1e13 magnitude a double cannot represent .37, and the two
        # engines round the cast differently — an input-domain issue,
        # not an accumulator one).
        (
            "q_decay_agg",
            lambda: [
                (i + 1, TS("2024-01-31 12:00:00"), 1, "view", 161290322580.75 + i * 0.25)
                for i in range(100)
            ],
        ),
        (
            "q_ewma_smooth",
            lambda: [
                (
                    d + 1,
                    TS("2024-01-01 00:00:00") + datetime.timedelta(days=d),
                    1,
                    "view",
                    3.7e8 + d * 0.25,
                )
                for d in range(30)
            ],
        ),
        (
            "q_bootstrap_ci",
            lambda: [
                (i + 1, TS("2024-01-05 00:00:00"), 1, "view", 4.3e13 + i * 0.25)
                for i in range(10)
            ],
        ),
        # Class coverage (not a measured pre-fix flip): the WINDOWED
        # conversion path — o_dec_to_double over `SUM(...) OVER w` —
        # is structurally distinct from the aggregate path, so pin it
        # past the bound too: 10 events inside one hour per user put
        # the range-window sum's scaled integer at ~4.3e16 > 2^53.
        (
            "q_window_time_range",
            lambda: [
                (
                    i + 1,
                    TS("2024-01-05 00:00:00") + datetime.timedelta(minutes=5 * i),
                    1 + i // 10,
                    "view",
                    4.3e13 + i * 0.25,
                )
                for i in range(20)
            ],
        ),
    ],
)
def test_family_past_2_53_regressions(spark, tmp_path, name, mkrows):
    """Pin the measured pre-fix hash flips (SCALE.md round 10) — plus
    the windowed-conversion class case — as permanent regressions: with
    dec_to_double in place the family must stay engine-identical
    arbitrarily far past 2^53."""
    _write_events(tmp_path, mkrows())
    _assert_parity(spark, tmp_path, name, ["events"])


def test_bootstrap_weighted_sum_at_2_53(spark, tmp_path):
    """q_bootstrap_ci accumulates Σ w·v on the DECIMAL(18,2) grid with
    max Poisson weight 7 ('the q_ab_ttest bound argument, times max
    weight 7', quality.py). Park the worst-case scaled resample sum
    just under 2^53 and demand parity of the full CI."""
    n, val = 10, 1_200_000_000_000.0  # 7·n·val·100 = 8.4e15 < 2^53
    scaled_worst = 7 * n * int(val * 100)
    assert (1 << 52) < scaled_worst < TWO53, f"fixture off the bound: {scaled_worst:.3e}"

    rows = [
        (i + 1, TS("2024-01-05 00:00:00"), 1, "view", val + i)  # distinct v per row
        for i in range(n)
    ]
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_bootstrap_ci", ["events"])


# ---------------------------------------------------------------------------
# dsum's JOINT accumulation bound (round-11 advice)
# ---------------------------------------------------------------------------

_I64 = 1 << 64


def _wrap64(x: int) -> int:
    """Two's-complement int64 wrap — Spark's non-ANSI long-sum semantics."""
    x &= _I64 - 1
    return x - _I64 if x >= (1 << 63) else x


def _limb_sim(qs):
    """Simulate dsum's three-limb accumulation with WRAPPING int64 partial
    sums (exactly what a non-ANSI Spark `sum(long)` computes), then the
    exact reassembly. Returns the reassembled scaled integer."""
    m = (1 << 20) - 1
    hi = mid = lo = 0
    for q in qs:
        hi = _wrap64(hi + (q >> 40))
        mid = _wrap64(mid + ((q >> 20) & m))
        lo = _wrap64(lo + (q & m))
    return hi * (1 << 40) + mid * (1 << 20) + lo


def test_dsum_joint_bound_formula_is_the_exact_wrap_threshold():
    """The round-11 advice: dsum's old separate bounds (rows/group < 2^43
    AND per-row |q| < 2^63) are not jointly sufficient — the HI limb is up
    to ~2^23 per row at max magnitude, so the hi long sum wraps silently
    at rows ≈ 2^63/max(|q|>>40), far below 2^43. Pin the CORRECTED joint
    bound as the exact threshold: with every row at max per-row magnitude,
    the int64-wrap simulation reassembles exactly up to
    N = floor((2^63-1)/hi_per_row) rows and is WRONG (wrapped) past it.
    Simulated, not executed on Spark — the threshold sits at ~10^12 rows,
    but the simulation IS Spark's arithmetic (two's-complement long adds;
    the identity is pinned against real Spark by the probe test below and
    test_exact_conversion.py)."""
    q = (1 << 63) - 1  # max per-row scaled magnitude dsum can ever see
    hi_per_row = q >> 40  # 2^23 - 1
    n_safe = ((1 << 63) - 1) // hi_per_row  # the documented joint bound

    # AT the bound: hi sum = n_safe·hi_per_row ≤ 2^63-1 — no wrap, exact.
    exact_at = _limb_sim_uniform(q, n_safe)
    assert exact_at == q * n_safe

    # ONE ROW PAST the bound: the hi partial sum exceeds int64 — silent
    # two's-complement wrap, a WRONG value (not an error, not a NULL).
    wrapped = _limb_sim_uniform(q, n_safe + 1)
    assert wrapped != q * (n_safe + 1)
    # ... and the mid/lo limbs alone stay exact to 2^43 rows (the old
    # documented bound really does hold for THEM: per-row < 2^20).
    assert n_safe + 1 < (1 << 43), "wrap happens far below the old 2^43 claim"


def _limb_sim_uniform(q: int, n: int) -> int:
    """_limb_sim for n identical rows, O(1): wrap each limb's n·per-row
    product the way n sequential wrapping adds would land (identical
    because wrapping addition is associative modulo 2^64)."""
    m = (1 << 20) - 1
    hi = _wrap64((q >> 40) * n)
    mid = _wrap64(((q >> 20) & m) * n)
    lo = _wrap64((q & m) * n)
    return hi * (1 << 40) + mid * (1 << 20) + lo


def test_dsum_limb_exact_at_max_per_row_magnitude(spark):
    """Real-Spark companion to the threshold simulation: at the MAX
    per-row scaled magnitude (|q| ≈ 0.9975·2^63 — the regime where the
    old bound prose wrongly promised 2^43 rows of headroom), a
    4000-row signed group is still far inside the corrected joint bound,
    and dsum must stay bit-identical to the decimal-buffer reference."""
    from pyspark.sql import functions as F

    from news_categorization_big_data_spark.functions.exact import dec_to_double
    from news_categorization_big_data_spark.plans.relational import dsum

    v = 9_200_000_000_000.0  # ·10^6 → 9.2e18 ≈ 0.9975·2^63
    assert 0.99 * (1 << 63) < v * 1e6 < (1 << 63)
    df = spark.range(4000).select(
        (F.col("id") % 3).alias("k"),
        # signed: alternate sign so hi limbs of -1/positive mix
        F.when(F.col("id") % 2 == 0, F.lit(v)).otherwise(F.lit(-v)).alias("v"),
    )
    ref = df.groupBy("k").agg(
        dec_to_double(F.sum(F.col("v").cast("decimal(30,6)")), 6).alias("s")
    )
    fast = df.groupBy("k").agg(dsum("v", 6).alias("s"))
    import struct

    bits = lambda x: struct.pack("<d", x)  # noqa: E731
    ref_rows = {r["k"]: r["s"] for r in ref.collect()}
    fast_rows = {r["k"]: r["s"] for r in fast.collect()}
    assert set(ref_rows) == set(fast_rows)
    for k in ref_rows:
        assert bits(ref_rows[k]) == bits(fast_rows[k]), k


# ---------------------------------------------------------------------------
# Round 11: the OTHER windowed/derived decimal sums, pinned past 2^53
# (round-10 VERDICT "Next round" #6 — q_window_time_range's family got
# the first windowed pin in round 10; these extend the proof to the
# remaining running-sum shapes).
# ---------------------------------------------------------------------------


def test_cusum_windowed_sums_past_2_53(spark, tmp_path):
    """q_cusum_changepoint's full-partition total (SUM(...) OVER
    (PARTITION BY type)) feeds the mean every deviation subtracts — park
    the type total's scaled integer past 2^53 (30 days x 8e8 on the
    0.25 grid -> ~2.4e16 scaled units at scale 6) so BOTH windowed
    conversions (tot and the running cusum) must ride the limb chain to
    stay engine-identical."""
    n_days, base = 30, 8.0e8
    scaled_tot = sum(int((base + d * 0.25) * 10**6) for d in range(n_days))
    assert scaled_tot > TWO53, f"fixture below the bound: {scaled_tot:.3e}"

    rows = [
        (d + 1, TS("2024-01-01 06:00:00") + datetime.timedelta(days=d), 1, "view", base + d * 0.25)
        for d in range(n_days)
    ]
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_cusum_changepoint", ["events"])


def test_semi_additive_closing_balance_sum_past_2_53(spark, tmp_path):
    """q_semi_additive sums each user's CLOSING balance per month; park
    one month's total past 2^53 scaled units (50 users x ~4.3e8 on the
    0.25 grid -> ~2.15e16 at scale 6). Two observations per user make
    the window actually pick (the later, larger row), so the fixture
    exercises the row_number pass AND the >2^53 sum conversion."""
    n_users = 50
    vals = [4.3e8 + u * 0.25 for u in range(n_users)]
    scaled = sum(int(v * 10**6) for v in vals)
    assert scaled > TWO53, f"fixture below the bound: {scaled:.3e}"

    rows = []
    eid = 0
    for u, v in enumerate(vals, start=1):
        eid += 1  # stale observation early in the month, to be superseded
        rows.append((eid, TS("2024-03-05 09:00:00"), u, "view", 1.0))
        eid += 1  # closing observation
        rows.append((eid, TS("2024-03-25 09:00:00"), u, "view", v))
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_semi_additive", ["events"])


def test_interval_coverage_epoch_us_past_2_53(spark, tmp_path):
    """q_interval_coverage claims PURE BIGINT microsecond arithmetic —
    no double anywhere. Pin it where that matters: timestamps in year
    2400 put epoch_us at ~1.36e16 > 2^53, so any hidden double
    round-trip of s/e (or of the running MAX(e)) would corrupt the
    island boundaries and flip the hash."""
    t0 = TS("2400-06-01 00:00:00")
    assert t0.timestamp() * 1e6 > TWO53
    rows = [
        # user 1: two overlapping intervals (one island), then a far gap
        (1, t0, 1, "view", 1.0),
        (2, t0 + datetime.timedelta(minutes=2), 1, "view", 1.0),
        (3, t0 + datetime.timedelta(hours=4), 1, "view", 1.0),
        # user 2: a single event
        (4, t0 + datetime.timedelta(minutes=1), 2, "view", 1.0),
    ]
    _write_events(tmp_path, rows)

    _assert_parity(spark, tmp_path, "q_interval_coverage", ["events"])
