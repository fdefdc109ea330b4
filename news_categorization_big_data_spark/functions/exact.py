"""Deterministic DECIMAL→DOUBLE conversion — identical last-ulp on every
engine, at any realistic accumulator magnitude.

The problem (found by tests/test_overflow_bounds.py, round 10): Spark
converts a decimal to double in ONE correctly-rounded step
(``BigDecimal.doubleValue``), while DuckDB converts the int128 storage
value to double and then divides by 10^scale — TWO roundings. The
results agree while the SCALED integer is below 2^53 (both chains are
exact there) but can differ in the last ulp above it. Every "stays
under 2^53" docstring bound in the exact-arithmetic family exists to
dodge this — and the bound arguments assume value-domain typicality
that adversarial skew breaks (a max-skew group of ~20 k in-domain rows
already flips q_grouped_moments' hash; measured, SCALE.md round 10).

The fix: never let either engine convert a wide decimal directly.
Extract the exact scaled integer, split it into two limbs that are each
exact or single-rounded in double, and reassemble with an IEEE chain
both engines execute identically:

    si  = scaled integer   (decimal·10^scale — exact by construction)
    a   = |si|
    hi  = a div 2^60       (< 2^53 for |si| < 2^113 — hi→double EXACT)
    lo  = a mod 2^60       (int64→double: ONE correct rounding, both engines)
    out = sign(si) · (hi·2^60 + lo) / 10^scale

``hi·2^60`` is exact (hi < 2^53 times a power of two), the add and the
final divide are one correctly-rounded IEEE op each — the whole chain is
reproducible on any IEEE-754 engine. For |si| < 2^53 the result is
bit-identical to the single correctly-rounded conversion, so adopting
this helper does NOT change any value the official driver has already
hashed at sf0.01 — only the previously engine-divergent >2^53 region.

Validity: the LIMB reassembly itself is exact for |si| < 2^113, but the
helpers never see an si that large — ``(expr)·10^scale`` stays
DECIMAL(38,scale) on BOTH engines, so the operative cap is
**|si| < 10^(38-scale)**: ~2^106 at scale 6, ~2^96 at scale 9, ~2^86 at
scale 12. Past that cap the engines fail DIVERGENTLY (measured, round
11 advice): DuckDB raises OutOfRange (loud — the oracle run errors),
while non-ANSI Spark overflows the decimal to NULL silently (a NULL
result vs an oracle error, never a silently-wrong value on the Spark
side alone). A 100-TB accumulator of 2-dp values tops out around 10^22
(6·10^11 rows × 500 × weight 2^23 × 100), which clears even the
scale-12 cap by four orders of magnitude. NULL propagates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Limb base. 2^60 keeps hi < 2^53 (exact in double) through |si| < 2^113
#: — far past the DECIMAL(38,scale) operative cap of 10^(38-scale) (module
#: docstring) — while lo < 2^60 needs only the one correct int64→double
#: rounding.
LIMB = 1 << 60


def scaled_to_double(si: Column, scale: int) -> Column:
    """The reassembly chain on an ALREADY-SCALED exact integer held in a
    decimal column (scale 0): sign·(hi·2^60 + lo)/10^scale."""
    a = F.abs(si)
    lo = a % F.lit(LIMB)
    # (a - lo) is exactly divisible by LIMB and hi < 2^53 fits the
    # division's result scale, so the decimal divide is exact.
    hi = ((a - lo) / F.lit(LIMB)).cast("long")
    mag = hi.cast("double") * F.lit(float(LIMB)) + lo.cast("double")
    sgn = F.when(si < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return sgn * mag / F.lit(float(10**scale))


def dec_to_double(sum_col: Column, scale: int) -> Column:
    """Deterministic double of a DECIMAL(p, ``scale``) column (see module
    docstring). ``sum_col`` is typically a decimal aggregate result."""
    return scaled_to_double((sum_col * F.lit(10**scale)).cast("decimal(38,0)"), scale)


def sql_dec_to_double(expr: str, scale: int) -> str:
    """Spark-SQL text mirror of :func:`dec_to_double` — for plans whose
    hot path is a ``spark.sql(...)`` string (e.g. the SQL-UDF surface).
    Same limb split, same IEEE chain; Spark-SQL ``div`` is integral
    division (trunc), exact here because it only ever runs on the
    non-negative ``ABS(si)``."""
    si = f"CAST(({expr}) * {10 ** scale} AS DECIMAL(38,0))"
    a = f"ABS({si})"
    lo = f"CAST(({a}) % {LIMB} AS BIGINT)"
    hi = f"CAST(({a}) div {LIMB} AS BIGINT)"
    return (
        f"((CASE WHEN {si} < 0 THEN -1.0D ELSE 1.0D END) * "
        f"(CAST({hi} AS DOUBLE) * {float(LIMB)!r}D + CAST({lo} AS DOUBLE)) "
        f"/ {float(10 ** scale)!r}D)"
    )


def o_dec_to_double(expr: str, scale: int) -> str:
    """DuckDB-side mirror of :func:`dec_to_double` — the same limb split
    and the same IEEE reassembly chain, as one scalar SQL expression.
    ``expr`` must be a decimal-typed expression with scale ``scale``."""
    si = f"CAST(({expr}) * {10 ** scale} AS HUGEINT)"
    a = f"ABS({si})"
    lo = f"CAST(({a}) % {LIMB} AS BIGINT)"
    hi = f"CAST(({a}) // {LIMB} AS BIGINT)"
    return (
        f"((CASE WHEN {si} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST({hi} AS DOUBLE) * {float(LIMB)!r} + CAST({lo} AS DOUBLE)) "
        f"/ {float(10 ** scale)!r})"
    )


def det_log2_sql(n_expr: str, dialect: str) -> str:
    """Engine-pinned log2 over positive BIGINT counts — identical IEEE
    doubles on Spark and DuckDB at ANY count, replacing the bounded
    (n, log2 n) lookup dimension (whose fail-fast bound the /tmp/skew4
    null group tripped at 30k rows, and any 100-TB hot entity would).

    True log2 is transcendental and NOT correctly rounded by either
    engine's libm (measured: 7634/20000 last-ulp differences — see
    q_group_entropy), so instead both engines evaluate the SAME
    deterministic approximation built ONLY from operations IEEE-754
    requires to be correctly rounded (+, −, ×, ÷, casts) plus exact
    integer steps:

      e  = length(bin(n)) − 1          (floor(log2 n), exact integers)
      m  = double(n) / double(1 << e)  (mantissa in [1,2); both casts
                                        and the divide correctly round
                                        — identical doubles)
      t  = (m−1)/(m+1); ln m = 2t·Σ t^{2k}/(2k+1), k ≤ 16 (atanh
           series, |t| ≤ 1/3 ⇒ remainder < 3e-17; Horner with literal
           coefficients in {x!r}e0 form — the shortest-round-trip repr
           parses to the identical double in both engines, the e0
           suffix pinning DOUBLE typing, the established literal rule)
      log2 n = e + ln m · (1/ln 2 as the same literal)

    Every step is the same expression tree on both sides, each op
    correctly rounded ⇒ bit-identical results; absolute accuracy vs
    true log2 ~1e-15 (pinned by tests/test_exact_conversion.py over a
    wide domain). Only the shift-left token differs by dialect.
    """
    if dialect == "spark":
        shift = f"shiftleft(CAST(1 AS BIGINT), (length(bin({n_expr})) - 1))"
    elif dialect == "duckdb":
        shift = f"(CAST(1 AS BIGINT) << (length(bin({n_expr})) - 1))"
    else:  # pragma: no cover - two known dialects
        raise ValueError(f"unknown dialect: {dialect}")
    e = f"(length(bin({n_expr})) - 1)"
    m = f"(CAST({n_expr} AS DOUBLE) / CAST({shift} AS DOUBLE))"
    t = f"(({m} - 1e0) / ({m} + 1e0))"
    u = f"({t} * {t})"
    # Horner over c_k = 1/(2k+1), k = 16 .. 0
    poly = repr(1.0 / 33.0) + "e0"
    for k in range(15, -1, -1):
        c = repr(1.0 / (2 * k + 1)) + "e0"
        poly = f"({c} + {u} * {poly})"
    ln_m = f"(2e0 * {t} * {poly})"
    inv_ln2 = repr(1.0 / __import__("math").log(2.0)) + "e0"
    return f"(CAST({e} AS DOUBLE) + {ln_m} * {inv_ln2})"
