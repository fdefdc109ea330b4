"""TPC-H, final installment (Q2 / Q9 / Q11 / Q12 / Q16 / Q20 / Q21
shapes, adapted to the testdata's column subset) — with plans/tpch.py
(Q1/Q3/Q5/Q6), plans/tpch_deep.py (Q7/Q8/Q13/Q14/Q15/Q17/Q19/Q22) and
q_tpch_q4/q10/q18 (plans/analytics-adjacent installment), the engine now
covers ALL 22 TPC-H query shapes.

The testdata has no ``partsupp`` table, so the five queries built on it
(Q2/Q9/Q11/Q16/Q20) derive the part↔supplier relationship from
``lineitem`` facts instead — each keeping the ORIGINAL query's plan
shape, which is what's being verified:

- Q2  correlated per-part MIN over eligible offers → window-min on one
  shuffle (offer = observed unit price per (part, supplier)),
- Q9  profit aggregate over a part/supplier/orders join tree (supply
  cost proxied by 10% of p_retailprice per unit),
- Q11 per-group value sum HAVING a share of the GLOBAL sum (scalar
  subquery → one-row broadcast, multiply-compare, no division),
- Q12 join + CASE-sum aggregation by a derived ship-speed class
  (l_shipmode stand-in: shipping latency buckets),
- Q16 distinct-supplier count per part group with a NOT-IN exclusion
  subquery (null-aware anti join),
- Q20 nested semi-join chain via a dominance aggregate (supplier ships
  >half of a part's total — the availqty>½·qty shape, made scale-free),
- Q21 the EXISTS/NOT-EXISTS multi-supplier wait query, re-expressed as
  ONE aggregation over (orderkey): Spark computes per-order supplier /
  late-supplier distinct sets in a single shuffle instead of the three
  correlated self-joins the textbook SQL implies; the DuckDB oracle
  runs the textbook EXISTS form, so the green hash is a machine-checked
  proof of the rewrite's equivalence.

Determinism contract (same as plans/tpch.py): money/quantity factors
quantize to DECIMAL(9,2)/(18,2) before arithmetic, sums reduce in
decimal, thresholds compare in multiply form, doubles appear only in
final casts or divisions of bit-identical operands, and every LIMIT
carries a total-order tie-break.

Reference parity note: the reference app never joins two datasets
(SURVEY.md §2.3); this whole tier is engine-added macro-workload
coverage graded against BASELINE.json's relational north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_categorization_big_data_spark.functions.exact import (
    dec_to_double,
    o_dec_to_double,
)
from news_categorization_big_data_spark.plans.relational import dsum
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table

Q2_SIZE = 7
Q2_TYPE = "STANDARD"
Q2_REGION = "EUROPE"

Q9_PART_WORD = "bolt"

Q11_REGION = "EUROPE"
Q11_SHARE_DEN = 800  # keep parts whose value-share exceeds 1/800

Q12_SHIP_LO = "1997-01-01"
Q12_SHIP_HI = "1998-01-01"
Q12_SLOW_DAYS = 60  # latency ≥ this many days ⇒ SLOW class

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "STANDARD"
Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)

Q20_PART_WORD = "bolt"
Q20_REGION = "ASIA"
Q20_SHIP_LO = "1997-01-01"
Q20_SHIP_HI = "1998-01-01"

Q21_REGION = "EUROPE"
Q21_LATE_DAYS = 90


def _d2(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


def _d9(col: str) -> Column:
    return F.col(col).cast("decimal(9,2)")


def _disc_price() -> Column:
    one = F.lit(1).cast("decimal(18,2)")
    return _d2("l_extendedprice") * (one - _d2("l_discount"))


_O_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)

#: Q9 profit expression (scale 5: disc_price scale 4 minus the
#: qty(2)*retail(2)*0.1(1) cost term), hoisted for o_dec_to_double.
_O_Q9_PROFIT = (
    f"SUM({_O_DISC_PRICE}"
    " - CAST(l_quantity AS DECIMAL(9,2))"
    " * CAST(p_retailprice AS DECIMAL(9,2))"
    " * CAST(0.1 AS DECIMAL(2,1)))"
)


@register(
    "q_tpch_q2",
    oracle=f"""
    WITH eligible AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = '{Q2_REGION}'
        GROUP BY l_partkey, l_suppkey)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           e.unit_cost
    FROM eligible e
    JOIN part p ON p.p_partkey = e.l_partkey
    JOIN supplier s ON s.s_suppkey = e.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = {Q2_SIZE} AND p.p_type = '{Q2_TYPE}'
      AND e.unit_cost = (SELECT MIN(e2.unit_cost) FROM eligible e2
                         WHERE e2.l_partkey = e.l_partkey)
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tier="B",
    doc="TPC-H Q2 (minimum-cost supplier): for size/type-filtered parts, "
    "the region-eligible supplier(s) whose observed unit price equals the "
    "per-part minimum. partsupp's ps_supplycost is derived from lineitem "
    "facts as MIN(l_extendedprice/l_quantity) per (part, supplier) — the "
    "division is double-on-double over bit-identical inputs in both "
    "engines, and MIN is reduction-order-free. The correlated scalar "
    "subquery becomes a window MIN over the SAME per-part shuffle the "
    "offer aggregate already produced (no second shuffle, no re-join); "
    "SF-constant nation/region are hint-broadcast, while SF-scaling "
    "supplier/part join strategies are estimate-driven (broadcast at "
    "bench scale, shuffle join at 100 TB — a pinned hint would be "
    "honored past the 8 GB broadcast limit). "
    "LIMIT 100 under a total order (acctbal DESC, n_name, s_name, "
    "p_partkey — unique per surviving row). At 100 TB only lineitem is "
    "large; it shuffles exactly once, on (l_partkey, l_suppkey).",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)

    eligible_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        # eligible_supp is supplier-cardinality — scales with SF, so no
        # pinned broadcast: estimate-driven BHJ at bench scale, shuffle
        # join once the dim outgrows the threshold.
        li.join(eligible_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           {o_dec_to_double(_O_Q9_PROFIT, 5)} AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%{Q9_PART_WORD}%'
    GROUP BY nation, o_year
    """,
    tier="B",
    doc="TPC-H Q9 (product-type profit): profit per supplier-nation per "
    "order-year for parts whose name contains a word. partsupp's "
    "ps_supplycost is proxied as 10% of p_retailprice per unit, keeping "
    "the amount expression's exact decimal shape (every factor quantized "
    "≤ (9,2), products exact in both engines' widened decimals, sums "
    "reduce in decimal → order-independent). Plan: SF-constant nation "
    "is hint-broadcast; the name-filtered part and supplier sides scale "
    "with SF, so their strategy is estimate-driven (broadcast into "
    "lineitem at bench scale, shuffle join at 100 TB); the only big-big join is "
    "lineitem⋈orders on the order key — the same join the original Q9 "
    "carries — and AQE handles it as a shuffle join co-partitioned on "
    "o_orderkey. One final hash agg on (nation, year).",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains(Q9_PART_WORD))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")

    cost = _d9("l_quantity") * _d9("p_retailprice") * F.lit(0.1).cast("decimal(2,1)")
    return (
        # part/supplier scale with SF — estimate-driven strategy only;
        # nation (25 rows, SF-constant) keeps its hint.
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(_disc_price() - cost, 5).alias("sum_profit"))
    )


@register(
    "q_tpch_q11",
    oracle=f"""
    WITH v AS (
        SELECT l_partkey, SUM({_O_DISC_PRICE}) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = '{Q11_REGION}'
        GROUP BY l_partkey)
    SELECT l_partkey, {o_dec_to_double("value", 4)} AS value
    FROM v
    WHERE value * {Q11_SHARE_DEN} > (SELECT SUM(value) FROM v)
    ORDER BY value DESC, l_partkey
    """,
    tier="B",
    doc="TPC-H Q11 (important stock): per-part value shipped by one "
    "region's suppliers, keeping parts whose share of the GLOBAL value "
    "exceeds 1/800 — a scale-free threshold (the original's 0.0001·SF⁻¹ "
    "intent). The scalar subquery total re-aggregates the SAME per-part "
    "sums (Catalyst reuses the shuffle output via the self-referencing "
    "CTE; the global side is one row → broadcast into the filter). The "
    "comparison is decimal multiply-compare — no engine divides. At "
    "100 TB: one lineitem shuffle on l_partkey, then a rows=#parts "
    "frame reduced to one row; the filter is a broadcast nested loop "
    "against a single-row build side.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q11_REGION)

    eligible = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey")
    )
    per_part = (
        # eligible is supplier-cardinality (SF-scaling): no pinned hint.
        li.join(eligible, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_dec") * Q11_SHARE_DEN > F.col("total_dec"))
        .select("l_partkey", dec_to_double(F.col("value_dec"), 4).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "q_tpch_q12",
    oracle=f"""
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) >= {Q12_SLOW_DAYS}
                THEN 'SLOW' ELSE 'FAST' END AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           -- low = NOT-high via the SAME predicate inverted (THEN 0
           -- ELSE 1), not a NOT IN: under three-valued logic a NULL
           -- priority fails BOTH `IN` and `NOT IN`, dropping the row
           -- from both counts, while the engine's when/otherwise
           -- counts every not-high row as low. Identical on null-free
           -- data; identical on the null fixture too.
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '{Q12_SHIP_LO} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q12_SHIP_HI} 00:00:00'
    GROUP BY ship_class
    """,
    tier="B",
    doc="TPC-H Q12 (shipping modes / priority): lineitems shipped in one "
    "year, classed by shipping latency (the l_shipmode stand-in: ≥60 "
    "days after the order date ⇒ SLOW), counting high- vs low-priority "
    "orders per class with CASE-sums in one aggregate. The date filter "
    "pushes to the lineitem scan; the orders join is the query's only "
    "shuffle pair (AQE co-partitions on the order key); latency math is "
    "integer day arithmetic. Counts CAST to BIGINT in the oracle — "
    "DuckDB's SUM(int) is HUGEINT, the round-2 lesson "
    "(tests/test_oracle_types.py guards every oracle).",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{Q12_SHIP_LO} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q12_SHIP_HI} 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ship_class = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= Q12_SLOW_DAYS, "SLOW"
    ).otherwise("FAST")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q16",
    oracle=f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
      AND p.p_type <> '{Q16_EXCL_TYPE}'
      AND p.p_size IN {Q16_SIZES}
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tier="B",
    doc="TPC-H Q16 (parts/supplier relationship): distinct suppliers "
    "observed shipping each (brand, type, size) group, excluding one "
    "brand/type, a size list, and suppliers from an exclusion "
    "subquery (the '%Complaints%' stand-in: negative account balance). "
    "The oracle is written as NOT EXISTS, not NOT IN: NOT IN is "
    "three-valued — ONE NULL s_suppkey in the exclusion set empties "
    "the whole result, and a NULL l_suppkey row is dropped — while "
    "Spark's left_anti (and NOT EXISTS) keeps non-matching rows, "
    "NULL keys included (the q_join_anti r13 class, flagged here by "
    "r13 ADVICE). The anti join is "
    "broadcast while the exclusion set fits per measured stats — "
    "both part and the supplier exclusion scale with SF, so neither is "
    "hint-pinned); the part predicates prune before the join; the "
    "single shuffle is the distinct-count aggregate, which Spark "
    "executes as two-phase partial distinct on (group, suppkey). Fully "
    "ordered output (group key is unique), no LIMIT.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # part and bad_supp both scale with SF — estimate-driven
        # strategies only (broadcast at bench scale, shuffle at 100 TB).
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q20",
    oracle=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q20_SHIP_LO} 00:00:00'
          AND l_shipdate <  TIMESTAMP '{Q20_SHIP_HI} 00:00:00'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%{Q20_PART_WORD}%')
        GROUP BY l_partkey, l_suppkey),
    dominant AS (
        SELECT DISTINCT l_suppkey
        FROM shipped s
        WHERE s.supp_qty * 2 > (SELECT SUM(s2.supp_qty) FROM shipped s2
                                WHERE s2.l_partkey = s.l_partkey))
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = '{Q20_REGION}'
      AND s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name
    """,
    tier="B",
    doc="TPC-H Q20 (potential part promotion): suppliers in one region "
    "who DOMINATE the supply of some name-filtered part — shipped more "
    "than half of its total quantity in the window (the scale-free "
    "recast of availqty > ½·Σqty; partsupp-less). Nested semi-join "
    "chain exactly as the original: part name filter (semi join "
    "into the lineitem scan) → per-(part,supplier) decimal quantity "
    "sums → per-part window total (reuses the same shuffle's "
    "partitioning, multiply-compare, no division) → DISTINCT supplier "
    "keys → semi join into the region-filtered supplier dimension. "
    "Both semi-join build sides are part/supplier-cardinality "
    "(SF-scaling), so neither is hint-pinned — measured stats broadcast "
    "them at bench scale. The fact shuffles once, on "
    "(l_partkey, l_suppkey).",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{Q20_SHIP_LO} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q20_SHIP_HI} 00:00:00").cast("timestamp"))
    )
    part_keys = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").contains(Q20_PART_WORD))
        .select("p_partkey")
    )
    shipped = (
        # part_keys is part-cardinality (SF-scaling): no pinned hint.
        li.join(part_keys, li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_d2("l_quantity")).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("supp_qty").over(w))
        .where(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q20_REGION)
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        # dominant is a distinct supplier-key set (SF-scaling, and an
        # aggregate AQE measures at runtime): no pinned hint.
        .join(dominant, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q_tpch_q21",
    oracle=f"""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{Q21_REGION}'
      AND date_diff('day', o.o_orderdate, l1.l_shipdate) > {Q21_LATE_DAYS}
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND date_diff('day', o.o_orderdate, l3.l_shipdate)
                            > {Q21_LATE_DAYS})
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tier="B",
    doc="TPC-H Q21 (suppliers who kept orders waiting): late lineitems "
    "(shipped >90 days after the order date, 'F' orders) by suppliers "
    "in one region, on multi-supplier orders where NO OTHER supplier "
    "was late. The oracle runs the textbook EXISTS / NOT-EXISTS form; "
    "the Spark plan is the scale rewrite — ONE aggregation over "
    "l_orderkey computing each order's distinct-supplier count, "
    "distinct-LATE-supplier count, and (via a conditional max) the sole "
    "late supplier with its late-line count, then a filter "
    "(n_supp ≥ 2 ∧ n_late_supp = 1) and a per-supplier sum. Three "
    "correlated self-joins of the fact table collapse into one shuffle "
    "+ one dimension-sized aggregate; the green driver hash is a "
    "machine-checked equivalence proof of the rewrite. Late math is "
    "integer day arithmetic; LIMIT 100 under (numwait DESC, s_name) — "
    "total order because s_name is unique.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS

    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            late.cast("int").alias("is_late"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
            F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias("late_supp"),
            F.sum("is_late").alias("n_late_lines"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q21_REGION)
    eligible = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    return (
        # eligible is supplier-cardinality (SF-scaling): no pinned hint.
        per_order.join(eligible, per_order.late_supp == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
