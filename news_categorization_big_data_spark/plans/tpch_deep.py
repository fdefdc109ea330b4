"""TPC-H depth, second installment (Q7 / Q8 / Q13 / Q14 / Q15 / Q17 /
Q19 / Q22 shapes, adapted to the testdata's column subset): the
remaining macro-workload plan shapes the first installment
(plans/tpch.py) does not cover —

- Q7  bidirectional two-nation join with a disjunctive pair predicate,
- Q8  eight-table join tree feeding a conditional-share aggregate,
- Q13 outer-join + double aggregation (group the groups),
- Q14 conditional-numerator ratio over one scan,
- Q15 aggregate-then-argmax via a reused subplan (the VIEW shape),
- Q17 per-key scalar-average threshold (correlated scalar subquery),
- Q19 OR-of-ANDs disjunctive predicate pushdown,
- Q22 anti-join + global scalar-average threshold.

Adaptations (testdata lacks partsupp, l_shipmode/commitdate/receiptdate,
p_container, c_phone, comments): Q13 substitutes o_orderpriority for the
comment NOT-LIKE filter; Q17 uses (p_brand, p_size) for
(p_brand, p_container); Q19's triples range over (p_brand, p_size,
l_quantity); Q22 derives its "country code" from c_nationkey. Every
adapted predicate keeps the original query's PLAN shape — that is what
is being verified.

Determinism contract (same as plans/tpch.py): money factors quantize to
DECIMAL(18,2) before any arithmetic, sums reduce in decimal (exact,
order-independent), and doubles appear only in final casts or in
divisions whose operands are bit-identical in both engines. Threshold
comparisons against averages are rearranged into multiply-compare form
(5·qty·cnt < sum; bal·cnt > sum) so no engine ever divides.

Scale notes are per-query in the docstrings; plan shapes asserted in
tests/test_tpch_deep.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.exact import (
    dec_to_double,
    o_dec_to_double,
)
from news_categorization_big_data_spark.plans.relational import dsum
from news_categorization_big_data_spark.plans.registry import register
from news_categorization_big_data_spark.sources.tables import load_table

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_SHIP_LO = "1996-01-01"
Q7_SHIP_HI = "1998-01-01"

Q8_REGION = "AMERICA"
Q8_TYPE = "ECONOMY"
Q8_NATION = "NATION_3"
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"

Q13_EXCLUDED_PRIORITY = "1-URGENT"

Q14_SHIP_LO = "1997-01-01"
Q14_SHIP_HI = "1997-04-01"

Q15_SHIP_LO = "1997-01-01"
Q15_SHIP_HI = "1997-04-01"

Q17_BRAND = "Brand#1"
Q17_SIZE_MAX = 10

Q19_TRIPLES = (  # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 10, 30, 10, 30),
    ("Brand#3", 20, 50, 20, 40),
)

Q22_CODES = (0, 3, 5, 7, 9)  # c_nationkey % 10 buckets standing in for phone prefixes


def _d2(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


def _disc_price() -> Column:
    one = F.lit(1).cast("decimal(18,2)")
    return _d2("l_extendedprice") * (one - _d2("l_discount"))


_O_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)

#: Q8/Q14 conditional-sum numerators, hoisted so the oracle f-strings can
#: pass them through o_dec_to_double (nested same-quote strings are not
#: valid inside f-string expressions on this Python).
_O_Q8_NUM = (
    f"SUM(CASE WHEN nation = '{Q8_NATION}' THEN volume"
    " ELSE CAST(0 AS DECIMAL(18,2)) END)"
)
_O_Q14_NUM = (
    f"SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_O_DISC_PRICE}"
    " ELSE CAST(0 AS DECIMAL(18,2)) END)"
)


@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {o_dec_to_double("SUM(volume)", 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             {_O_DISC_PRICE} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
          OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
        AND l_shipdate >= TIMESTAMP '{Q7_SHIP_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q7_SHIP_HI} 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tier="B",
    doc="TPC-H Q7 (volume shipping): revenue between two nations in both "
    "directions, by year. The signature shape is the DISJUNCTIVE pair "
    "predicate across two aliases of the same dimension: each nation "
    "alias is pre-filtered to the two-value set (pushed to the "
    "broadcast build side, shrinking it to 2 rows), and the "
    "direction-pairing residual applies after the join — Catalyst "
    "cannot split an OR across tables, so pre-filtering each side to "
    "the union of operands is the scale move that keeps the fact scan "
    "sparse. Both 2-row nation aliases carry broadcast hints "
    "(SF-constant); supplier scales with SF so its join strategy is "
    "estimate-driven (broadcast at bench scale, shuffle at 100 TB); "
    "the lineitem fact shuffles once, on the aggregation keys.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(f"{Q7_SHIP_LO} 00:00:00").cast("timestamp")
    hi = F.lit(f"{Q7_SHIP_HI} 00:00:00").cast("timestamp")
    pair = [Q7_NATION_A, Q7_NATION_B]
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(pair))
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_suppkey", "l_shipdate", _disc_price().alias("volume"))
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        # supplier scales with SF — estimate-driven strategy only; the
        # two 2-row nation aliases stay pinned (SF-constant).
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B))
            | ((F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum("volume", 4).alias("revenue"))


@register(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           {o_dec_to_double(_O_Q8_NUM, 4)}
           / {o_dec_to_double("SUM(volume)", 4)} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             {_O_DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = '{Q8_REGION}' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '{Q8_DATE_LO} 00:00:00'
        AND o_orderdate <  TIMESTAMP '{Q8_DATE_HI} 00:00:00'
        AND p_type = '{Q8_TYPE}'
    ) all_nations
    GROUP BY o_year
    """,
    tier="B",
    doc="TPC-H Q8 (national market share): the deepest join tree in the "
    "suite — part, supplier, lineitem, orders, customer, two nation "
    "aliases, and region, eight relations feeding one conditional-share "
    "aggregate. Every dimension filter (p_type, r_name) is pushed into "
    "its own scan BEFORE the join, so the selective part filter prunes "
    "the fact early; SF-constant nation/region are hint-broadcast, "
    "while SF-scaling part/supplier are left to measured statistics "
    "(broadcast at bench scale, shuffle join at 100 TB) so the "
    "lineitem fact is never shuffled on a join key at any SF where the "
    "dims fit — its "
    "single shuffle is the final one-column groupBy(o_year). The market "
    "share divides two decimal-exact sums only after both are cast to "
    "double, so the ratio is bit-identical across engines.",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(f"{Q8_DATE_LO} 00:00:00").cast("timestamp")
    hi = F.lit(f"{Q8_DATE_HI} 00:00:00").cast("timestamp")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    n1 = (
        load_table(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _disc_price().alias("volume")
    )
    joined = (
        # part/supplier scale with SF — estimate-driven strategy only;
        # the nation aliases stay pinned (SF-constant).
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dec_to_double(
                F.sum(
                    F.when(F.col("nation") == Q8_NATION, F.col("volume")).otherwise(zero)
                ),
                4,
            ).alias("_num"),
            dsum("volume", 4).alias("_den"),
        )
        .select("o_year", (F.col("_num") / F.col("_den")).alias("mkt_share"))
    )


@register(
    "q_tpch_q13",
    oracle=f"""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tier="B",
    doc="TPC-H Q13 (customer distribution, adapted: the o_comment "
    "NOT-LIKE filter becomes an o_orderpriority exclusion — same "
    "join-conditioned residual placement): LEFT OUTER join so "
    "zero-order customers survive with c_count = 0, then a second "
    "aggregation that groups the group sizes. The exclusion predicate "
    "lives in the JOIN CONDITION, not a WHERE (a WHERE would turn the "
    "outer join inner and drop the zero bucket). Two shuffles by "
    "necessity (per-customer count, then distribution) — the second "
    "input is one row per customer, already far smaller. COUNT of a "
    "nullable key counts only matches, exactly the outer-join "
    "semantics the distribution needs.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q14",
    oracle=f"""
    SELECT 100.0 * {o_dec_to_double(_O_Q14_NUM, 4)}
                 / {o_dec_to_double(f"SUM({_O_DISC_PRICE})", 4)} AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '{Q14_SHIP_LO} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{Q14_SHIP_HI} 00:00:00'
    """,
    tier="B",
    doc="TPC-H Q14 (promotion effect): one date-pruned fact scan joined "
    "to the part dimension (estimate-driven broadcast while it fits — "
    "part scales with SF, so no pinned hint), reduced to a single "
    "conditional-numerator ratio row. The promo test rides ALONG the "
    "join (a CASE over the joined p_type), not as a filter — both "
    "branches come from one pass, so the fact is read once, not twice. "
    "Global aggregate means a one-row partial from every partition and "
    "a single-row final reduce: no keyed shuffle at all. Ratio divides "
    "two decimal-exact sums after double casts (bit-identical inputs).",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(f"{Q14_SHIP_LO} 00:00:00").cast("timestamp")
    hi = F.lit(f"{Q14_SHIP_HI} 00:00:00").cast("timestamp")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_partkey", _disc_price().alias("_dp"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        # part scales with SF: estimate-driven join strategy, no pin.
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dec_to_double(
                F.sum(
                    F.when(F.col("p_type").like("PROMO%"), F.col("_dp")).otherwise(zero)
                ),
                4,
            ).alias("_num"),
            dsum("_dp", 4).alias("_den"),
        )
        .select((F.lit(100.0) * F.col("_num") / F.col("_den")).alias("promo_revenue"))
    )


@register(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_O_DISC_PRICE}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_SHIP_LO} 00:00:00'
        AND l_shipdate <  TIMESTAMP '{Q15_SHIP_HI} 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, {o_dec_to_double("total_revenue", 4)} AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tier="B",
    doc="TPC-H Q15 (top supplier, the CREATE VIEW shape): a quarterly "
    "per-supplier revenue aggregate consumed TWICE — once for the "
    "global max, once to select the argmax rows — expressed as one "
    "DataFrame reused by both consumers, Spark's equivalent of the "
    "view. The revenue aggregate is supplier-cardinality (tiny), so "
    "its max is a broadcast one-row join, not a sort; ties all "
    "surface, per the spec. The argmax equality compares DECIMAL "
    "sums (exact), never doubles; the double appears only in the "
    "output cast. lineitem is scanned once per consumer — at scale, "
    "persist the revenue view to scan once total; here the aggregate "
    "is cheap and re-derivation keeps the plan pure.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit(f"{Q15_SHIP_LO} 00:00:00").cast("timestamp")
    hi = F.lit(f"{Q15_SHIP_HI} 00:00:00").cast("timestamp")
    revenue = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).alias("_total_dec"))
    )
    best = revenue.agg(F.max("_total_dec").alias("_best_dec"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        # best is a 1-row global max — provably bounded, hint stays.
        # supplier scales with SF — estimate-driven strategy only.
        revenue.join(F.broadcast(best), F.col("_total_dec") == F.col("_best_dec"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", dec_to_double(F.col("_total_dec"), 4).alias("total_revenue")
        )
    )


@register(
    "q_tpch_q17",
    oracle=f"""
    WITH pq AS (
      SELECT l_partkey AS pq_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pq_sum,
             COUNT(*) AS pq_cnt
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT {o_dec_to_double("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))", 2)} / 7.0
           AS avg_yearly
    FROM lineitem, part, pq
    WHERE p_partkey = l_partkey AND pq_partkey = l_partkey
      AND p_brand = '{Q17_BRAND}' AND p_size <= {Q17_SIZE_MAX}
      AND 5 * CAST(l_quantity AS DECIMAL(18,2)) * pq_cnt < pq_sum
    """,
    tier="B",
    doc="TPC-H Q17 (small-quantity-order revenue, adapted: p_container "
    "becomes p_size — same correlated shape): lineitems whose quantity "
    "is below 20% of their part's average quantity. The correlated "
    "scalar subquery (per-part AVG) decorrelates into a per-part "
    "aggregate joined back — and the threshold is REARRANGED into "
    "multiply-compare form (5·qty·cnt < sum, exact decimal/integer "
    "arithmetic) so neither engine ever divides. Scale shape: the part "
    "filter joins FIRST and prunes the fact, so the per-part "
    "aggregate runs over qualifying parts only instead of the whole "
    "fact — the decorrelated aggregate never becomes a second "
    "full-fact shuffle. Both part-cardinality frames scale with SF, so "
    "neither is hint-pinned: the planner broadcasts them from measured "
    "size at bench scale and shuffle-joins at 100 TB.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts_f = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == Q17_BRAND) & (F.col("p_size") <= Q17_SIZE_MAX))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", _d2("l_quantity").alias("_qty"), _d2("l_extendedprice").alias("_price")
    )
    # parts_f and the pq aggregate below are both part-cardinality —
    # they scale with SF, so neither carries a pinned broadcast hint;
    # Catalyst/AQE broadcast them from measured size while they fit.
    li_f = li.join(parts_f, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "_qty", "_price"
    )
    pq = li_f.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum("_qty").alias("pq_sum"), F.count(F.lit(1)).alias("pq_cnt")
    )
    five = F.lit(5).cast("decimal(18,2)")
    return (
        li_f.join(pq, F.col("l_partkey") == F.col("pq_partkey"))
        .where(five * F.col("_qty") * F.col("pq_cnt") < F.col("pq_sum"))
        .agg((dsum("_price", 2) / F.lit(7.0)).alias("avg_yearly"))
    )


def _q19_sql_disjunct() -> str:
    parts = []
    for brand, size_lo, size_hi, qty_lo, qty_hi in Q19_TRIPLES:
        parts.append(
            f"(p_brand = '{brand}' AND p_size BETWEEN {size_lo} AND {size_hi}"
            f" AND l_quantity BETWEEN {qty_lo} AND {qty_hi})"
        )
    return " OR ".join(parts)


@register(
    "q_tpch_q19",
    oracle=f"""
    SELECT {o_dec_to_double(f"SUM({_O_DISC_PRICE})", 4)} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ({_q19_sql_disjunct()})
    """,
    tier="B",
    doc="TPC-H Q19 (discounted revenue, adapted: the (brand, container, "
    "quantity) triples become (brand, size, quantity) — same OR-of-ANDs "
    "shape): a three-way disjunction whose conjuncts span BOTH join "
    "sides, the canonical disjunctive-pushdown test. Catalyst cannot "
    "push the OR itself across the join, so each side is pre-filtered "
    "to the UNION ENVELOPE of its operands (part to the three brands "
    "and the covering size range, lineitem to the covering quantity "
    "range) — the envelope predicates reach the parquet scans as "
    "PushedFilters, the shrunken part side broadcasts, and the exact "
    "disjunction applies as a residual after the join. One scan each, "
    "no shuffle beyond the single-row final aggregate.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    brands = [t[0] for t in Q19_TRIPLES]
    size_lo = min(t[1] for t in Q19_TRIPLES)
    size_hi = max(t[2] for t in Q19_TRIPLES)
    qty_lo = min(t[3] for t in Q19_TRIPLES)
    qty_hi = max(t[4] for t in Q19_TRIPLES)
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand").isin(brands) & F.col("p_size").between(size_lo, size_hi))
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity").between(qty_lo, qty_hi))
        .select("l_partkey", "l_quantity", _disc_price().alias("_dp"))
    )
    disjunct = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_TRIPLES:
        clause = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        disjunct = clause if disjunct is None else (disjunct | clause)
    return (
        # part scales with SF: estimate-driven join strategy, no pin.
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(disjunct)
        .agg(dsum("_dp", 4).alias("revenue"))
    )


@register(
    "q_tpch_q22",
    oracle=f"""
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum,
             COUNT(*) AS pos_cnt
      FROM customer
      WHERE c_acctbal > 0.0
        AND (c_nationkey % 10) IN {Q22_CODES!r}
    )
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           {o_dec_to_double("SUM(bal)", 2)} AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS INTEGER) AS cntrycode,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer, pos
      WHERE (c_nationkey % 10) IN {Q22_CODES!r}
        AND CAST(c_acctbal AS DECIMAL(18,2)) * pos_cnt > pos_sum
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ) custsale
    GROUP BY cntrycode
    """,
    tier="B",
    doc="TPC-H Q22 (global sales opportunity, adapted: the phone-prefix "
    "country code becomes c_nationkey % 10 — same shape): customers in "
    "selected country codes with above-average positive balances and NO "
    "orders. Three classic pieces in one plan: a global scalar "
    "aggregate (the average) consumed as a one-row broadcast, an "
    "ANTI-join against orders for the no-order test, and a final "
    "keyed aggregate. The average threshold is rearranged to "
    "bal·cnt > sum (decimal-exact multiply-compare, no division); the "
    "anti-join ships only o_custkey. At scale the orders side of an "
    "anti-join can pre-aggregate to distinct keys — Spark's left_anti "
    "already stops at the first match per key.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = list(Q22_CODES)
    cust = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_nationkey") % 10).isin(codes))
        .select(
            "c_custkey",
            (F.col("c_nationkey") % 10).cast("int").alias("cntrycode"),
            _d2("c_acctbal").alias("bal"),
        )
    )
    pos = cust.where(F.col("bal") > 0).agg(
        F.sum("bal").alias("pos_sum"), F.count(F.lit(1)).alias("pos_cnt")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(pos))
        .where(F.col("bal") * F.col("pos_cnt") > F.col("pos_sum"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("bal", 2).alias("totacctbal"),
        )
    )
