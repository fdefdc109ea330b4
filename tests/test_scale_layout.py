"""Physical-layout scale techniques: bucketed joins must produce
exchange-free plans; salted joins/aggregations must equal their unsalted
counterparts exactly (SURVEY.md §4.2 / the 100-TB design rules)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_categorization_big_data_spark.functions.scale import (
    read_bucketed,
    salted_join,
    salted_sum,
    write_bucketed,
    write_partitioned,
)
from news_categorization_big_data_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Pre-bucketing both sides on the join key makes the recurring join
    shuffle-free: the write pays the shuffle once, every later join runs
    on co-located buckets. (Managed tables land in the session's default
    warehouse — dropped, and gitignored, below.)"""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", ["o_orderkey"], 8
        )
        # At sf0.001 the planner would just broadcast the small side (and
        # rightly so); disable broadcast to surface the shuffle behavior
        # the bucketing exists to eliminate at fact-⋈-fact scale.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        joined = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"), "o_orderkey"
        )
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "Bucketed: true" in plan, f"scan did not use buckets:\n{plan}"

        # and it computes the same thing as the plain join
        plain = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_static(spark, sf_dir, tmp_path):
    """A filter on the partition column must become directory pruning
    (PartitionFilters), not a data filter over every file."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])

    read = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = _plan(read)
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters")[1][:120], plan
    want = docs.where(F.col("lang") == "en").count()
    assert read.count() == want and want > 0


def test_partitioned_write_prunes_dynamic(spark, sf_dir, tmp_path):
    """Joining the partitioned fact to a FILTERED dimension must inject a
    dynamic partition pruning subquery into the fact scan."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang_dpp")
    write_partitioned(docs, path, ["lang"])

    dim = docs.select("lang").distinct().where(F.col("lang").isin("en", "de"))
    fact = spark.read.parquet(path)
    joined = fact.join(dim, "lang")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), f"no DPP subquery in:\n{plan}"
    assert joined.count() == docs.where(F.col("lang").isin("en", "de")).count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey")
    salted = salted_join(orders, customer, "o_custkey", salt_buckets=4)
    assert salted.count() == plain.count()
    # spot-check content equality, not just cardinality
    key = F.concat_ws("|", "o_custkey", F.col("o_totalprice").cast("string"), "c_name")
    assert (
        plain.select(key.alias("k")).exceptAll(salted.select(key.alias("k"))).count() == 0
    )


def test_salted_join_rejects_right_preserving(spark, sf_dir):
    import pytest

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(orders, customer, "o_custkey", how=how)


def test_salted_sum_matches_plain_sum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # integer-cents domain so the comparison is exact under reordering
    cents = (F.col("value") * 100).cast("long")
    plain = {
        r.event_type: r.total
        for r in ev.groupBy("event_type").agg(F.sum(cents).alias("total")).collect()
    }
    salted = {
        r.event_type: r.total
        for r in salted_sum(ev, ["event_type"], cents, "total", salt_buckets=4).collect()
    }
    assert salted == plain


def test_map_only_queries_have_no_exchange(spark, sf_dir):
    """The curation/scoring queries documented as map-only must stay
    shuffle-free: one Exchange creeping into a per-row pass is the
    difference between linear scan and cluster-wide repartition at
    100 TB."""
    from news_categorization_big_data_spark.plans import REGISTRY

    for name in [
        "q_classify_keywords",
        "q_split_train_eval",
        "q_sample_stratified",
        "q_quality_filter",
        "q_text_clean",
        "q_doc_fingerprint",
        "q_quality_score",
        "q_token_count",
        "q_repetition_stats",
        "q_pii_scrub",
    ]:
        plan = _plan(REGISTRY[name].builder(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} is no longer map-only:\n{plan}"
