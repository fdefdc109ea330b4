"""Deterministic sampling/splitting contracts (operators/sampling.py):
partition-invariance, growth stability (no train/test leakage on
append), proportion tolerance, and per-stratum fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_categorization_big_data_spark.operators.sampling import (
    assign_split,
    hash_sample,
    stratified_sample,
)


def _ids(n):
    return [(i,) for i in range(n)]


def test_split_partition_invariant(spark):
    """The property RNG-based randomSplit lacks: assignment must not
    depend on physical partitioning."""
    df1 = spark.createDataFrame(_ids(2000), "doc_id long").repartition(1)
    df32 = spark.createDataFrame(_ids(2000), "doc_id long").repartition(32)
    a = {r.doc_id: r.split for r in assign_split(df1).collect()}
    b = {r.doc_id: r.split for r in assign_split(df32).collect()}
    assert a == b


def test_split_stable_under_growth(spark):
    """Appending documents never reassigns existing ones — the
    leakage-free property for long-lived training corpora."""
    small = assign_split(spark.createDataFrame(_ids(1000), "doc_id long"))
    big = assign_split(spark.createDataFrame(_ids(3000), "doc_id long"))
    a = {r.doc_id: r.split for r in small.collect()}
    b = {r.doc_id: r.split for r in big.collect()}
    assert all(b[i] == a[i] for i in a)


def test_split_proportions_and_totality(spark):
    df = assign_split(spark.createDataFrame(_ids(10000), "doc_id long"))
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10000  # total: every row exactly one split
    assert abs(counts["train"] / 10000 - 0.8) < 0.02
    assert abs(counts["val"] / 10000 - 0.1) < 0.01
    assert abs(counts["test"] / 10000 - 0.1) < 0.01


def test_hash_sample_fraction_and_subset(spark):
    df = spark.createDataFrame(_ids(10000), "doc_id long")
    kept = hash_sample(df, "doc_id", fraction_bp=1500)
    n = kept.count()
    assert abs(n / 10000 - 0.15) < 0.02
    # monotone: a smaller fraction is a strict subset of a larger one
    smaller = {r.doc_id for r in hash_sample(df, "doc_id", fraction_bp=500).collect()}
    larger = {r.doc_id for r in kept.collect()}
    assert smaller <= larger


def test_stratified_fractions_per_stratum(spark):
    rows = [(i, "en" if i % 2 == 0 else ("es" if i % 4 == 1 else "de")) for i in range(8000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "doc_id", "lang", {"en": 2000, "es": 5000}, default_bp=10_000
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] / 4000 - 0.2) < 0.03
    assert abs(got["es"] / 2000 - 0.5) < 0.04
    assert got["de"] == 2000  # default keeps the long tail in full


def test_batch_assign_invariants(spark):
    from news_categorization_big_data_spark.operators.batching import assign_batches

    rows = [(i, " ".join(["w"] * (5 + (i * 7) % 200))) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = assign_batches(df).collect()
    assert sum(r.n_docs for r in out) == 3000  # totality: every doc in a batch
    for r in out:
        assert r.max_tokens <= r.bucket  # bucket is a true length ceiling
        assert r.padding_waste >= 0
        assert r.padding_waste == r.n_docs * r.max_tokens - r.sum_tokens
    # deterministic under repartitioning (hash membership, no row_number)
    again = assign_batches(df.repartition(17)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mixture_sample_hits_target_shares(spark):
    from news_categorization_big_data_spark.operators.sampling import (
        mixture_fractions,
        mixture_sample,
    )

    rows = [(i, "a" if i % 10 < 6 else ("b" if i % 10 < 9 else "c")) for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    # counts: a=6000, b=3000, c=1000; target 50/30/20 → c binds (1000/200
    # is the scarcest relative share), T=5000: a→2500 (frac .4167), b→1500
    fr = {r.domain: r.frac_bp for r in mixture_fractions(df, "domain", {"a": 500, "b": 300, "c": 200}).collect()}
    assert fr["c"] == 10_000  # binding domain keeps everything
    assert abs(fr["a"] - 4166) <= 1 and fr["b"] == 5000
    kept = mixture_sample(df, "doc_id", "domain", {"a": 500, "b": 300, "c": 200})
    got = {r.domain: r.n for r in kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    assert got["c"] == 1000
    assert abs(got["a"] / total - 0.5) < 0.03 and abs(got["b"] / total - 0.3) < 0.03
    # excluded domains are dropped entirely
    none_kept = mixture_sample(df, "doc_id", "domain", {"a": 1000})
    assert {r.domain for r in none_kept.select("domain").distinct().collect()} == {"a"}


def test_mixture_binding_domain_keeps_everything(spark):
    """The scarcest-relative-to-target domain must keep exactly 10000 bp
    (100%) — the rounded-product formulation lands on 9999 for ~7% of
    (count, weight) pairs (e.g. count=7, weight=300), silently dropping
    a hash bucket of the binding source."""
    from news_categorization_big_data_spark.operators.sampling import (
        mixture_fractions,
    )

    rows = [(i, "scarce") for i in range(7)] + [(100 + i, "rich") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    fracs = {
        r["source"]: r["frac_bp"]
        for r in mixture_fractions(df, "source", {"scarce": 300, "rich": 100}).collect()
    }
    assert fracs["scarce"] == 10000, fracs
    assert 0 < fracs["rich"] < 10000
