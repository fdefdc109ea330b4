"""Metamorphic partition-invariance sweep: a deterministic operator
must produce IDENTICAL results regardless of shuffle width or input
split size — the two knobs a cluster retunes most often. This is the
class of bug the DuckDB oracle cannot catch (both runs could be
'consistently wrong' under one partitioning), and it specifically
hunts order-sensitive constructs: collect_list without a sort,
first()/last() on non-singleton groups, limit without a full ordering,
float sums whose reduction order leaks into the output.

The sweep runs each representative query under (a) the test default,
(b) shuffle.partitions=3, (c) shuffle.partitions=57 with 64 KiB input
splits (forcing many small scan partitions), and asserts canonical
equality. Representatives were chosen for order-sensitivity risk, one
per construct family."""

from __future__ import annotations

import math

import pytest

from news_categorization_big_data_spark.plans import REGISTRY

#: One per order-sensitivity family: collect_list, ranked window,
#: TakeOrdered limit, LSH bucketing, first()-in-dedup + CC pipeline,
#: session windows, bigram LM join, exact heavy hitters, duration
#: windows, rank fusion, cumulative packing, iterative graph state,
#: gated collect, Poisson lanes, union-window as-of, postings agg.
SWEEP = [
    "q_group_collect",
    "q_topk_per_group",
    "q_sample_wor",
    "q_dedup_near",
    "q_pipeline_curate",
    "q_stream_session",
    "q_doc_fluency",
    "q_heavy_hitters",
    "q_twap",
    "q_rrf_fusion",
    "q_pack_sequences",
    "q_graph_pagerank",
    "q_inverted_index",
    "q_bootstrap_ci",
    "q_asof_join",
]


def _canon(df):
    def render(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return repr(v)

    return sorted(
        tuple(render(v) for v in row) for row in df.collect()
    )


@pytest.mark.parametrize("name", SWEEP)
def test_partition_invariance(name, spark, sf_dir):
    spec = REGISTRY[name]
    base = _canon(spec.builder(spark, sf_dir))
    assert base, name
    knobs = [
        {"spark.sql.shuffle.partitions": "3"},
        {
            "spark.sql.shuffle.partitions": "57",
            "spark.sql.files.maxPartitionBytes": "65536",
        },
    ]
    for conf in knobs:
        old = {k: spark.conf.get(k) for k in conf}
        try:
            for k, v in conf.items():
                spark.conf.set(k, v)
            assert _canon(spec.builder(spark, sf_dir)) == base, (name, conf)
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)
