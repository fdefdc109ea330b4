"""Custom connector on Spark 4's Python Data Source API: a
deterministic sharded document generator.

The reference consumes external feeds through ad-hoc Python loops
(raw_news_to_telegram.py:36-64); the engine's equivalent extension
point is a REGISTERED data source: schema declaration, driver-side
partition planning (one InputPartition per shard → the scan
parallelizes across executors with no driver materialization), and
filter pushdown (`pushFilters` prunes whole shards for shard-equality
predicates before any row is generated — the Python-source analog of
parquet partition pruning).

Rows are a pure function of (row id), so the source is exactly
oracle-checkable: id, shard = id % shards, payload = 'doc_<id>', and
h = (id·1103515245 + 12345) mod 2³¹ — an LCG step in BIGINT-safe
range, reproducible in any engine.

Usage::

    spark.dataSource.register(DocGenDataSource)
    spark.read.format("docgen").option("rows", 10000).load()
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

#: LCG constants (glibc rand): BIGINT-safe for id < 2^32.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648

DOCGEN_SCHEMA = "id bigint, shard int, payload string, h bigint"


class _ShardPartition(InputPartition):
    def __init__(self, shard: int) -> None:
        self.shard = shard


class DocGenReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.shards = int(options.get("shards", 8))
        self.keep_shards: set[int] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Accept shard-equality predicates (EqualTo / In on `shard`):
        matching shards survive, every other partition is never planned.
        All other filters are returned as unsupported — Spark keeps
        evaluating them post-scan, so pushdown is a pure optimization,
        never a semantics change."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                vals = {int(f.value)}
            elif isinstance(f, In) and f.attribute == ("shard",):
                vals = {int(v) for v in f.value}
            else:
                yield f
                continue
            self.keep_shards = (
                vals if self.keep_shards is None else self.keep_shards & vals
            )

    def partitions(self) -> list[InputPartition]:
        shards = range(self.shards)
        if self.keep_shards is not None:
            shards = [s for s in shards if s in self.keep_shards]
        return [_ShardPartition(s) for s in shards]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        s = partition.shard
        for i in range(s, self.rows, self.shards):
            yield i, s, f"doc_{i}", (i * LCG_A + LCG_C) % LCG_M


class DocGenDataSource(DataSource):
    """See module docstring. ``name()`` is the format string."""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return DOCGEN_SCHEMA

    def reader(self, schema) -> DocGenReader:
        return DocGenReader(self.options)
