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

The same source also registers a STREAMING reader (Spark 4
``simpleStreamReader``): offsets are row ids, micro-batches emit
``rowsPerBatch`` rows, and because rows are a pure function of id,
``readBetweenOffsets`` replays any committed range bit-identically —
the property exactly-once recovery needs (stream == batch is asserted
in tests/test_streaming.py).

Usage::

    spark.dataSource.register(DocGenDataSource)
    spark.read.format("docgen").option("rows", 10000).load()
    spark.readStream.format("docgen").option("rows", 10000).load()
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
    SimpleDataSourceStreamReader,
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

    def simpleStreamReader(self, schema) -> "DocGenStreamReader":
        return DocGenStreamReader(self.options)


class DocGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic row function.

    Offsets are row ids (``{"id": n}``): ``read(start)`` emits
    ``rowsPerBatch`` rows and advances; ``readBetweenOffsets`` replays
    any committed range bit-identically (rows are a pure function of
    id — the property that makes exactly-once recovery trivial: a
    failed micro-batch re-reads the SAME rows, so the sink's
    idempotence story composes). The stream is bounded by ``rows`` so
    ``processAllAvailable`` terminates in tests; production feeds drop
    the bound and the offset grows forever, checkpointed by Spark.
    """

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.shards = int(options.get("shards", 8))
        self.batch = int(options.get("rowsPerBatch", 250))

    def initialOffset(self) -> dict:
        return {"id": 0}

    def _gen(self, start: int, end: int) -> Iterator[tuple]:
        # A list_iterator, not a generator: the simple-reader protocol
        # prefetches driver-side and PICKLES the iterator for executor
        # replay — generators can't pickle, lists aren't iterators;
        # iter(list) is both.
        return iter(
            [
                (i, i % self.shards, f"doc_{i}", (i * LCG_A + LCG_C) % LCG_M)
                for i in range(start, end)
            ]
        )

    def read(self, start: dict):
        s = int(start["id"])
        e = min(s + self.batch, self.rows)
        return self._gen(s, e), {"id": e}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._gen(int(start["id"]), int(end["id"]))
