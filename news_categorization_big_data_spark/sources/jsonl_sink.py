"""Custom Python Data Source SINK: transactional JSONL writer.

The reference's output side is push-based connectors — Mongo point
inserts and Kafka/Telegram fan-out (news_categorization_streaming.py:
121-170, news_summarization_batch.py:121-127) — with no transactional
story: a mid-batch crash leaves partial writes. This sink re-expresses
that surface Spark-natively through the Python Data Source writer API
(batch AND streaming), with the two properties a 100-TB pipeline
actually needs:

- **All-or-nothing batch commit.** Tasks stage `part-*.jsonl` files
  under `_staging/` and return their names as commit messages; only the
  DRIVER's commit() moves them into the target directory and writes a
  `_SUCCESS` manifest listing exactly the committed files. abort()
  deletes the staged files. A reader that honors the manifest (see
  `read_committed`) can never observe a torn write — the same
  manifest-commit design as Hadoop's FileOutputCommitter v1 and the
  lakehouse table formats, chosen over rename-on-task-commit because
  task retries may double-stage but only the driver's single commit
  publishes.

- **Idempotent streaming batches.** The stream writer namespaces each
  micro-batch's manifest as `_SUCCESS-<epochId>`; a replayed epoch
  (checkpoint recovery re-runs the last batch) re-stages fresh part
  files but its commit sees the existing manifest and publishes
  NOTHING — exactly-once output from an at-least-once replay, the
  sink-side half of the foreachBatch idempotency quirk fix
  (streaming/topology.py).

Scale notes: tasks write straight to their own staged file (no driver
data movement — commit messages carry file NAMES, not rows); the
driver commit is O(files) renames, the classic object-store commit
cost, which is why manifests list files instead of renaming into
place one by one on S3-like stores.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _StagedFile(WriterCommitMessage):
    name: str
    rows: int


def _stage_rows(path: str, iterator) -> _StagedFile:
    """Task side: serialize every row of this partition to one staged
    JSONL file. Returns the staged name for the driver's commit."""
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(staging, name), "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str, sort_keys=True))
            f.write("\n")
            n += 1
    return _StagedFile(name=name, rows=n)


def _publish(path: str, messages, manifest: str) -> bool:
    """Driver side: move staged files into place and write the manifest
    naming them. Returns False (publishing nothing) if the manifest
    already exists — the idempotent-replay guard."""
    mpath = os.path.join(path, manifest)
    if os.path.exists(mpath):
        for m in messages:  # replayed epoch: discard the re-staged files
            _discard(path, m)
        return False
    names = []
    for m in messages:
        if m is None:  # speculative/failed task with no message
            continue
        os.replace(
            os.path.join(path, "_staging", m.name), os.path.join(path, m.name)
        )
        names.append({"name": m.name, "rows": m.rows})
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"files": names}, f)
    os.replace(tmp, mpath)  # manifest appears atomically
    return True


def _discard(path: str, m) -> None:
    if m is None:
        return
    try:
        os.remove(os.path.join(path, "_staging", m.name))
    except FileNotFoundError:
        pass


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a 'path' option")

    def write(self, iterator) -> _StagedFile:
        return _stage_rows(self.path, iterator)

    def commit(self, messages) -> None:
        _publish(self.path, messages, "_SUCCESS")

    def abort(self, messages) -> None:
        for m in messages:
            _discard(self.path, m)


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlsink requires a 'path' option")

    def write(self, iterator) -> _StagedFile:
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.path, messages, f"_SUCCESS-{batchId}")

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            _discard(self.path, m)


class JsonlSinkDataSource(DataSource):
    """`df.write.format("jsonlsink").option("path", dir).save()` and
    `df.writeStream.format("jsonlsink")...` after
    `spark.dataSource.register(JsonlSinkDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> JsonlSinkStreamWriter:
        return JsonlSinkStreamWriter(self.options)


def read_committed(spark, path: str, schema=None):
    """Manifest-honoring reader: only files named by a `_SUCCESS*`
    manifest are visible — staged or orphaned part files are not.
    (spark.read.json over the raw directory would read torn output.)

    ``schema`` (optional DDL string or StructType) makes the read-back
    independent of inference — REQUIRED for the empty-commit case: a
    job that legitimately wrote zero rows commits a manifest naming no
    files, and schema inference over nothing has nothing to infer (the
    /tmp/skew6 empty-input sweep hit exactly this). Without a schema
    the empty commit still raises, as before."""
    names: list[str] = []
    manifests = 0
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_SUCCESS") and not entry.endswith(".tmp"):
            manifests += 1
            with open(os.path.join(path, entry)) as f:
                names.extend(x["name"] for x in json.load(f)["files"])
    if not manifests:
        raise FileNotFoundError(f"no committed manifest under {path}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if not names:
        if schema is None:
            raise FileNotFoundError(
                f"empty commit under {path} and no schema given — "
                "inference has nothing to infer; pass schema="
            )
        return spark.createDataFrame([], schema)
    return reader.json([os.path.join(path, n) for n in names])
