"""The custom Python Data Source SINK (sources/jsonl_sink.py): batch
all-or-nothing commit, manifest-honoring reads, abort cleanup, and
idempotent streaming-epoch replay."""

from __future__ import annotations

import json
import os

import pytest

from news_categorization_big_data_spark.sources.jsonl_sink import (
    JsonlSinkDataSource,
    JsonlSinkWriter,
    _publish,
    _StagedFile,
    read_committed,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(JsonlSinkDataSource)
    return spark


def test_batch_write_commits_and_roundtrips(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "concat('doc-', id) AS name")
    df.write.format("jsonlsink").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.listdir(os.path.join(out, "_staging"))
    back = read_committed(spark, out)
    assert back.count() == 100
    assert sorted(r["name"] for r in back.collect())[0] == "doc-0"


def test_reader_ignores_uncommitted_staged_files(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "sink")
    spark.range(10).write.format("jsonlsink").option("path", out).mode(
        "append"
    ).save()
    # a torn write: data staged but never committed
    with open(os.path.join(out, "_staging", "part-torn.jsonl"), "w") as f:
        f.write('{"id": 999999}\n')
    assert read_committed(spark, out).count() == 10


def test_abort_discards_staged_files(tmp_path):
    out = str(tmp_path / "sink")
    os.makedirs(os.path.join(out, "_staging"))
    w = JsonlSinkWriter({"path": out})
    staged = os.path.join(out, "_staging", "part-x.jsonl")
    with open(staged, "w") as f:
        f.write("{}\n")
    w.abort([_StagedFile(name="part-x.jsonl", rows=1), None])
    assert not os.path.exists(staged)
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))


def test_replayed_epoch_publishes_nothing(tmp_path):
    """Checkpoint recovery re-runs the last micro-batch: the re-staged
    files must NOT be published twice. _publish's manifest guard is the
    entire mechanism — exercise it directly."""
    out = str(tmp_path / "sink")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)

    def stage(name):
        with open(os.path.join(staging, name), "w") as f:
            f.write('{"id": 1}\n')
        return _StagedFile(name=name, rows=1)

    assert _publish(out, [stage("part-a.jsonl")], "_SUCCESS-0") is True
    # replay of epoch 0 stages a fresh file, commit must be a no-op
    assert _publish(out, [stage("part-b.jsonl")], "_SUCCESS-0") is False
    published = [p for p in os.listdir(out) if p.startswith("part-")]
    assert published == ["part-a.jsonl"]
    assert not os.listdir(staging)  # replayed stage was discarded
    manifest = json.load(open(os.path.join(out, "_SUCCESS-0")))
    assert [f["name"] for f in manifest["files"]] == ["part-a.jsonl"]


def test_streaming_write_end_to_end(registered, tmp_path):
    spark = registered
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        for i in range(25):
            f.write(json.dumps({"id": i, "kind": "ev"}) + "\n")

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("id long, kind string").json(src)
    q = (
        stream.writeStream.format("jsonlsink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    back = read_committed(spark, out)
    assert sorted(r["id"] for r in back.collect()) == list(range(25))
    # per-epoch manifests, not the batch one
    assert any(p.startswith("_SUCCESS-") for p in os.listdir(out))
