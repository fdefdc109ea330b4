"""Live-broker integration for the reference's Kafka topology — gated
on KAFKA_BOOTSTRAP (r14 VERDICT item 8).

The engine keeps the reference's exact Kafka source/sink API
(streaming/topology.py read_message_stream ≙
news_categorization_streaming.py:45-51; write_kafka_batch ≙
news_summarization_batch.py:121-127), but no broker exists in the CI
sandbox, so every streaming test rides file-source stand-ins with
identical logical plans — leaving the Kafka CONFIGURATION path (broker
options, topic subscribe, value serialization through a real broker)
never exercised. This module closes that gap for free the day an
environment has a broker:

    KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_live.py

Skipped (not failed) otherwise. Requirements when live: a reachable
broker with auto-topic-creation (or pre-created test topics) AND the
spark-sql-kafka connector on the session classpath, e.g.

    --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>

(the connector is not bundled with pyspark; README "Streaming").
"""

from __future__ import annotations

import os
import time
import uuid

import pytest
from pyspark.sql import functions as F

KAFKA = os.environ.get("KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.skipif(
    not KAFKA,
    reason="live-broker test: set KAFKA_BOOTSTRAP=host:port (and add the "
    "spark-sql-kafka connector to the session) to run",
)


def _await(predicate, timeout_s: float = 90.0, interval_s: float = 1.0):
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if predicate():
            return True
        time.sleep(interval_s)
    return False


def test_reference_topology_against_live_broker(spark, tmp_path):
    """Round-trips the reference's ingest path through a REAL broker:
    the batch Kafka sink publishes serialized messages to a fresh
    topic; the streaming Kafka source (the reference's exact options,
    modulo startingOffsets=earliest so the pre-published messages are
    read) consumes them through parse → classify into a parquet sink;
    the landed rows must carry every published content with a computed
    category — the same ingest+classify contract the file-source e2e
    test proves brokerless."""
    from news_categorization_big_data_spark.streaming.topology import (
        classify_stream_model,
        parse_messages,
        serialize_messages,
    )

    topic = f"ncbds-it-{uuid.uuid4().hex[:12]}"
    payload = spark.createDataFrame(
        [
            ("spark shuffles data fast", "tech"),
            ("the match final score", "sports"),
            ("markets rally on earnings", "business"),
        ],
        "content string, category string",
    ).withColumn("event_ts", F.current_timestamp())

    # publish via the reference's batch sink API (no fallback_path —
    # the real format("kafka") write)
    (
        serialize_messages(payload)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("topic", topic)
        .save()
    )

    # consume via the reference's source options; earliest instead of
    # latest so the just-published batch is in range
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
        .load()
    )
    classified = classify_stream_model(parse_messages(raw))
    out_dir = str(tmp_path / "landed")
    q = (
        classified.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        assert _await(
            lambda: os.path.isdir(out_dir)
            and spark.read.parquet(out_dir).count() >= 3
        ), "published messages never landed from the live broker"
        landed = spark.read.parquet(out_dir)
        contents = {r.content for r in landed.select("content").collect()}
        assert contents >= {
            "spark shuffles data fast",
            "the match final score",
            "markets rally on earnings",
        }
        assert landed.where(F.col("category").isNull()).count() == 0
    finally:
        q.stop()
