"""Structured Streaming topology: the reference's pipeline, made scale-
and correctness-sound."""

from news_categorization_big_data_spark.streaming.topology import (
    MESSAGE_SCHEMA,
    classify_stream,
    parse_messages,
    read_message_stream,
    write_idempotent_parquet,
)

__all__ = [
    "MESSAGE_SCHEMA",
    "classify_stream",
    "parse_messages",
    "read_message_stream",
    "write_idempotent_parquet",
]
