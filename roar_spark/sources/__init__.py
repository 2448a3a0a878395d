"""Ingestion sources producing the canonical Kafka envelope:

    key: binary | timestamp: timestamp | offset: long | partition: int |
    value: binary

``kafka.py`` builds the real Structured Streaming Kafka source (needs a
broker); ``files.py`` simulates the same envelope from JSON-lines files so
the full pipeline is testable without one (SURVEY.md §7 Phase 2)."""

from roar_spark.sources.files import envelope_schema, file_envelope_stream
from roar_spark.sources.kafka import kafka_envelope_stream

__all__ = ["envelope_schema", "file_envelope_stream", "kafka_envelope_stream"]
