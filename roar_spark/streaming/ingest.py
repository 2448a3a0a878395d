"""Envelope → typed stream parsing (the reference's createBatch path).

Pipeline stages, all built-in Catalyst expressions (SURVEY.md §2 A5-A12):

1. schema bootstrap: sample ≤10 payloads → ``inference.infer_schema`` →
   frozen StructType (kafka/consumer.go:422-468; frozen-after-first-batch
   semantics stream/manager.go:282-284)
2. metadata projection: kafka_key/timestamp/offset/partition
   (kafka/consumer.go:671-675)
3. JSON path: ``from_json`` against the CARRIER schema, then the coercion
   cast layer (coerce.py) to the frozen target types — replicating
   appendValue/appendTimestamp semantics without Spark's own JSON coercion
4. binary path: payload rides as a single ``value: binary`` column
   (kafka/consumer.go:858-861)

Fields missing from a message become NULL; fields not in the frozen schema
are silently dropped (kafka/consumer.go:630-634 — parity quirk, see
SURVEY.md §2.3.5). A whole message that fails to parse yields NULL payload
columns (parse-error row → all-null, kafka/consumer.go:607-612).

Scale: stages 2-4 are one whole-stage-codegen'd projection per micro-batch;
schema inference runs ONCE per stream on a driver-side sample, never on the
data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roar_spark.coerce import carrier_schema, coerce_to_schema
from roar_spark.inference import KAFKA_METADATA_FIELDS, infer_schema

__all__ = ["bootstrap_schema", "parse_envelope", "is_json_schema"]


def bootstrap_schema(
    sample_payloads: list[bytes | str],
    sample_size: int = 10,
    infer_nested: bool = False,
) -> T.StructType:
    """Infer the frozen stream schema from the first batch's sample.
    ``infer_nested`` enables real Struct/Array types (extension knob,
    SURVEY.md §1.3) instead of the reference's stringified nesting."""
    return infer_schema(sample_payloads, sample_size=sample_size, infer_nested=infer_nested)


def is_json_schema(schema: T.StructType) -> bool:
    """True if the stream was classified JSON at bootstrap. The binary
    bootstrap is the ONLY producer of a lone BinaryType ``value`` payload
    column (inference.py binary branch) — a JSON stream whose single
    payload field happens to be NAMED 'value' (e.g. '{"value": 123}')
    types it bigint/double/… and must still parse as JSON, so the check
    is name AND dtype, not name alone."""
    payload = [
        f for f in schema.fields
        if f.name not in {n2 for n2, _, _ in KAFKA_METADATA_FIELDS}
    ]
    return not (
        len(payload) == 1
        and payload[0].name == "value"
        and isinstance(payload[0].dataType, T.BinaryType)
    )


def _metadata_cols() -> list[Column]:
    return [
        F.col("key").cast("string").alias("kafka_key"),
        F.col("timestamp").alias("kafka_timestamp"),
        F.col("offset").alias("kafka_offset"),
        F.col("partition").alias("kafka_partition"),
    ]


def parse_envelope(envelope: DataFrame, schema: T.StructType) -> DataFrame:
    """Apply the frozen schema to an envelope DataFrame (streaming or
    batch). Output column order = schema order (metadata first)."""
    if not is_json_schema(schema):
        return envelope.select(*_metadata_cols(), F.col("value").alias("value"))
    carrier = carrier_schema(schema)
    parsed = envelope.withColumn(
        "_payload", F.from_json(F.col("value").cast("string"), carrier)
    )
    return parsed.select(*_metadata_cols(), *coerce_to_schema("_payload", schema))
