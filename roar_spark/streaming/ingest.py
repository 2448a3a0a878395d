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

RESCUED-DATA extension (opt-in, EngineConfig.rescue_columns — the designed
escape from the silent-drop quirk, SURVEY.md §2.3.5): when the frozen
schema carries the reserved ``_rescued`` string field (the engine appends
it at bootstrap for JSON streams), every post-freeze payload field that is
NOT in the frozen schema lands there as a JSON object of key → stringified
value (nested values keep their JSON text), NULL when nothing was dropped.
Entirely built-in expressions — from_json to map<string,string> +
map_filter + to_json, whole-stage codegen, no Python on the data path.

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

__all__ = [
    "RESCUED_COL",
    "bootstrap_schema",
    "is_json_schema",
    "parse_envelope",
    "with_rescued_column",
]

RESCUED_COL = "_rescued"


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


_RESCUED_MARK = "roar.rescued"  # field-metadata marker: distinguishes the
# ENGINE-APPENDED rescue sink from a user payload field that happens to be
# named "_rescued" (which must keep flowing as ordinary data in parity mode)


def _is_rescue_sink(f: T.StructField) -> bool:
    return f.name == RESCUED_COL and bool(f.metadata.get(_RESCUED_MARK))


def with_rescued_column(schema: T.StructType) -> T.StructType:
    """Frozen schema + the reserved ``_rescued`` string sink (idempotent;
    no-op for binary streams, which have no payload fields to drop). The
    sink carries a metadata marker so parse_envelope never mistakes a
    user's own "_rescued" payload field for it."""
    # no-op on name collision too: if the PAYLOAD itself has a "_rescued"
    # field, appending a sink would duplicate the column name — the user's
    # field wins and rescue is unavailable for that stream (deterministic,
    # and the parity path is exactly preserved)
    if not is_json_schema(schema) or any(f.name == RESCUED_COL for f in schema.fields):
        return schema
    return T.StructType(
        [
            *schema.fields,
            T.StructField(RESCUED_COL, T.StringType(), True, {_RESCUED_MARK: True}),
        ]
    )


def parse_envelope(envelope: DataFrame, schema: T.StructType) -> DataFrame:
    """Apply the frozen schema to an envelope DataFrame (streaming or
    batch). Output column order = schema order (metadata first). A schema
    carrying the reserved ``_rescued`` field (with_rescued_column) also
    captures the silently-dropped post-freeze payload fields there."""
    if not is_json_schema(schema):
        return envelope.select(*_metadata_cols(), F.col("value").alias("value"))
    rescue = any(_is_rescue_sink(f) for f in schema.fields)
    base = (
        T.StructType([f for f in schema.fields if not _is_rescue_sink(f)])
        if rescue
        else schema
    )
    carrier = carrier_schema(base)
    parsed = envelope.withColumn(
        "_payload", F.from_json(F.col("value").cast("string"), carrier)
    )
    cols = [*_metadata_cols(), *coerce_to_schema("_payload", base)]
    if rescue:
        # known = PAYLOAD fields only: the frozen schema also carries the
        # four kafka_* metadata columns, but those come from the envelope,
        # never from the payload — a post-freeze payload field that happens
        # to be NAMED kafka_offset cannot parse into the metadata column
        # (carrier_schema excludes it), so it must be rescued, not silently
        # excluded by a name collision with metadata (r8 review)
        meta_names = {name for name, _, _ in KAFKA_METADATA_FIELDS}
        known = F.array(
            *[F.lit(f.name) for f in base.fields if f.name not in meta_names]
        )
        raw = F.from_json(F.col("value").cast("string"), "map<string,string>")
        dropped = F.map_filter(raw, lambda k, _v: ~F.array_contains(known, k))
        # NULL when nothing was dropped (size(NULL map) is NULL too — an
        # unparseable payload rescues nothing, matching its all-null row)
        cols.append(F.when(F.size(dropped) > 0, F.to_json(dropped)).alias(RESCUED_COL))
    return parsed.select(*cols)
