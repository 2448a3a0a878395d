"""Schema-registry Avro payload decode as an A13 converter (extension).

Completes the reference's TODO (kafka/consumer.go:660-661: the stored
``--schema-registry`` endpoint is never consulted; Avro payloads are
passed through undecoded). Here the decode is a per-topic converter for
``StreamEngine.register_converter`` — the exact plugin seam the reference
reserves for non-JSON payloads (MessageConverter, kafka/consumer.go:79-86)
— so Avro topics flow through the SAME ingest/retention/serve pipeline as
JSON ones, just with a schema-owned parse instead of inference.

Spark-first shape: the decoder is pure Python (avro_lite), so it runs
INSIDE one Arrow-batched ``mapInPandas`` over the envelope — one Python
round-trip per micro-batch partition, distributed across executors,
never a row-at-a-time UDF in a relational plan. Schema evolution is
handled per message: each frame names its writer schema by id, the
decoded record is projected onto the reader schema (registry ``latest``
at converter build time — defaults fill, unknowns drop, numeric
promotions apply), so a topic can carry a mix of schema versions in one
micro-batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from roar_spark.avro_lite import (
    AvroSchema,
    decode,
    encode,
    frame,
    project_to_reader,
    record_struct,
    unframe,
)

_META_FIELDS = [
    T.StructField("kafka_key", T.StringType(), True),
    T.StructField("kafka_timestamp", T.TimestampType(), True),
    T.StructField("kafka_offset", T.LongType(), True),
    T.StructField("kafka_partition", T.IntegerType(), True),
]


def avro_converter(
    schemas_by_id: dict[int, AvroSchema],
    reader: AvroSchema,
    *,
    on_error: str = "fail",
):
    """Build ``(converter, spark_schema)`` for
    ``StreamEngine.register_converter``.

    ``schemas_by_id`` resolves each frame's writer schema (from
    ``SchemaRegistryLite.schemas_by_id()`` or a real registry client);
    ``reader`` is the record schema the served table commits to.
    ``on_error='null'`` turns undecodable payloads into all-null payload
    rows (metadata kept, so the poison offset stays visible) instead of
    failing the micro-batch."""
    if on_error not in ("fail", "null"):
        raise ValueError("avro_converter: on_error must be 'fail' or 'null'")
    payload_struct = record_struct(reader)
    overlap = {f.name for f in payload_struct} & {f.name for f in _META_FIELDS}
    if overlap:
        raise ValueError(
            f"avro_converter: payload fields collide with metadata: {overlap}"
        )
    out_schema = T.StructType(_META_FIELDS + list(payload_struct.fields))
    payload_names = [f.name for f in payload_struct.fields]
    # tz-naive pandas columns arrive for TimestampType; emit UTC-aware and
    # let Arrow normalize — but only for PAYLOAD timestamp columns; the
    # envelope's kafka_timestamp passes through untouched.

    def convert(envelope: DataFrame, _target: T.StructType) -> DataFrame:
        def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                cols: dict[str, list] = {name: [] for name in payload_names}
                for raw in pdf["value"]:
                    try:
                        if raw is None:
                            raise ValueError("null payload")
                        schema_id, body = unframe(bytes(raw))
                        writer = schemas_by_id.get(schema_id)
                        if writer is None:
                            raise ValueError(f"unknown schema id {schema_id}")
                        rec = decode(body, writer)
                        if writer is not reader:
                            rec = project_to_reader(rec, writer, reader)
                    except Exception:
                        if on_error == "fail":
                            raise
                        rec = {}
                    for name in payload_names:
                        cols[name].append(rec.get(name))
                out = pd.DataFrame(
                    {
                        "kafka_key": [
                            k.decode("utf-8", "replace") if isinstance(k, (bytes, bytearray)) else k
                            for k in pdf["key"]
                        ],
                        "kafka_timestamp": pdf["timestamp"].values,
                        "kafka_offset": pdf["offset"].values,
                        "kafka_partition": pdf["partition"].values,
                        **cols,
                    }
                )
                yield out

        return envelope.mapInPandas(decode_batches, out_schema)

    return convert, out_schema


def encode_framed(record: dict, schema: AvroSchema, schema_id: int) -> bytes:
    """Producer-side helper (tests / demos): Avro-encode + registry-frame
    one record — the payload a registry-aware producer would publish."""
    return frame(schema_id, encode(record, schema))
