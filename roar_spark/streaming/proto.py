"""Schema-registry Protobuf payload decode as an A13 converter (extension).

The protobuf sibling of ``streaming/avro.py`` — together they complete
the payload-decode pair a registry-aware gateway serves (the reference's
``--schema-registry`` is stored unused; decode is the TODO at
kafka/consumer.go:660-661). Same pipeline shape: one Arrow-batched
``mapInPandas`` over the envelope, metadata projection identical to the
default JSON path, served schema owned by the converter.

One structural difference from Avro, by design of the two formats: Avro
needs the WRITER schema to decode (schemas are external), so the
converter resolves every frame's id; protobuf wire is self-describing
enough (field-number tags, self-delimiting lengths) that decoding with
the READER schema alone IS the format's evolution story — unknown field
numbers skip, missing fields take proto3 defaults. The frame's schema id
is validated against the registry when one is provided, but never needed
to decode.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from roar_spark.proto_lite import (
    ProtoFile,
    ProtoMessage,
    decode,
    encode,
    frame,
    message_struct,
    unframe,
)

_META_FIELDS = [
    T.StructField("kafka_key", T.StringType(), True),
    T.StructField("kafka_timestamp", T.TimestampType(), True),
    T.StructField("kafka_offset", T.LongType(), True),
    T.StructField("kafka_partition", T.IntegerType(), True),
]


def proto_converter(
    reader_file: ProtoFile,
    message_indexes: list[int] | None = None,
    *,
    known_ids: set[int] | None = None,
    on_error: str = "fail",
):
    """Build ``(converter, spark_schema)`` for
    ``StreamEngine.register_converter``.

    ``reader_file`` + ``message_indexes`` select the reader message
    (default: the file's first top-level message, the common registry
    case). ``known_ids`` (optional) rejects frames whose schema id the
    registry does not know — a guard against consuming a topic with the
    wrong subject. ``on_error='null'`` yields metadata-only rows for
    undecodable payloads instead of failing the micro-batch."""
    if on_error not in ("fail", "null"):
        raise ValueError("proto_converter: on_error must be 'fail' or 'null'")
    reader: ProtoMessage = reader_file.root(message_indexes or [0])
    types = reader_file.types
    payload_struct = message_struct(reader, types)
    overlap = {f.name for f in payload_struct} & {f.name for f in _META_FIELDS}
    if overlap:
        raise ValueError(
            f"proto_converter: payload fields collide with metadata: {overlap}"
        )
    out_schema = T.StructType(_META_FIELDS + list(payload_struct.fields))
    payload_names = [f.name for f in payload_struct.fields]

    def convert(envelope: DataFrame, _target: T.StructType) -> DataFrame:
        def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                cols: dict[str, list] = {name: [] for name in payload_names}
                for raw in pdf["value"]:
                    try:
                        if raw is None:
                            raise ValueError("null payload")
                        schema_id, _idx, body = unframe(bytes(raw))
                        if known_ids is not None and schema_id not in known_ids:
                            raise ValueError(f"unknown schema id {schema_id}")
                        rec = decode(body, reader, types)
                    except Exception:
                        if on_error == "fail":
                            raise
                        rec = {}
                    for name in payload_names:
                        cols[name].append(rec.get(name))
                yield pd.DataFrame(
                    {
                        "kafka_key": [
                            k.decode("utf-8", "replace")
                            if isinstance(k, (bytes, bytearray))
                            else k
                            for k in pdf["key"]
                        ],
                        "kafka_timestamp": pdf["timestamp"].values,
                        "kafka_offset": pdf["offset"].values,
                        "kafka_partition": pdf["partition"].values,
                        **cols,
                    }
                )

        return envelope.mapInPandas(decode_batches, out_schema)

    return convert, out_schema


def encode_framed(
    record: dict,
    reader_file: ProtoFile,
    schema_id: int,
    message_indexes: list[int] | None = None,
) -> bytes:
    """Producer-side helper (tests / demos): proto-encode + registry-frame
    one record."""
    message = reader_file.root(message_indexes or [0])
    return frame(
        schema_id, encode(record, message, reader_file.types), message_indexes
    )
