"""File-simulated Kafka source: JSON-lines files of envelope records.

Lets every downstream stage (inference, parsing, retention, serving, sink)
run and be tested without a broker — the streaming-file-source analog of
the reference's Kafka reader. Each line is one message:

    {"key": "k1", "value": "<payload string>", "timestamp": "...",
     "offset": 0, "partition": 0}

``value`` is the raw payload exactly as Kafka would deliver it (JSON text
or arbitrary bytes; bytes are base64-encoded with ``value_b64`` instead).
"""

from __future__ import annotations

import base64
import json
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("value_b64", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("partition", T.IntegerType(), False),
    ]
)


def envelope_schema() -> T.StructType:
    """Canonical envelope produced by every source (kafka source parity)."""
    return T.StructType(
        [
            T.StructField("key", T.BinaryType(), True),
            T.StructField("value", T.BinaryType(), True),
            T.StructField("timestamp", T.TimestampType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("partition", T.IntegerType(), False),
        ]
    )


def _to_envelope(df: DataFrame) -> DataFrame:
    value = F.when(
        F.col("value_b64").isNotNull(), F.unbase64(F.col("value_b64"))
    ).otherwise(F.col("value").cast("binary"))
    return df.select(
        F.col("key").cast("binary").alias("key"),
        value.alias("value"),
        "timestamp",
        "offset",
        "partition",
    )


def file_envelope_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming envelope DataFrame over a directory of JSON-lines files
    (one file ≈ one producer flush; the file source's per-file discovery
    plays the role of Kafka's poll loop)."""
    raw = (
        spark.readStream.schema(_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .json(path)
    )
    return _to_envelope(raw)


def read_envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of the same wire format (for schema bootstrap + tests)."""
    return _to_envelope(spark.read.schema(_WIRE_SCHEMA).json(path))


def write_envelope_file(
    path: str,
    messages: Iterable[dict],
    *,
    file_name: str = "part-0.json",
) -> str:
    """Test/demo helper: write messages in the wire format. ``value`` may
    be str (JSON or not) or bytes (base64-encoded on the wire). ``key``
    likewise accepts bytes — encoded base64 into the string key field,
    since the served ``kafka_key`` column is utf8 by the reference's
    metadata schema (kafka/consumer.go:834-839) and raw bytes would make
    the record non-JSON-serializable."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, file_name)
    with open(out, "w", encoding="utf-8") as fh:
        for m in messages:
            value = m.get("value")
            key = m.get("key")
            if isinstance(key, bytes):
                key = base64.b64encode(key).decode("ascii")
            rec = {
                "key": key,
                "timestamp": m["timestamp"],
                "offset": m["offset"],
                "partition": m.get("partition", 0),
            }
            if isinstance(value, bytes):
                rec["value_b64"] = base64.b64encode(value).decode("ascii")
            else:
                rec["value"] = value
            fh.write(json.dumps(rec) + "\n")
    return out
