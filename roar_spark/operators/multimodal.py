"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, processed via Arrow-batched Pandas stages.

Pattern (the real thing at 100 TB):
- media rides as a ``binary`` column next to typed metadata (here we
  synthesize it from ``documents.text`` since the corpus ships no media);
  in production it comes from ``spark.read.format("binaryFile")`` or
  parquet with a binary column.
- cheap metadata (byte length, magic-byte sniff) is pure built-in
  expressions — JVM-side, no Python;
- decode / feature-extract runs in ``mapInPandas`` (Arrow batches, one
  Python roundtrip per batch, not per row). The image/audio codec libs
  are not in this container, so the decoder is a clearly marked STUB: a
  deterministic fake keyed on the payload digest. The Spark-side plumbing
  (schema, batching, partition independence) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, width int, height int, n_channels int"
)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata without decoding: byte length and hex magic
    prefix — all JVM-side (oracle-checkable)."""
    docs = load_table(spark, "documents", sf_dir)
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.hex(F.substring(payload, 1, 4)).alias("magic_hex"),
        F.md5(F.col("text")).alias("payload_md5"),
    ).orderBy("doc_id")


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """STUB decoder — deterministic fake in place of a real codec.

    Real implementation would be e.g. PIL.Image.open(io.BytesIO(payload));
    the codec libraries are not available in this environment, so decode
    properties derive from the payload digest instead. Raise
    NotImplementedError here if accidental production use must be loud.
    """
    import hashlib

    h = hashlib.md5(payload).digest()
    fmt = ("jpeg", "png", "webp")[h[0] % 3]
    return fmt, 64 + h[1] % 192, 64 + h[2] % 192, 1 + h[3] % 3


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode pipeline over the binary column (STUB codec).

    mapInPandas keeps the Python boundary per-batch; output schema is fixed
    and typed. Rows-only correctness check (no SQL oracle for a codec)."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "format": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "n_channels": [d[3] for d in decoded],
                }
            )

    return docs.mapInPandas(decode_batches, DECODE_SCHEMA).orderBy("doc_id")
