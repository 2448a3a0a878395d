"""Persistence sink: the corrected form of the reference's DuckDB sink.

The reference polls every 5 s and re-inserts EVERY buffered batch with no
high-water mark (duckdb/sink.go:89-125) → duplicate rows; and its DuckDB
driver is never actually linked (§2.3.1-2). We keep the *contract* —
one relational table per topic, schema derived from the stream schema
(duckdb/sink.go:128-156) — with exactly-once-per-micro-batch semantics via
checkpointed ``foreachBatch`` (deliberate, documented upgrade).

The testable part of the reference sink is its type mapping
(arrowToDuckDBType, duckdb/sink.go:212-250); ``spark_type_to_sql`` ports
that table (SURVEY.md §1.3) and ``create_table_ddl`` ports the DDL
generator (schemaToCreateTable, duckdb/sink.go:184-209).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["spark_type_to_sql", "create_table_ddl", "start_parquet_sink"]

# arrowToDuckDBType parity (duckdb/sink.go:212-250), keyed by Spark type.
# Unsigned arrow types cannot arise from Spark; date/timestamp keep the
# reference's DATE/TIMESTAMP, everything unknown falls back to VARCHAR.
_TYPE_MAP: list[tuple[type, str]] = [
    (T.ByteType, "TINYINT"),
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "FLOAT"),
    (T.DoubleType, "DOUBLE"),
    (T.BooleanType, "BOOLEAN"),
    (T.StringType, "VARCHAR"),
    (T.BinaryType, "BLOB"),
    (T.TimestampType, "TIMESTAMP"),
    (T.DateType, "DATE"),
]


def spark_type_to_sql(dtype: T.DataType) -> str:
    for py_type, sql in _TYPE_MAP:
        if isinstance(dtype, py_type):
            return sql
    return "VARCHAR"  # fallback (duckdb/sink.go:246-248)


def create_table_ddl(table: str, schema: T.StructType) -> str:
    """CREATE TABLE IF NOT EXISTS t (col TYPE [NOT NULL], …) —
    schemaToCreateTable parity (duckdb/sink.go:184-209)."""
    cols = ", ".join(
        f'"{f.name}" {spark_type_to_sql(f.dataType)}' + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})'


def start_parquet_sink(parsed: DataFrame, topic: str, base_path: str, checkpoint_base: str):
    """Exactly-once-per-micro-batch append to a per-topic parquet table.
    On a cluster this is the same code against object storage (or Delta for
    ACID + compaction); the checkpoint guarantees no re-insertion across
    restarts — the fix for §2.3.1."""
    path = os.path.join(base_path, topic)

    def _persist(batch_df: DataFrame, _batch_id: int) -> None:
        n = batch_df.count()
        batch_df.write.mode("append").parquet(path)
        from roar_spark.metrics import REGISTRY

        REGISTRY.inc("roar_duckdb_insert_rows_total", n, topic=topic)

    return (
        parsed.writeStream.foreachBatch(_persist)
        .option("checkpointLocation", os.path.join(checkpoint_base, f"sink-{topic}"))
        .queryName(f"roar-sink-{topic}")
        .start()
    )
