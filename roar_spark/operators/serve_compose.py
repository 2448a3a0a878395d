"""Serve→query composition: prove the serving facade's output is the SAME
relational surface as a direct table scan.

Round-1 tested serving (StreamEngine/ParquetStore) and the query corpus in
isolation; this operator composes them end to end: a corpus table flows
through the retention store (append_batch per half → batch directories →
``StreamEngine.fetch`` snapshot) and the snapshot is aggregated with the
exact ROLLUP the corpus runs directly — so the DuckDB oracle is the plain
table aggregation, and a hash match proves the served path loses/alters
nothing (reference analog: querying what the Flight server serves,
flight/server.go:171-208, instead of the topic that fed it).

The ingest conversion uses the A13 converter hook batch-mode: the
"envelope" IS the typed projection and the converter is identity — the
same plug-in surface a custom wire format would use
(kafka/consumer.go:79-86).

Scale shape: ParquetStore appends are executor-side parquet writes (no
driver collect), the snapshot is a multi-directory parquet scan, and the
rollup aggregates with map-side partial aggregation — the whole path is
the documented 100 TB retention design (manager.py ParquetStore).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table
from roar_spark.config import EngineConfig
from roar_spark.operators.relational import dsum
from roar_spark.streaming.manager import StreamEngine

_TOPIC = "orders_feed"


def served_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority) over orders SERVED through the
    ParquetStore retention path. Two append_batch calls (even/odd order
    keys) exercise the multi-batch snapshot; results must hash-match the
    direct-table agg_rollup oracle exactly."""
    src = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    engine = StreamEngine(
        spark, EngineConfig(), store_base=tempfile.mkdtemp(prefix="roar_serve_")
    )
    # identity converter: the envelope is already the typed projection
    engine.register_converter(_TOPIC, lambda env, _schema: env, src.schema)
    engine.register_stream(_TOPIC, [])
    engine.append_batch(_TOPIC, src.filter(F.col("o_orderkey") % 2 == 0))
    engine.append_batch(_TOPIC, src.filter(F.col("o_orderkey") % 2 == 1))
    served = engine.fetch(_TOPIC, limit=-1)
    # engine intentionally NOT stopped: the snapshot lazily scans the store
    # directories; the tempdir is reclaimed by the OS tmp cleaner
    return (
        served.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )
