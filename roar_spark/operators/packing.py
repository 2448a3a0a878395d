"""Sequence packing — concatenate-and-chunk documents into fixed-size
training windows, the step that turns a curated corpus into the dense
fixed-length batches an LLM trainer consumes.

Semantics (the standard concat-and-chunk): within each shard (``source``),
documents are laid end-to-end in doc_id order on a token axis; the axis is
cut into PACK_WINDOW-token windows; a document that straddles a cut
belongs to every window it overlaps, contributing the overlapped token
count. The result is one row per (shard, window) with its document count
and token occupancy — every window except a shard's last is exactly full,
which is the whole point of packing (no padding waste).

Scale design: the running token offset is a window function PARTITIONED
BY source — per-shard sequential semantics with cross-shard parallelism,
which is exactly how 100 TB packing jobs run (a global single-partition
prefix sum would serialize the corpus through one task; sharded packing
is embarrassingly parallel and what trainers actually consume, one packed
stream per shard/worker). The doc→window fan-out is an explode of at most
⌈n_tok/W⌉+1 elements per doc — linear in corpus tokens, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from roar_spark.catalog import load_table
from roar_spark.functions.text_fns import tokens

PACK_WINDOW = 256  # tokens per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, window_id): documents overlapping the window and the
    tokens they contribute (== PACK_WINDOW for all but each shard's tail
    window). See module docstring for semantics and scale shape."""
    # explicit precondition, mirrored in the oracle: a NULL text would
    # otherwise vanish SILENTLY (size(NULL)→NULL → the explode emits no
    # rows) while still being skipped by the running offsets — making the
    # drop deliberate and visible beats an accounting hole at corpus scale
    docs = load_table(spark, "documents", sf_dir).filter(F.col("text").isNotNull())
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    win = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    laid = docs.select("source", "doc_id", n_tok.alias("n_tok")).select(
        "source",
        "doc_id",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(win), F.lit(0)).cast("long").alias("start"),
    )
    laid = laid.withColumn("end", F.col("start") + F.col("n_tok"))
    wcol = F.explode(
        F.sequence(
            F.floor(F.col("start") / PACK_WINDOW).cast("long"),
            F.floor((F.col("end") - 1) / PACK_WINDOW).cast("long"),
        )
    ).alias("window_id")
    spans = laid.select("source", "doc_id", "start", "end", wcol)
    contrib = F.least(
        F.col("end"), (F.col("window_id") + 1) * PACK_WINDOW
    ) - F.greatest(F.col("start"), F.col("window_id") * PACK_WINDOW)
    return (
        spans.select("source", "window_id", "doc_id", contrib.alias("tok"))
        .groupBy("source", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("long").alias("window_tokens"),
        )
        .orderBy("source", "window_id")
    )
