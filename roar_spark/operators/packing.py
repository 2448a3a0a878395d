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

Scale design: the running token offset is a per-shard (``source``)
exclusive prefix sum, computed as a DISTRIBUTED two-level prefix sum
rather than one source-keyed window: with ~20 shards, a single window
would serialize the whole corpus through 20 sort tasks (the r7
low-cardinality-window finding, operators/ranks.py). Level 1 buckets
doc_ids into coarse monotone ranges and window-sums INSIDE
(source, bucket) at full parallelism; level 2 cumulates the per-bucket
totals per source (≤ shards·buckets pre-aggregated rows) and the bucket
offset joins back on (source, bucket). start = bucket_offset +
within-bucket prefix — exactly the single-window value, deterministic
under any partitioning.
The doc→window fan-out is an explode of at most ⌈n_tok/W⌉+1 elements per
doc — linear in corpus tokens, no pair joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from roar_spark.catalog import load_table
from roar_spark.functions.text_fns import tokens

PACK_WINDOW = 256  # tokens per packed training sequence

# Doc-ids per prefix-sum bucket: floor(doc_id / B) is monotone in doc_id,
# so bucket order = doc order. 1M keeps level-1 slices task-sized and the
# level-2 offsets table tiny (corpus_rows / 1M rows) — at 1e12 docs that
# is a 1M-row window per source, itself parallel enough.
_PREFIX_BUCKET = 1 << 20


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
    sized = docs.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
        F.floor(F.col("doc_id") / _PREFIX_BUCKET).cast("long").alias("bkt"),
    )
    # The two levels form a diamond over the tokenize projection, so the
    # corpus is scanned and tokenized TWICE — deliberate (r7 review
    # adjudication): exchange reuse cannot dedupe the branches (column
    # pruning and join-key isnotnull propagation diverge the exchange
    # children — verified against the executed plan both ways), and a
    # persisted intermediate is ~40 B/doc ≈ 40 TB of cache at the 1e12-doc
    # design point, while the second tokenize pass is embarrassingly
    # parallel map CPU whose level-2 branch shuffles only the map-side
    # pre-aggregated (source, bkt) sums — the cheaper honest cost.
    # level 2: exclusive running total of whole buckets, per source — the
    # shuffled input is ≤ sources·buckets pre-aggregated rows. NOT
    # force-broadcast: at 1e12 docs offsets is corpus/2^20 rows
    # (~1e6/source) — a plain (source, bkt) join keeps the plan honest at
    # any size while Catalyst still auto-broadcasts it whenever it is
    # actually small (r7 review).
    woff = W.partitionBy("source").orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        sized.groupBy("source", "bkt")
        .agg(F.sum("n_tok").alias("bkt_tok"))
        .select(
            "source",
            "bkt",
            F.coalesce(F.sum("bkt_tok").over(woff), F.lit(0)).cast("long").alias("bkt_off"),
        )
    )
    # level 1: exclusive prefix inside (source, bucket) — full parallelism
    win = W.partitionBy("source", "bkt").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    laid = (
        sized.withColumn(
            "local", F.coalesce(F.sum("n_tok").over(win), F.lit(0)).cast("long")
        )
        .join(offsets, ["source", "bkt"])
        .select(
            "source",
            "doc_id",
            "n_tok",
            (F.col("bkt_off") + F.col("local")).alias("start"),
        )
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
