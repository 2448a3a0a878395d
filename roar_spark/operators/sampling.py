"""Deterministic sampling / splitting over the documents corpus — the
data-prep operators every training pipeline needs, built on content-stable
hashing rather than RNG state:

- hash-based splits are reproducible across runs, engines, partitionings
  and cluster sizes (no seed plumbing, no sampleBy approximation), and a
  document keeps its split assignment forever — the property that stops
  train/test leakage when the corpus is re-processed incrementally;
- stratified sampling by hash threshold gives a fixed, auditable rule per
  stratum instead of a per-run random draw.

Hash = first 4 hex digits of md5(doc_id) → uniform 16-bit value, portable
to any engine with md5 (same trick as the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table

# 16-bit hash space boundaries: 80% / 10% / 10%
_TRAIN_END = int(0.8 * 0x10000)  # 52428 = 0xCCCC
_VAL_END = int(0.9 * 0x10000)  # 58982 = 0xE666


def _hash16(col: F.Column) -> F.Column:
    """Uniform value in [0, 65536) from the md5 of the key's string form."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content-stable hash, with the
    per-split counts that make the ratios auditable."""
    docs = load_table(spark, "documents", sf_dir)
    h = _hash16(F.col("doc_id"))
    split = (
        F.when(h < _TRAIN_END, "train").when(h < _VAL_END, "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("split")
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample per language stratum (hash threshold),
    returning the sampled ids — re-runnable anywhere with identical
    output, unlike RNG-based sampleBy."""
    docs = load_table(spark, "documents", sf_dir)
    h = _hash16(F.col("doc_id"))
    return (
        docs.filter(h < int(0.1 * 0x10000))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )
