"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, per the standard ANN playbook:
- ``sim_brute_topk`` — exact cosine top-k for a bounded query set. The
  pair stage is query-set × corpus: with a small query set this is a
  broadcast join (corpus streams once, no shuffle of the big side) — the
  correct baseline at any corpus size as long as |queries| is bounded.
- ``sim_cosine_pairs`` — all-pairs above a threshold (embedding near-dup).
  Quadratic by definition; kept for corpus-scale near-dup at this SF.
- ``ann_lsh_topk`` — the scale path: random-hyperplane (sign) LSH buckets
  from md5-derived pseudo-random projections; candidates only within a
  bucket. Sub-quadratic: shuffle keys are bucket ids. Approximate by
  design → no SQL oracle (driver records rows-only).

All dot products are the ordered double fold from functions/vector.py, so
cosines are bit-identical to the DuckDB oracle's list_reduce fold and
equality/threshold comparisons match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from roar_spark.catalog import load_table
from roar_spark.functions.text_fns import hex_digit_val
from roar_spark.functions.vector import cosine, norm

N_QUERIES = 10
TOP_K = 5


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("nrm", norm(F.col("embedding")))


def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for query vectors (vec_id < 10).
    Query side is broadcast; corpus side never shuffles for the join."""
    emb = _with_norm(load_table(spark, "embeddings", sf_dir))
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    scored = (
        emb.join(q, F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(cosine(F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")), 6),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos")
        .orderBy("query_id", "rank")
    )


def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.4, ids only + rounded
    cosine. (The corpus tops out ≈0.5, so 0.4 captures the planted
    near-neighbor tail.)"""
    emb = _with_norm(load_table(spark, "embeddings", sf_dir))
    a = emb.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn(
            "cos", F.round(cosine(F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")), 6)
        )
        .filter(F.col("cos") >= 0.4)
        .select("vec_id_a", "vec_id_b", "cos")
        .orderBy("vec_id_a", "vec_id_b")
    )


def _lsh_bucket(emb_col: F.Column, n_planes: int = 4, dim: int = 64) -> F.Column:
    """Sign-LSH bucket id from ``n_planes`` deterministic hyperplanes.

    Plane p's weight for dimension d is derived from md5(f"{p}:{d}") hex
    digits mapped to {-7.5 … +7.5} — a fixed pseudo-random projection
    reproducible anywhere (no RNG state, no driver-side arrays needed
    beyond literals)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        acc = F.lit(0.0)
        for d in range(dim):
            w = hex_digit_val(F.md5(F.lit(f"{p}:{d}")), 1 + (d % 28)) - 7.5
            acc = acc + F.element_at(emb_col, d + 1).cast("double") * w
        bucket = bucket + F.when(acc > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


N_PLANES = 4


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: top-3 per query from the query's sign-LSH bucket
    plus its Hamming-1 neighbor buckets (multi-probe — the standard recall
    fix when data is near-orthogonal and single-bucket recall collapses).

    Join key = bucket id → equi-join, sub-quadratic: candidates per query
    ≈ (1 + planes) · n / 2^planes instead of n. The probe fan-out lives on
    the (small, broadcast) query side; the corpus is hashed exactly once.
    Rows-only correctness check (approximate by design)."""
    emb = _with_norm(load_table(spark, "embeddings", sf_dir)).withColumn(
        "bucket", _lsh_bucket(F.col("embedding"), n_planes=N_PLANES)
    )
    probes = F.array(*[F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)
    ])
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("q_bucket", F.explode(probes))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "q_bucket",
        )
    )
    scored = (
        emb.join(q, (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")))
        .withColumn(
            "cos",
            F.round(cosine(F.col("q_emb"), F.col("embedding"), F.col("q_nrm"), F.col("nrm")), 6),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos")
        .orderBy("query_id", "rank")
    )
