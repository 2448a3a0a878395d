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
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos")
        .orderBy("query_id", "rank")
    )


COSINE_THRESHOLD = 0.4
N_BLOCKS = 8


def _block_screen_pairs(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Candidate pairs with cosine ≥ threshold−margin via block-matrix
    multiply: vectors are bucketed into N_BLOCKS, every block PAIR is one
    applyInPandas group doing a single numpy matmul, and only surviving
    (id_a, id_b) pairs leave Python.

    This is the scale shape for all-pairs similarity: bounded replication
    (each vector appears in N_BLOCKS groups), a vectorized kernel instead
    of 2M per-pair expression folds, and output proportional to matches,
    not candidates. The screen uses a 1e-6 margin; exact semantics come
    from the recheck stage, so the numpy summation order never leaks into
    results."""
    import numpy as np
    import pandas as pd

    blocked = emb.select("vec_id", "embedding").withColumn(
        "blk", (F.col("vec_id") % N_BLOCKS).cast("int")
    )
    pair_df = F.broadcast(
        spark.createDataFrame(
            [(i, j) for i in range(N_BLOCKS) for j in range(i, N_BLOCKS)],
            "blk_a int, blk_b int",
        )
    )
    a_side = blocked.join(pair_df, F.col("blk") == F.col("blk_a")).select(
        "blk_a", "blk_b", F.lit(0).alias("side"), "vec_id", "embedding"
    )
    b_side = blocked.join(pair_df, F.col("blk") == F.col("blk_b")).select(
        "blk_a", "blk_b", F.lit(1).alias("side"), "vec_id", "embedding"
    )
    screen_min = COSINE_THRESHOLD - 1e-6

    def screen(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": []}).astype("int64")
        ma = np.stack(a["embedding"].to_numpy()).astype("float64")
        mb = np.stack(b["embedding"].to_numpy()).astype("float64")
        cos = (ma / np.linalg.norm(ma, axis=1, keepdims=True)) @ (
            mb / np.linalg.norm(mb, axis=1, keepdims=True)
        ).T
        ia, ib = np.nonzero(cos >= screen_min)
        ids_a = a["vec_id"].to_numpy()[ia]
        ids_b = b["vec_id"].to_numpy()[ib]
        # normalize to (min, max): the smaller id may live in EITHER block,
        # so a plain ids_a < ids_b filter would drop cross-block pairs.
        lo = np.minimum(ids_a, ids_b)
        hi = np.maximum(ids_a, ids_b)
        keep = lo < hi
        out = pd.DataFrame({"vec_id_a": lo[keep], "vec_id_b": hi[keep]})
        # same-block groups see each unordered pair twice (both orientations)
        return out.drop_duplicates()

    return (
        a_side.unionAll(b_side)
        .groupBy("blk_a", "blk_b")
        .applyInPandas(screen, "vec_id_a long, vec_id_b long")
    )


def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.4, ids + rounded cosine.

    Two-phase: numpy block-matmul screen (fast, margin-padded) → exact
    ordered-fold recheck on the few survivors. Results are identical to
    the naive all-pairs fold (and to the DuckDB oracle) because the final
    filter/rounding only ever sees the exact fold values."""
    emb = _with_norm(load_table(spark, "embeddings", sf_dir))
    survivors = _block_screen_pairs(spark, emb)
    a = emb.select(
        F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b")
    )
    return (
        survivors.join(a, "vec_id_a")
        .join(b, "vec_id_b")
        .withColumn(
            "cos", F.round(cosine(F.col("emb_a"), F.col("emb_b"), F.col("nrm_a"), F.col("nrm_b")), 6)
        )
        .filter(F.col("cos") >= COSINE_THRESHOLD)
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
