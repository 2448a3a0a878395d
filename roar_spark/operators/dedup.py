"""Deduplication operators over the ``documents`` table — the operator
family a training-data pipeline runs at 100 TB (exact, MinHash-LSH,
SimHash, n-gram Jaccard; embedding near-dup lives in similarity.py).

Scale design:
- Exact dedup is a hash aggregation on the text digest — one shuffle on
  md5(text), never on the full text bytes.
- N-gram Jaccard never forms the n² pair space: candidates come from an
  equi-join on shared shingles (shuffle keyed by shingle), so disjoint
  documents never meet. At 100 TB the further refinement is the standard
  prefix-filter (join only on each doc's rarest-k shingles); MinHash-LSH
  below is the sub-quadratic path.
- MinHash-LSH: signatures are 8 aggregated MINs per doc (one shuffle),
  banding explodes to 4 (band, key) rows per doc, and the candidate join
  is an equi-join on band keys — O(docs × bands) state, no n² anywhere.
- SimHash: one 32-bit signature per doc from token-bit aggregation; the
  pair stage here is a broadcast cross-check suitable up to ~10⁵ docs per
  run; at larger scale the standard pigeonhole trick (split 32 bits into
  hamming_k+1 chunks, equi-join on exact-match chunks) turns it into an
  equi-join too. Documented, not yet implemented.

All hashing is md5-based (portable across engines — see
functions/text_fns.py), so every operator here has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table
from roar_spark.functions.text_fns import (
    minhash_str,
    simhash_bit_sign,
    tokens,
    word_shingles,
)

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = N_MINHASH // N_BANDS = 2
SIMHASH_BITS = 32


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content digest, keep the smallest doc_id.
    Shuffles 16-byte digests, not document bodies."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("text_md5")
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) distinct word-3-gram pairs."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("t"))
        # filter BEFORE shingling: F.sequence(0, size-3) runs backwards for
        # size < 3 and would fabricate wrap-around shingles
        .filter(F.size("t") >= 3)
        # array_distinct BEFORE explode: per-doc dedup is map-side (rows
        # are already doc-partitioned) — a post-explode .distinct() would
        # shuffle the whole (doc, shingle) table for nothing
        .select("doc_id", F.explode(F.array_distinct(word_shingles(F.col("t")))).alias("shingle"))
    )


def _jaccard_pairs(sh: DataFrame) -> DataFrame:
    """Pairs sharing ≥1 shingle, with exact Jaccard. ``sh`` must be
    distinct (doc_id, shingle) so COUNT(*) on the join is |A∩B|."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with word-3-gram Jaccard ≥ 0.5 (the corpus has a
    clean gap: planted near-dups sit ≥ 0.9, background noise < 0.1)."""
    # persist: the shingle table feeds the size aggregation AND both sides
    # of the intersection self-join (3 plan references, no auto plan reuse)
    pairs = _jaccard_pairs(_doc_shingles(spark, sf_dir).persist())
    return (
        pairs.filter(F.col("jaccard") >= 0.5)
        .select("doc_id_a", "doc_id_b", "jaccard")
        .orderBy("doc_id_a", "doc_id_b")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection: 8 portable minhashes per doc →
    4 bands of 2 → candidates share a band key → verify true Jaccard.

    With planted dups at j ≥ 0.9, P(candidate) = 1-(1-j²)⁴ ≥ 0.9997; the
    oracle replicates the SAME banding, so output matches exactly even for
    the probabilistic part.
    """
    sh = _doc_shingles(spark, sf_dir).persist()
    sig = sh.groupBy("doc_id").agg(
        *[F.min(minhash_str(F.col("shingle"), j)).alias(f"mh{j}") for j in range(N_MINHASH)]
    )
    rows_per_band = N_MINHASH // N_BANDS
    bands = None
    for b in range(N_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                "band_key"
            ),
        )
        bands = part if bands is None else bands.unionAll(part)
    a = bands.alias("a")
    b2 = bands.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    # Verify with exact Jaccard. At this corpus the shared-shingle pair
    # space is small (shingles are near-unique), so joining candidates
    # against the full _jaccard_pairs is the cheapest plan; at 100 TB the
    # standard refinement is to semi-join `sh` down to candidate docs
    # first so verification never touches non-candidate documents.
    verified = cand.join(_jaccard_pairs(sh), ["doc_id_a", "doc_id_b"])
    return (
        verified.filter(F.col("jaccard") >= 0.5)
        .select("doc_id_a", "doc_id_b", "jaccard")
        .orderBy("doc_id_a", "doc_id_b")
    )


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit simhash from token md5 bits (portable)."""
    docs = load_table(spark, "documents", sf_dir)
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .withColumn("tok_md5", F.md5(F.col("tok")))
    )
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(simhash_bit_sign(F.col("tok_md5"), b)).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming distance ≤ 4 over 32-bit signatures.
    Pair stage is all-pairs here (fine at this corpus size); the 100 TB
    path is the pigeonhole chunk-join (see module doc)."""
    sig = simhash_signatures(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sim_a"))
    b = sig.select(F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, F.col("doc_id_a") < F.col("doc_id_b"))
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= 4)
        .select("doc_id_a", "doc_id_b", "hamming")
        .orderBy("doc_id_a", "doc_id_b")
    )
