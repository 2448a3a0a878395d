"""End-to-end training-data curation — the composite pipeline a 100 TB
pretraining corpus actually runs, as ONE declarative Spark plan:

    quality gate  →  language gate  →  exact-dedup keep-list  →
    content-stable split assignment

Each stage reuses the primitives of its standalone operator (text.py
signals, dedup.py digest keep-list, sampling.py hash split), so the
composite proves the operators COMPOSE — Catalyst fuses the three per-row
gates into one projection+filter over the scan and the only shuffles are
the dedup keep-list aggregation and its join back.

Scale notes: the keep-list is (md5(text) → min doc_id), shuffled as
16-byte digests; the join back to documents is digest-keyed (never text);
every other stage is a map-side expression. At 100 TB this plan is
scan + 1 digest aggregation + 1 digest join — the minimum any exact-dedup
curation can do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table
from roar_spark.functions.text_fns import tokens
from roar_spark.operators.sampling import _TRAIN_END, _VAL_END, _hash16
from roar_spark.operators.text import EN_STOP, PUNCT_CLASS, _count_in

MIN_TOKENS = 5
MAX_TOKENS = 1_000
MAX_PUNCT_RATIO = 0.2
MIN_TTR = 0.3  # type-token ratio floor (boilerplate/repetition gate)


def quality_gate(docs: DataFrame) -> DataFrame:
    """The per-row quality + English-marker gate over any (doc_id, text)
    relation — batch OR streaming (pure projection/filter expressions, so
    it composes into a micro-batch plan unchanged). Returns
    (doc_id, digest, n_tokens) for the survivors."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(F.col("text")).cast("long")
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, ""))
    ).cast("double") / n_chars.cast("double")
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double")
    n_stop = _count_in(toks, EN_STOP)
    return docs.select(
        "doc_id", F.md5(F.col("text")).alias("digest"), n_tok.alias("n_tokens")
    ).filter(
        (n_tok >= MIN_TOKENS)
        & (n_tok <= MAX_TOKENS)
        & (punct_ratio <= MAX_PUNCT_RATIO)
        & (ttr >= MIN_TTR)
        & (n_stop > 0)  # English-marker gate
    )


def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated per-split corpus stats: docs that pass the quality and
    English-marker gates, survive exact dedup (smallest doc_id per content
    digest wins), with 80/10/10 hash-split assignment — counts and token
    totals per split."""
    gated = quality_gate(load_table(spark, "documents", sf_dir))
    # exact-dedup keep-list over the GATED set: min doc_id per digest
    keep = gated.groupBy("digest").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(keep, ["digest", "doc_id"], "left_semi")

    h = _hash16(F.col("doc_id"))
    split = F.when(h < _TRAIN_END, "train").when(h < _VAL_END, "val").otherwise("test")
    return (
        kept.select("doc_id", "n_tokens", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


def curate_stream(parsed: DataFrame) -> DataFrame:
    """The curation pipeline as a CONTINUOUS ingest transform: the same
    quality/language gate expressions (quality_gate — Catalyst fuses them
    into the micro-batch scan), exact dedup as stateful first-seen-wins
    dropDuplicates on the content digest, and the content-stable split
    assignment. Returns an append-mode streaming DataFrame of
    (doc_id, digest, n_tokens, split).

    Batch-vs-stream divergence, by design: batch pipeline_curate keeps
    MIN(doc_id) per digest (order-free, exactly reproducible); a stream
    cannot know the future, so the streaming form keeps the FIRST
    ARRIVAL. On a replayed (source-ordered) corpus the two agree.

    Scale note: dedup state is one row per distinct digest (16-byte key)
    — the contract of exact whole-corpus dedup. Pipelines that only need
    near-window dedup should bound it with
    streaming_dedup_within_watermark instead."""
    gated = quality_gate(parsed)
    deduped = gated.dropDuplicates(["digest"])
    h = _hash16(F.col("doc_id"))
    split = F.when(h < _TRAIN_END, "train").when(h < _VAL_END, "val").otherwise("test")
    return deduped.select("doc_id", "digest", "n_tokens", split.alias("split"))
