"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, document fingerprinting (the text side of a
training-data pipeline).

Everything is a single projection/aggregation of built-in string/array
expressions: per-row, embarrassingly parallel, no shuffle except the final
orderBy (dropped under a streaming/pipeline context). Ratios are double
divisions of exact integers and get round(…, 6) → deterministic across
engines (ties like 1/128 are exact binary fractions and round identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from roar_spark.catalog import load_table, table_row_count
from roar_spark.functions.text_fns import SHINGLE_FANOUT, tokens
from roar_spark.session import tuned_session

EN_STOP = ("the", "and", "of", "to", "a", "in", "is", "it")
ES_STOP = ("el", "la", "de", "los", "que", "y", "en", "un")
DE_STOP = ("der", "die", "das", "und", "ist", "von", "ein", "mit")

PUNCT_CLASS = "[.,;:!?]"


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals: lengths, type-token ratio,
    punctuation ratio, stopword ratio, mean token length."""
    docs = load_table(spark, "documents", sf_dir, spread=True, spread_key="doc_id")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(F.col("text")).cast("long")
    n_punct = n_chars - F.length(F.regexp_replace(F.col("text"), PUNCT_CLASS, ""))
    n_nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    n_stop = _count_in(toks, EN_STOP)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double"), 6).alias(
            "type_token_ratio"
        ),
        # nullif guard: an empty document (n_chars=0) yields a NULL ratio —
        # under Spark 4's ANSI default a bare /0 THROWS and kills the job
        # (oracle mirrors with NULLIF; token denominators are safe: split
        # of '' gives [''], size >= 1)
        F.round(n_punct.cast("double") / F.nullif(n_chars, F.lit(0)).cast("double"), 6).alias(
            "punct_ratio"
        ),
        F.round(n_stop.cast("double") / n_tok.cast("double"), 6).alias("stopword_ratio"),
        F.round(n_nonspace.cast("double") / n_tok.cast("double"), 6).alias("mean_token_len"),
    ).orderBy("doc_id")


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (n-gram-free heuristic): count hits per
    language list, argmax with deterministic tie order en > es > de."""
    docs = load_table(spark, "documents", sf_dir, spread=True, spread_key="doc_id")
    toks = tokens(F.col("text"))
    s_en, s_es, s_de = (_count_in(toks, w) for w in (EN_STOP, ES_STOP, DE_STOP))
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_de), "en")
        .when(s_es >= s_de, "es")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        s_en.alias("score_en"),
        s_es.alias("score_es"),
        s_de.alias("score_de"),
        pred.alias("lang_pred"),
        F.col("lang").alias("lang_tagged"),
    ).orderBy("doc_id")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — the digest exact-dedup
    and incremental-crawl pipelines key on."""
    docs = load_table(spark, "documents", sf_dir, spread=True, spread_key="doc_id")
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), PUNCT_CLASS, ""), r"\s+", " ")
    )
    return docs.select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).cast("long").alias("n_norm_chars"),
    ).orderBy("doc_id")


# GPT-2-style pretokenizer, simplified to the lookahead-free subset so the
# same pattern runs on Java regex (Spark) and RE2 (DuckDB): contractions,
# space-prefixed letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'(?:s|t|d|m|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: count pretokenizer matches (the standard
    proxy for LLM token budgets) next to whitespace tokens, plus the
    tokens-per-word expansion ratio."""
    docs = load_table(spark, "documents", sf_dir, spread=True, spread_key="doc_id")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)  # group 0 = full match
    ws = tokens(F.col("text"))
    n_bpe = F.size(bpe).cast("long")
    n_ws = F.size(ws).cast("long")
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(n_bpe.cast("double") / n_ws.cast("double"), 6).alias("bpe_per_word"),
        # try_element_at: zero pretokenizer matches (empty/whitespace doc)
        # must yield NULL (DuckDB's bpe[1] does) — plain element_at THROWS
        # under the Spark 4 ANSI default
        F.try_element_at(bpe, F.lit(1)).alias("first_bpe_token"),
    ).orderBy("doc_id")


N_FEATURE_BUCKETS = 64


def _hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse hashed term frequencies (doc_id, bucket, n_tokens) — the
    shared TF stage of text_hashing_features and text_tfidf. Bucket is
    pure per-token arithmetic (md5 → last two hex digits → mod 64,
    portable via the same strpos lattice simhash uses); the count is one
    partial-agg shuffle on (doc_id, bucket)."""
    from roar_spark.functions.text_fns import hex_digit_val

    docs = load_table(spark, "documents", sf_dir, spread=True)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    md5 = F.md5(F.col("t"))
    bucket = (
        (hex_digit_val(md5, 31) * 16 + hex_digit_val(md5, 32)) % N_FEATURE_BUCKETS
    ).cast("long")
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


def text_hashing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): bag-of-words counts into a
    fixed 64-bucket space, emitted as sparse (doc_id, bucket, n_tokens)
    rows — HashingTF re-expressed relationally.

    The scale property IS the trick: no vocabulary is built or broadcast
    (unbounded-vocab corpora can't afford one); the feature dimension
    bounds output regardless of corpus size. See _hashed_tf for the plan
    shape.

    The (doc_id, bucket) groupBy shuffles ~1 row per token occurrence's
    distinct bucket (partial agg collapses only same-doc same-bucket
    repeats — most tokens land in distinct buckets), so at explode fan-out
    the shuffle volume tracks n_docs * SHINGLE_FANOUT: width is tuned
    per-query like the dedup shingle family (ADVICE r5)."""
    spark = tuned_session(spark, table_row_count("documents", sf_dir) * SHINGLE_FANOUT)
    return _hashed_tf(spark, sf_dir).orderBy("doc_id", "bucket")


import threading

_TF_CACHE: list[DataFrame] = []
_TF_CACHE_LOCK = threading.Lock()
_GOPHER_CACHE: list = []  # gopher's tokenized projection (same contract)
_GOPHER_CACHE_LOCK = threading.Lock()


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weighting over the hashed feature space — the classic
    retrieval/quality-featurization step, vocabulary-free so it runs at
    unbounded corpus scale.

    Plan: the shared hashed-TF stage (one (doc_id, bucket) partial-agg
    shuffle), then document frequency per bucket — an aggregation whose
    output is bounded by N_FEATURE_BUCKETS rows at ANY corpus size — is
    BROADCAST back onto the TF table (no second shuffle of the big side).
    The corpus total-docs scalar rides the same tiny broadcast via a
    cross join of two bounded aggregates.

    Determinism across engines: idf = round(ln((1+N)/(1+df)) + 1, 6)
    (sklearn's smoothed form) is rounded BEFORE the multiply, so the
    product tf × idf multiplies identical doubles in both engines and the
    final round(…, 6) matches exactly; ln of a ratio of small exact
    integers agrees to well under 1e-6 between libm implementations."""
    # per-query shuffle width for the (doc_id, bucket) TF shuffle — same
    # rationale as text_hashing_features; tuned BEFORE any table builds so
    # every branch (tf, df_tab, n_docs) lives on the one tuned session
    spark = tuned_session(spark, table_row_count("documents", sf_dir) * SHINGLE_FANOUT)
    # release the previous invocation's cache first (shared contract:
    # roar_spark.caching — bounding the leak to ONE cached TF table per
    # session; sweeps call this dozens of times)
    from roar_spark.caching import drain_scoped, register_scoped

    # drain BEFORE persisting (caching.drain_scoped): a repeated identical
    # TF plan adopts the previous invocation's live entry, and a
    # register-after drain would unpersist it mid-query
    drain_scoped(_TF_CACHE, _TF_CACHE_LOCK)
    tf = _hashed_tf(spark, sf_dir).persist()
    register_scoped(_TF_CACHE, _TF_CACHE_LOCK, [tf])
    # Materialize before the plan branches (the dedup-family lesson):
    # tf feeds BOTH the broadcast df side and the probe side, and Spark
    # plans the tokenize+explode+agg subtree once PER BRANCH (no static
    # exchange reuse across a broadcast boundary — verified in the
    # formatted plan). The cached table is the bounded sparse TF matrix
    # (≤ docs × 64 rows), far smaller than re-tokenizing the corpus.
    tf.count()
    # footer read, not a scan: an agg(count) branch here re-ran a Spark
    # scan job over the documents table on EVERY action against the
    # returned plan (inside the broadcast build) — table_row_count is the
    # repo's stated convention for corpus-size scalars (r8 review), and a
    # literal also removes the crossJoin the 1-row aggregate needed
    n_corpus_docs = table_row_count("documents", sf_dir)
    df_tab = (
        tf.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "bucket",
            "df",
            F.round(
                F.log(
                    F.lit(1.0 + float(n_corpus_docs))
                    / (F.lit(1.0) + F.col("df").cast("double"))
                )
                + F.lit(1.0),
                6,
            ).alias("idf"),
        )
    )
    return (
        tf.join(F.broadcast(df_tab), "bucket")
        .select(
            "doc_id",
            "bucket",
            F.col("n_tokens").alias("tf"),
            "df",
            F.round(F.col("n_tokens").cast("double") * F.col("idf"), 6).alias("tfidf"),
        )
        .orderBy("doc_id", "bucket")
    )


TOP_TOKENS_K = 50


def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy hitters: top-50 tokens by document frequency and
    raw count. Partial aggregation collapses per-partition duplicates
    map-side; the final top-k is TakeOrderedAndProject (per-partition
    heaps + a 50-row driver merge) — no global sort at any corpus size.
    Exact here; at extreme cardinality the same query swaps the exact
    count for a count-min/space-saving sketch."""
    docs = load_table(spark, "documents", sf_dir, spread=True)
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    return (
        tok.groupBy(F.col("t").alias("token"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(TOP_TOKENS_K)
    )


# PII scrubbing: the redaction pass every training-data pipeline runs
# before anything else. Patterns are the lookahead-free common subset of
# Java regex (Spark) and RE2 (DuckDB) so both engines match identically.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{1,3}-\d{3}-\d{4}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with audit counts: emails / phone numbers / IPv4s are
    counted then replaced by typed placeholders; the scrubbed text is
    returned as an md5 so the oracle compares full redacted content
    without hauling text through the result.

    The corpus text is synthetic and PII-free, so the op PLANTS
    deterministic PII derived from doc_id (same expression in the SQL
    oracle) — this makes the cross-engine comparison actually exercise
    every regex path instead of vacuously agreeing on zero matches.

    Shape: pure per-row projection, no shuffle but the final orderBy —
    scrubbing 100 TB is exactly a map-only scan and stays JVM-side
    (regexp_replace is a codegen'd Catalyst expression, no Python)."""
    docs = load_table(spark, "documents", sf_dir, spread=True, spread_key="doc_id")
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, F.concat(F.lit(" contact u"), did.cast("string"), F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.concat(F.lit(" host 10.0."), (did % 256).cast("string"), F.lit("."), (did % 100).cast("string"))).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.concat(F.lit(" call +1-555-"), F.lpad((did % 10000).cast("string"), 4, "0"))).otherwise(F.lit("")),
    )
    n_of = lambda c, p: F.size(F.regexp_extract_all(c, F.lit(p), 0)).cast("long")  # noqa: E731
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        n_of(planted, PII_EMAIL_RE).alias("n_emails"),
        n_of(planted, PII_PHONE_RE).alias("n_phones"),
        n_of(planted, PII_IP_RE).alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    ).orderBy("doc_id")


def text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate measurement (the RefinedWeb/CCNet-style
    duplicated-n-gram signal): per doc, the fraction of its distinct word
    3-grams that also occur in at least one OTHER document. Near-duplicate
    and template-heavy docs score high and get dropped by the curation
    gate downstream.

    Shape: ONE pass over the distinct (doc_id, shingle) explode — an
    unordered count window partitioned by shingle attaches each row's
    document frequency in place (rows are distinct per (doc, shingle), so
    count(*) IS the df), then one per-doc aggregation keyed by doc_id.
    Single corpus scan, two shuffles (shingle, then doc_id), no join, no
    branch recomputation. Measured against the alternatives at 80 k docs:
    df-agg + join-back 18 s, df-agg + dup-set semi-join 20 s (both
    evaluate the tokenize+shingle subtree once per branch), window form
    9 s — and 1.4 s vs 2.4 s at sf0.1. Caveat at adversarial boilerplate
    density: a window groups each hot shingle's rows into one task (no
    map-side partial collapse), so a shingle occurring ~10⁹ times wants
    the salted two-phase df aggregation + broadcast dup-set semi-join
    instead; for real corpora the hot-shingle mass sits far below the
    per-task ceiling."""
    # the shingle-keyed count window shuffles the FULL fan-out table with
    # no map-side reduction — the same ~SHINGLE_FANOUT rows/doc volume
    # whose 4M-doc spill motivated per-query width tuning (ADVICE r5)
    spark = tuned_session(spark, table_row_count("documents", sf_dir) * SHINGLE_FANOUT)
    # the dedup family's shingle builder, not an inline re-implementation:
    # the two copies had already duplicated the <3-token backwards-sequence
    # guard and the map-side array_distinct placement — shared logic that
    # must not drift (r8 review)
    from roar_spark.operators.dedup import _doc_shingles

    sh = _doc_shingles(spark, sf_dir, spread=True)
    per = sh.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
    return (
        per.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("long").alias("n_dup_shingles"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup_shingles",
            F.round(
                F.col("n_dup_shingles").cast("double") / F.col("n_shingles").cast("double"), 6
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# Gopher-style repetition/quality gate thresholds (Rae et al. 2021 §A1.1
# shapes, constants calibrated to this corpus so the flag is non-trivial).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.2
GOPHER_MAX_DUP_TRIGRAM_FRAC = 0.1


def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher rules family):
    per-doc token count, fraction of token-bigram occurrences taken by the
    single most frequent bigram, fraction of trigram occurrences whose
    trigram repeats within the doc, alphabetic-token ratio, and the
    resulting keep/drop flag. ``gopher_pass`` enforces the token-count and
    repetition bounds; ``alpha_ratio`` is emitted as an INFORMATIONAL
    signal (the full Rae-et-al. rule set also thresholds it — consumers
    wanting that gate filter on the column; it is not folded into the
    flag here so the flag's semantics stay exactly the repetition rules
    the constants name).

    Shape: the corpus is TOKENIZED ONCE into a scoped-cached (doc_id,
    tokens) projection; the per-doc stats and both n-gram aggregations
    (each keyed by (doc_id, gram) then re-aggregated by doc_id — partial
    aggregation collapses repeats map-side) all derive from it and join
    back on doc_id. Before r8 the three branches each re-scanned and
    re-tokenized the corpus (no exchange reuse applies across differing
    branch shapes) — 3× the map work the docstring claimed. Every shuffle
    is keyed by doc_id or (doc_id, gram); nothing is quadratic and no
    Python runs in the per-row path.

    ``spread=True``: the n-gram explode+count is the heaviest pre-shuffle
    map stage in the corpus (measured 8.5 s single-task vs 3.9 s spread
    at sf0.1 on a single-row-group file), so this operator opts into the
    post-scan round-robin repartition — a no-op on multi-row-group data."""
    from roar_spark.functions.text_fns import word_shingles

    # the (doc_id, gram) shuffles carry ~1 row per gram occurrence (in-doc
    # repeats are rare, so partial agg collapses little) — tune width from
    # the explode fan-out like the dedup shingle family (ADVICE r5)
    spark = tuned_session(spark, table_row_count("documents", sf_dir) * SHINGLE_FANOUT)
    from roar_spark.caching import register_scoped

    from roar_spark.caching import drain_scoped

    # drain BEFORE persisting (caching.drain_scoped, same as the TF cache)
    drain_scoped(_GOPHER_CACHE, _GOPHER_CACHE_LOCK)
    docs = load_table(spark, "documents", sf_dir, spread=True)
    tok_df = docs.select("doc_id", tokens(F.col("text")).alias("toks")).persist()
    register_scoped(_GOPHER_CACHE, _GOPHER_CACHE_LOCK, [tok_df])
    tok_df.count()  # materialize BEFORE the plan branches (the TF lesson)
    toks = F.col("toks")
    base = tok_df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast("double")
            / F.size(toks).cast("double"),
            6,
        ).alias("alpha_ratio"),
    )

    def gram_counts(n: int) -> DataFrame:
        return (
            tok_df.filter(F.size(toks) >= n)
            .select("doc_id", F.explode(word_shingles(toks, n)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    bigram = gram_counts(2).groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "top_bigram_frac"
        )
    )
    trigram = gram_counts(3).groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).cast("double")
            / F.sum("c").cast("double"),
            6,
        ).alias("dup_trigram_frac")
    )
    joined = (
        base.join(bigram, "doc_id", "left")
        .join(trigram, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)).alias("dup_trigram_frac"),
            "alpha_ratio",
        )
    )
    keep = (
        (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
        & (F.col("n_tokens") <= GOPHER_MAX_TOKENS)
        & (F.col("top_bigram_frac") <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (F.col("dup_trigram_frac") <= GOPHER_MAX_DUP_TRIGRAM_FRAC)
    )
    return joined.withColumn("gopher_pass", keep).orderBy("doc_id")


# Context-window chunking knobs: 32-token windows advancing by 24 tokens
# (8-token overlap) — the RAG / training-sequence preparation shape, sized
# so the synthetic corpus (≤ ~90 tokens/doc) actually fans out.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token-window chunking — the document→context-
    window fan-out that precedes embedding or training-sequence assembly in
    a retrieval/training pipeline. Chunk ``i`` of a doc covers tokens
    ``[i·stride, i·stride + window)``; the last chunk truncates at the end
    of the doc, and every token lands in at least one chunk.

    Shape: pure map-side fan-out — chunk count from integer arithmetic on
    the token count, ``sequence``+``explode`` to produce chunk ids,
    ``slice`` to cut each window out of the one tokenization (no
    re-tokenize per chunk), md5 of the joined slice as the chunk content
    digest. One scan, zero shuffles before the display sort; at 100 TB this
    parallelizes per input split with no data movement, and the ~w/s
    output-row amplification is the operator's contract, not a plan cost."""
    docs = load_table(spark, "documents", sf_dir, spread=True, spread_key="doc_id")
    toks = tokens(F.col("text"))
    w, s = CHUNK_TOKENS, CHUNK_STRIDE
    base = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("n_tokens")
    )
    # ceil((n - w) / s) via integer floor-division keeps the chunk count in
    # exact int64 arithmetic in both engines (no float ceil anywhere)
    n_chunks = F.when(F.col("n_tokens") <= w, F.lit(1).cast("long")).otherwise(
        F.lit(1) + F.floor((F.col("n_tokens") - w + (s - 1)) / F.lit(s))
    )
    chunks = base.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1))
    )
    sliced = F.slice(
        F.col("toks"), (F.col("chunk_id") * s + 1).cast("int"), F.lit(w)
    )
    return (
        chunks.select(
            "doc_id",
            "chunk_id",
            (F.col("chunk_id") * s).alias("start_tok"),
            F.size(sliced).cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", sliced)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )
