"""Semantic invariants for sequence packing and PII scrubbing that the
row-hash oracle can't express: token conservation, window fullness, and
redaction completeness on planted PII."""

from __future__ import annotations

from pyspark.sql import functions as F

from roar_spark.operators.packing import PACK_WINDOW, pack_sequences
from roar_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_packing_conserves_tokens(spark):
    from roar_spark.catalog import load_table
    from roar_spark.functions.text_fns import tokens

    packed = pack_sequences(spark, SF)
    total_packed = packed.agg(F.sum("window_tokens")).collect()[0][0]
    docs = load_table(spark, "documents", SF)
    total_docs = docs.select(F.size(tokens(F.col("text"))).alias("n")).agg(F.sum("n")).collect()[0][0]
    assert total_packed == total_docs


def test_packing_windows_full_except_shard_tail(spark):
    rows = pack_sequences(spark, SF).collect()
    last_per_source = {}
    for r in rows:
        last_per_source[r.source] = max(last_per_source.get(r.source, -1), r.window_id)
    for r in rows:
        if r.window_id < last_per_source[r.source]:
            assert r.window_tokens == PACK_WINDOW, (r.source, r.window_id, r.window_tokens)
        else:
            assert 1 <= r.window_tokens <= PACK_WINDOW


def test_pii_scrub_removes_all_planted_pii(spark):
    out = QUERIES["text_pii_scrub"](spark, SF)
    agg = out.agg(
        F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p"), F.sum("n_ips").alias("i")
    ).collect()[0]
    # planted at doc_id % 3 / % 7 / % 5 — every family must actually fire
    assert agg.e > 0 and agg.p > 0 and agg.i > 0


def test_pii_scrub_idempotent_on_clean_text(spark):
    # placeholders must not themselves match any PII pattern: scrubbing
    # the scrubbed text is the identity (checked via planted PII rows)
    from roar_spark.operators.text import PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE

    df = spark.createDataFrame(
        [("x <EMAIL> y <IP> z <PHONE> done",)], "scrubbed string"
    )
    for pat in (PII_EMAIL_RE, PII_PHONE_RE, PII_IP_RE):
        n = df.select(F.size(F.regexp_extract_all("scrubbed", F.lit(pat), 0)).alias("n")).collect()[0].n
        assert n == 0
