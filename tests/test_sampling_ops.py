"""Semantic properties of the sampling/shuffle/quality/quantize operators
(cross-engine value parity is the oracle's job; these pin the semantics
the oracle can't see: rate targeting, reweighting direction, bounds)."""

from __future__ import annotations

import math

from roar_spark.operators.sampling import (
    TEMP_BUDGET_DOCS,
    dataset_shuffle,
    sample_temperature,
)
from roar_spark.operators.similarity import embedding_quantize
from roar_spark.operators.text import (
    GOPHER_MAX_DUP_TRIGRAM_FRAC,
    GOPHER_MAX_TOP_BIGRAM_FRAC,
    GOPHER_MIN_TOKENS,
    text_gopher_quality,
)

SF = "/root/testdata/sf0.001"


def test_temperature_sampling_upweights_low_resource(spark):
    rows = sample_temperature(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    fracs = {lang: rs[0].sample_frac for lang, rs in by_lang.items()}
    # documents: en is the majority language → alpha-smoothing must give
    # every minority language a strictly higher sampling rate than en
    assert all(fracs[lang] > fracs["en"] for lang in fracs if lang != "en")
    # realized total tracks the budget (hash threshold is per-doc
    # Bernoulli; 4 sigma of binomial noise on ~250 draws is ~30)
    assert abs(len(rows) - TEMP_BUDGET_DOCS) < 64


def test_dataset_shuffle_is_a_permutation(spark):
    rows = dataset_shuffle(spark, SF).collect()
    assert len(rows) == 500
    assert len({r.doc_id for r in rows}) == 500
    assert len({r.shuffle_key for r in rows}) == 500  # no key collisions
    assert all(0 <= r.shard < 16 for r in rows)
    keys = [r.shuffle_key for r in rows]
    assert keys == sorted(keys)  # output IS the shuffled order
    # shards are roughly balanced (uniform hash byte): max/min < 3
    per_shard = [sum(1 for r in rows if r.shard == s) for s in range(16)]
    assert max(per_shard) < 3 * max(1, min(per_shard))


def test_gopher_flag_matches_thresholds(spark):
    rows = text_gopher_quality(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        expect = (
            r.n_tokens >= GOPHER_MIN_TOKENS
            and r.top_bigram_frac <= GOPHER_MAX_TOP_BIGRAM_FRAC
            and r.dup_trigram_frac <= GOPHER_MAX_DUP_TRIGRAM_FRAC
        )
        assert r.gopher_pass == expect, r
    # the gate must actually separate: both outcomes occur on this corpus
    assert {r.gopher_pass for r in rows} == {True, False}


def test_quantize_roundtrip_error_bounded(spark):
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    out = embedding_quantize(spark, SF).collect()
    assert len(out) == len(emb)
    for r in out[:50]:
        orig = emb[r.vec_id]
        assert max(abs(v) for v in orig) - r.abs_max < 1e-6
        step = r.abs_max / 127.0
        # q_embedding is CSV-serialized (driver canonicalizer can't hash
        # list cells — r2 finding)
        quants = [int(q) for q in r.q_embedding.split(",")]
        assert len(quants) == len(orig)
        assert all(abs(q) <= 127 for q in quants)
        # dequantized value sits within half a step of the original
        for x, q in zip(orig, quants):
            assert abs(x - q * step) <= step / 2 + 1e-9
