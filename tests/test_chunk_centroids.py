"""Semantic properties of text_chunk and embedding_label_centroids (the
oracle pins cross-engine value parity; these pin coverage/exactness
invariants the oracle comparison can't see)."""

from __future__ import annotations

from roar_spark.operators.similarity import (
    CENTROID_MICRO_SCALE,
    embedding_label_centroids,
)
from roar_spark.operators.text import CHUNK_STRIDE, CHUNK_TOKENS, text_chunk

SF = "/root/testdata/sf0.001"


def test_chunks_cover_every_token_and_overlap_correctly(spark):
    rows = text_chunk(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 500  # every doc chunks (no empty docs)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.chunk_id)
        # chunk ids are dense from 0, starts advance by the stride
        assert [r.chunk_id for r in doc_rows] == list(range(len(doc_rows)))
        assert all(r.start_tok == r.chunk_id * CHUNK_STRIDE for r in doc_rows)
        # all but the last chunk are full-width; the last is non-empty —
        # together with stride < window this means every token is covered
        for r in doc_rows[:-1]:
            assert r.n_chunk_tokens == CHUNK_TOKENS
        last = doc_rows[-1]
        assert 0 < last.n_chunk_tokens <= CHUNK_TOKENS
        if len(doc_rows) > 1:
            # a second-to-last full window would have ended before the last
            # chunk's end, so the fan-out never emits a redundant tail
            assert last.n_chunk_tokens > CHUNK_TOKENS - CHUNK_STRIDE


def test_centroids_match_driver_side_exact_recompute(spark):
    rows = embedding_label_centroids(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    dim = len(emb[0].embedding)
    labels = {r.label for r in emb}
    assert len(rows) == len(labels) * dim
    # recompute the fixed-point sums in plain Python: the distributed int64
    # aggregation must agree bit-for-bit (order-independence is the point)
    sums: dict[tuple, int] = {}
    counts: dict[tuple, int] = {}
    import math

    for r in emb:
        for d, v in enumerate(r.embedding):
            k = (r.label, d)
            sums[k] = sums.get(k, 0) + math.floor(
                float(v) * CENTROID_MICRO_SCALE + 0.5
            )
            counts[k] = counts.get(k, 0) + 1
    for r in rows:
        k = (r.label, r.dim)
        assert r.sum_micro == sums[k]
        assert r.n_vecs == counts[k]
        assert abs(r.centroid - sums[k] / (counts[k] * CENTROID_MICRO_SCALE)) < 1e-6


def test_chunk_property_matches_python_reference(spark):
    """Property: for arbitrary texts, the distributed chunker must agree
    exactly (ids, starts, sizes, digests) with a 6-line Python reference
    implementation of the same contract."""
    import hashlib
    import re

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import roar_spark.operators.text as X

    def reference(text):
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t != ""]
        if not toks:
            toks = [""]  # split of empty string yields one empty token
        w, s = CHUNK_TOKENS, CHUNK_STRIDE
        n = len(toks)
        nc = 1 if n <= w else 1 + -(-(n - w) // s)
        out = []
        for i in range(nc):
            sl = toks[i * s : i * s + w]
            out.append(
                (i, i * s, len(sl), hashlib.md5(" ".join(sl).encode()).hexdigest())
            )
        return out

    token = st.text(alphabet="abcxyz0", min_size=1, max_size=5)
    texts = st.lists(token, min_size=1, max_size=90).map(" ".join)

    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.lists(texts, min_size=1, max_size=12))
    def run(batch):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
        )
        # drive the same expression pipeline text_chunk uses, over this df
        orig = X.load_table
        X.load_table = lambda spark_, name, d=None, spread=False, spread_key=None: df
        try:
            rows = X.text_chunk(spark, "ignored").collect()
        finally:
            X.load_table = orig
        got = {}
        for r in rows:
            got.setdefault(r.doc_id, []).append(
                (r.chunk_id, r.start_tok, r.n_chunk_tokens, r.chunk_md5)
            )
        for i, t in enumerate(batch):
            assert got[i] == reference(t), (t, got[i], reference(t))

    run()
