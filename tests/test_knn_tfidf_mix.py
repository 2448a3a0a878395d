"""Semantics + plan hygiene for the round-3 additions: k-NN label vote,
hashed TF-IDF, fixed-k stratum sampling, and the corpus mixture report.
Cross-engine value parity is the oracle's job (tools/check.py); these pin
the properties the oracle can't see — vote consistency, IDF direction,
exact-k bounds, share closure — and the plan shapes that must survive a
100× scale-up (broadcast sides, partial aggregation)."""

from __future__ import annotations

from collections import Counter

from roar_spark.operators.sampling import (
    K_PER_STRATUM,
    corpus_mix_report,
    sample_topk_per_stratum,
)
from roar_spark.operators.similarity import KNN_K, N_QUERIES, embedding_knn_classify
from roar_spark.operators.text import text_tfidf
from tests.test_plans import plan_of

SF = "/root/testdata/sf0.001"


def test_knn_vote_is_consistent_with_neighbor_majority(spark):
    rows = embedding_knn_classify(spark, SF).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        # the winning label can never have fewer votes than a majority
        # share would allow, and votes are bounded by k
        assert 1 <= r.n_votes <= KNN_K
    # recompute one query's vote from the brute neighbor list to pin the
    # vote/tie-break wiring end to end
    from roar_spark.catalog import load_table
    from pyspark.sql import functions as F

    from roar_spark.functions.vector import cosine, norm

    emb = load_table(spark, "embeddings", SF).withColumn("nrm", norm(F.col("embedding")))
    q = emb.filter(F.col("vec_id") == 0).first()
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .withColumn(
            "cos",
            F.round(
                cosine(F.lit(q.embedding), F.col("embedding"), F.lit(q.nrm), F.col("nrm")),
                6,
            ),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(KNN_K)
        .collect()
    )
    votes = Counter(r.label for r in scored)
    best_cos = {lbl: max(r.cos for r in scored if r.label == lbl) for lbl in votes}
    expect = min(
        votes, key=lambda lbl: (-votes[lbl], -best_cos[lbl], lbl)
    )
    got = next(r for r in rows if r.query_id == 0)
    assert got.predicted_label == expect
    assert got.n_votes == votes[expect]


def test_knn_broadcasts_query_side(spark):
    plan = plan_of(spark, "embedding_knn_classify")
    # non-equi scoring join against a bounded query set must broadcast it:
    # the labeled corpus streams with no shuffle below the rank window
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_idf_decreases_with_document_frequency(spark):
    rows = text_tfidf(spark, SF).collect()
    # per-bucket (df, idf) pairs: idf strictly decreases as df grows
    per_bucket = {}
    for r in rows:
        per_bucket[r.bucket] = (r.df, r.tfidf / r.tf if r.tf else 0.0)
    pairs = sorted(set(per_bucket.values()))
    dfs = [p[0] for p in pairs]
    idfs = [p[1] for p in pairs]
    assert all(a < b for a, b in zip(dfs, dfs[1:]))
    assert all(a > b for a, b in zip(idfs, idfs[1:]))
    # every doc-bucket row keeps tfidf = tf × idf ≥ idf > 0
    assert all(r.tfidf > 0 for r in rows)


def test_tfidf_broadcasts_the_bucket_side(spark):
    plan = plan_of(spark, "text_tfidf")
    # df/idf table is bounded by N_FEATURE_BUCKETS rows → must broadcast;
    # a shuffle join here would re-shuffle the whole TF table for a
    # 64-row dimension
    assert "BroadcastHashJoin" in plan
    # TF aggregation keeps map-side partial aggregation
    assert plan.count("HashAggregate") >= 2


def test_sample_topk_exact_k_and_partition_invariance(spark):
    rows = sample_topk_per_stratum(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert len(rs) <= K_PER_STRATUM
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1))
    # content-stable: identical output under a different partitioning
    from roar_spark.catalog import load_table

    n_parts = load_table(spark, "documents", SF).rdd.getNumPartitions()
    assert n_parts >= 1  # sanity; determinism itself is pinned by check.py
    again = sample_topk_per_stratum(spark, SF).collect()
    assert rows == again


def test_mix_report_shares_close(spark):
    rows = corpus_mix_report(spark, SF).collect()
    assert abs(sum(r.pct_docs for r in rows) - 100.0) < 1e-3
    assert abs(sum(r.pct_tokens for r in rows) - 100.0) < 1e-3
    # counts are internally consistent
    assert all(r.n_tokens >= r.n_docs for r in rows)


def test_tfidf_matches_driver_side_recompute(spark):
    """Recompute TF, DF and the smoothed IDF in plain Python over the raw
    parquet — the distributed build must agree exactly on the integer
    counts and to float precision on the weights (order-independence and
    bucket-hash portability are the point)."""
    import hashlib
    import math
    import re

    rows = text_tfidf(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    tf_ref: dict[tuple, int] = {}
    for d in docs:
        for t in re.split(r"\s+", d.text.strip().lower()):
            b = int(hashlib.md5(t.encode()).hexdigest()[30:32], 16) % 64
            k = (d.doc_id, b)
            tf_ref[k] = tf_ref.get(k, 0) + 1
    df_ref: dict[int, int] = {}
    for (_, b) in tf_ref:
        df_ref[b] = df_ref.get(b, 0) + 1
    n = len(docs)
    assert len(rows) == len(tf_ref)
    for r in rows:
        assert r.tf == tf_ref[(r.doc_id, r.bucket)]
        assert r.df == df_ref[r.bucket]
        idf = round(math.log((1.0 + n) / (1.0 + r.df)) + 1.0, 6)
        assert abs(r.tfidf - round(r.tf * idf, 6)) < 1e-9


def test_mix_report_matches_driver_side_recompute(spark):
    import re

    rows = corpus_mix_report(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    ref: dict[tuple, list] = {}
    for d in docs:
        k = (d.source, d.lang)
        toks = len(re.split(r"\s+", d.text.strip().lower()))
        cur = ref.setdefault(k, [0, 0, 0])
        cur[0] += 1
        cur[1] += toks
        cur[2] += d.n_chars
    assert len(rows) == len(ref)
    tot_docs = sum(v[0] for v in ref.values())
    tot_toks = sum(v[1] for v in ref.values())
    for r in rows:
        nd, nt, nc = ref[(r.source, r.lang)]
        assert (r.n_docs, r.n_tokens, r.n_chars) == (nd, nt, nc)
        assert abs(r.pct_docs - round(100.0 * nd / tot_docs, 6)) < 1e-9
        assert abs(r.pct_tokens - round(100.0 * nt / tot_toks, 6)) < 1e-9


def test_sample_topk_gets_window_group_limit(spark):
    # Spark's rank-filter pushdown must insert a MAP-SIDE WindowGroupLimit
    # (partial top-k per input partition BEFORE the lang shuffle) — the
    # property that keeps a billion-row stratum from sorting in one task
    plan = plan_of(spark, "sample_topk_per_stratum")
    assert plan.count("WindowGroupLimit") >= 2  # partial (map-side) + final


def test_multimodal_features_kernel_is_arrow_batched_and_exact(spark):
    from roar_spark.operators.multimodal import multimodal_features

    plan = plan_of(spark, "multimodal_features")
    assert "MapInPandas" in plan  # Arrow-batched kernel, not a row UDF
    rows = multimodal_features(spark, SF).collect()
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{SF}/documents.parquet").collect()}
    assert len(rows) == len(docs)
    import numpy as np

    for r in rows[:25]:
        b = np.frombuffer(docs[r.doc_id].encode(), dtype=np.uint8)
        hist = np.bincount(b % 16, minlength=16)
        assert r.n_bytes == b.size and r.sum_bytes == int(b.sum())
        assert r.hist_csv == ",".join(str(int(c)) for c in hist)
        assert r.top_bin == int(hist.argmax())


def test_multimodal_features_null_text_yields_zero_row(spark, tmp_path):
    """A NULL text payload must not kill the job (np.frombuffer(None)
    raised before the coalesce guard); the REAL operator on a corpus with a
    NULL text emits the same all-zero feature row the DuckDB oracle does
    for encode(coalesce(text, ''))."""
    import pandas as pd

    from roar_spark.operators.multimodal import multimodal_features

    pd.DataFrame({"doc_id": [1, 2], "text": ["ab", None]}).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = {r.doc_id: r for r in multimodal_features(spark, str(tmp_path)).collect()}
    assert out[2].n_bytes == 0 and out[2].sum_bytes == 0 and out[2].top_bin == 0
    assert out[2].hist_csv == ",".join(["0"] * 16)
    assert out[1].n_bytes == 2 and out[1].sum_bytes == ord("a") + ord("b")


def test_bulk_knn_classify_covers_corpus_and_votes_consistently(spark):
    """The bulk (LSH-candidate) classifier: every vector gets exactly one
    prediction; for the brute operator's query subset, the vote stage
    applied to the LSH candidate set is self-consistent (recomputed in
    Python from the vector's own reranked neighbors); the plan joins on
    bucket keys only — no broadcast-nested-loop over the corpus and no
    cartesian product anywhere."""
    from roar_spark.operators.similarity import embedding_knn_classify_bulk

    df = embedding_knn_classify_bulk(spark, SF)
    rows = df.collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n
    assert len({r.query_id for r in rows}) == n
    for r in rows:
        assert 1 <= r.n_votes <= KNN_K

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # candidate equi-join only


def test_bulk_knn_classifies_planted_clusters(spark, tmp_path_factory):
    """On a corpus with REAL label structure (10 tight clusters, one per
    label, cos ≈ 0.97 within vs ≈ 0.5 across), the LSH-candidate bulk
    classifier must (a) agree with the brute classifier on the query
    subset, and (b) recover ≥ 95 % of true labels corpus-wide — the
    regime the composition exists for. The random-label driver corpus
    can't test this (k-NN votes there are noise by construction)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.similarity import embedding_knn_classify_bulk

    rng = np.random.default_rng(11)
    n_labels, per, dim = 10, 100, 64
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    # vec_ids 0..9 are one member of each cluster → they are the brute
    # operator's query subset (vec_id < N_QUERIES)
    for i in range(per):
        for lbl in range(n_labels):
            v = centers[lbl] + 0.12 * rng.standard_normal(dim)
            vecs.append((v / np.linalg.norm(v)).astype("float32"))
            labels.append(lbl)
    d = tmp_path_factory.mktemp("clusters")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    brute = {r.query_id: r for r in embedding_knn_classify(spark, str(d)).collect()}
    bulk = {r.query_id: r for r in embedding_knn_classify_bulk(spark, str(d)).collect()}
    assert len(bulk) == n_labels * per
    for q, b in brute.items():
        assert bulk[q].predicted_label == b.predicted_label
    acc = sum(1 for r in bulk.values() if r.predicted_label == r.true_label) / len(bulk)
    assert acc >= 0.95


def test_bulk_knn_screen_rerank_identical_output(spark, tmp_path_factory):
    """The screen-scored rerank (large-n dispatch: the final score is the
    screen's own float64 matmul cosine, max over shared buckets, rounded
    to 6 — no embedding ever re-joined onto pair rows) must produce
    byte-identical classifications to the exact-fold rerank: round(·, 6)
    absorbs the ~1e-15 summation-order gap between BLAS and the ordered
    fold. Pinned on a labeled cluster corpus WITH a zero-norm cohort so
    the screen path's in-kernel sentinel cut is held to the exact path's
    NULL-cosine abstain contract too."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.similarity import KNN_K, embedding_knn_classify_bulk

    rng = np.random.default_rng(23)
    n_labels, per, dim = 8, 80, 32
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for i in range(per):
        for lbl in range(n_labels):
            v = centers[lbl] + 0.15 * rng.standard_normal(dim)
            vecs.append((v / np.linalg.norm(v)).astype("float32"))
            labels.append(lbl)
    for _ in range(KNN_K):
        vecs.append(np.zeros(dim, dtype="float32"))
        labels.append(99)
    d = tmp_path_factory.mktemp("screen_rerank")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    exact = sorted(
        map(
            tuple,
            embedding_knn_classify_bulk(spark, str(d), force_screen_rerank=False).collect(),
        )
    )
    screen = sorted(
        map(
            tuple,
            embedding_knn_classify_bulk(spark, str(d), force_screen_rerank=True).collect(),
        )
    )
    assert screen == exact
    # the zero-norm cohort abstains on BOTH paths (n_votes 0, null label)
    by_id = {r[0]: r for r in screen}
    for q in range(len(vecs) - KNN_K, len(vecs)):
        assert by_id[q][2] is None and by_id[q][3] == 0


def test_bulk_knn_screen_rerank_never_ships_embeddings_on_pairs(spark):
    """Plan pin for the 4M disk-ceiling fix: the screen-scored rerank's
    executed plan must contain NO rerank join of embeddings onto survivor
    pairs — `q_emb` (the query-side embedding alias that marks the exact
    rerank join) must be absent, while the exact path's plan carries it.
    The only embedding-bearing stage left is the screen explosion inside
    _knn_screened_candidates."""
    from roar_spark.operators.similarity import embedding_knn_classify_bulk

    screen_plan = (
        embedding_knn_classify_bulk(spark, SF, force_screen_rerank=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exact_plan = (
        embedding_knn_classify_bulk(spark, SF, force_screen_rerank=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "q_emb" not in screen_plan
    assert "q_emb" in exact_plan
    # still candidate equi-joins only; the probe-free screen is the r11
    # sorted-stream MapInPandas kernel (per-batch group slicing), not a
    # per-group FlatMapGroupsInPandas call
    assert "CartesianProduct" not in screen_plan
    assert "BroadcastNestedLoopJoin" not in screen_plan
    assert "FlatMapGroupsInPandas" not in screen_plan
    assert "MapInPandas" in screen_plan


def test_brute_matmul_dispatch_identical_output(spark, tmp_path_factory):
    """sim_brute_topk and embedding_knn_classify dispatch their scoring to
    the Arrow matmul kernel above the size cutoff (the exact expression
    fold measured fold-bound at ~200 s for 16M×10 pairs — SCALE.md r7).
    Forced A/B on a labeled corpus with a zero-norm query AND zero-norm
    corpus rows: outputs must be identical, including the degenerate-query
    absence contract (a zero-norm query has only NULL cosines on the exact
    path and an all-NaN column in the kernel — no rows either way)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.similarity import (
        N_QUERIES,
        embedding_knn_classify,
        sim_brute_topk,
    )

    rng = np.random.default_rng(31)
    n, dim = 3000, 32
    vecs = [v / np.linalg.norm(v) for v in rng.standard_normal((n, dim))]
    vecs[3] = np.zeros(dim)  # zero-norm QUERY (vec_id 3 < N_QUERIES)
    for i in range(50, 60):
        vecs[i] = np.zeros(dim)  # zero-norm corpus rows
    d = tmp_path_factory.mktemp("brute_matmul")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(np.asarray(v, dtype="float32")) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([i % 7 for i in range(n)], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    for fn in (sim_brute_topk, embedding_knn_classify):
        exact = sorted(map(tuple, fn(spark, str(d), force_matmul=False).collect()))
        matmul = sorted(map(tuple, fn(spark, str(d), force_matmul=True).collect()))
        assert matmul == exact, fn.__name__
        # the zero-norm query is absent from both (never a voter/neighbor)
        assert all(r[0] != 3 for r in matmul), fn.__name__
        assert len({r[0] for r in matmul}) == N_QUERIES - 1


def test_brute_matmul_plan_is_arrow_batched(spark):
    """The matmul scoring path must be ONE Arrow-batched mapInPandas over
    the corpus — no row-at-a-time Python, no cartesian/nested-loop join
    (the broadcast-join + fold shape is the exact path's)."""
    from roar_spark.operators.similarity import sim_brute_topk

    plan = (
        sim_brute_topk(spark, SF, force_matmul=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_ops_survive_empty_documents(spark, tmp_path):
    """Empty/whitespace docs crash a Spark-4 ANSI session without the
    nullif/try_element_at guards (DIVIDE_BY_ZERO, INVALID_ARRAY_INDEX);
    the fixtures never contain them, so pin the behavior on a constructed
    corpus: ratio NULL for zero-char docs, NULL first token, no throw."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.text import text_bpe_tokens, text_stats

    d = tmp_path / "tiny"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["", "   ", "the quick fox."], pa.string()),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["s"] * 3),
                "n_chars": pa.array([0, 3, 14], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    stats = {r.doc_id: r for r in text_stats(spark, str(d)).collect()}
    assert stats[1].punct_ratio is None  # 0 chars → null, not a crash
    assert stats[3].punct_ratio is not None
    bpe = {r.doc_id: r for r in text_bpe_tokens(spark, str(d)).collect()}
    assert bpe[1].first_bpe_token is None
    assert bpe[3].first_bpe_token is not None


def test_bulk_knn_blocked_screen_identical_output(spark, monkeypatch):
    """r5 review: the in-bucket matmul screen blocks over query rows so a
    skew bucket can't allocate a dense q×c float64 matrix. Each query row's
    top-k depends only on its own matrix row, so a tiny block size must
    yield byte-identical classifications to the one-shot path."""
    import roar_spark.operators.similarity as sim

    base = sorted(
        map(tuple, sim.embedding_knn_classify_bulk(spark, SF).collect())
    )
    monkeypatch.setattr(sim, "_SCREEN_BLOCK_FLOATS", 7)  # forces many blocks
    blocked = sorted(
        map(tuple, sim.embedding_knn_classify_bulk(spark, SF).collect())
    )
    assert blocked == base


def test_bulk_knn_zero_norm_vectors_do_not_poison_buckets(spark, tmp_path):
    """r5 review: zero-norm embeddings crashed the exact rerank outright
    (ANSI DIVIDE_BY_ZERO in functions/vector.py) and, inside the matmul
    screen, their NaN cosine rows could make np.partition's k-th
    statistic NaN — every comparison False, ALL of the bucket's
    candidates silently dropped. Contract after the fix: a zero-norm
    vector is NON-COMPARABLE — NULL cosine (NULL-norm guard in
    functions/vector.py:norm), never anyone's
    neighbor, and an explicit ABSTAIN row as a query; the screen maps its
    NaN entries to -2.0 so the k-th stays real and other candidates in
    the shared bucket survive. Plant 2k zero vectors — they share bucket
    0 of every table, the exact regime of the NaN-k-th bug — and assert
    no crash, abstain rows for them, and intact cluster accuracy."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.similarity import KNN_K, embedding_knn_classify_bulk

    rng = np.random.default_rng(7)
    n_labels, per, dim = 5, 40, 16
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for i in range(per):
        for lbl in range(n_labels):
            v = centers[lbl] + 0.1 * rng.standard_normal(dim)
            vecs.append((v / np.linalg.norm(v)).astype("float32"))
            labels.append(lbl)
    n_zero = 2 * KNN_K  # enough that the NaN k-th bug would have fired
    zero_label = 9
    for _ in range(n_zero):
        vecs.append(np.zeros(dim, dtype="float32"))
        labels.append(zero_label)
    d = tmp_path / "zeros"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    rows = {r.query_id: r for r in embedding_knn_classify_bulk(spark, str(d)).collect()}
    assert len(rows) == len(vecs)
    zero_ids = range(len(vecs) - n_zero, len(vecs))
    for q in zero_ids:
        # non-comparable: every candidate's cosine is NULL → abstain row
        assert rows[q].n_votes == 0
        assert rows[q].predicted_label is None
    # real vectors sharing bucket 0 with the zero cohort must NOT lose
    # their candidates to a NaN k-th statistic: accuracy stays intact
    real = [rows[q] for q in range(n_labels * per)]
    acc = sum(1 for r in real if r.predicted_label == r.true_label) / len(real)
    assert acc >= 0.95


def test_brute_matmul_empty_query_set_matches_exact_arm(spark, tmp_path):
    """A corpus with no vec_id < N_QUERIES must yield an EMPTY result on
    both dispatch arms — the matmul arm used to crash in np.stack at
    plan-construction time while the exact arm degraded gracefully
    (r7 review)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.similarity import embedding_knn_classify, sim_brute_topk

    rng = np.random.default_rng(1)
    n, dim = 100, 8
    d = tmp_path / "noq"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(1000, 1000 + n), pa.int64()),
                "embedding": pa.array(
                    [list(v.astype("float32")) for v in rng.standard_normal((n, dim))],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    for fn in (sim_brute_topk, embedding_knn_classify):
        assert fn(spark, str(d), force_matmul=False).collect() == []
        assert fn(spark, str(d), force_matmul=True).collect() == []


def test_bulk_knn_quantized_screen_same_labels(spark, tmp_path_factory):
    """The int16 screen payload (large-n dispatch: ~4× narrower shuffle,
    the r8 fix for the measured 16M disk ceiling) must classify the
    planted-cluster corpus IDENTICALLY to the float screen — label for
    label, vote count for vote count — with best_cos within the proven
    quantization bound (2δ ≈ 5e-4 at dim 32), and the zero-norm abstain
    contract intact (int16 quantizes 0⃗ → 0⃗ → NaN sentinel cut)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from roar_spark.operators.similarity import KNN_K, embedding_knn_classify_bulk

    rng = np.random.default_rng(31)
    n_labels, per, dim = 6, 70, 32
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for _ in range(per):
        for lbl in range(n_labels):
            v = centers[lbl] + 0.15 * rng.standard_normal(dim)
            vecs.append((v / np.linalg.norm(v)).astype("float32"))
            labels.append(lbl)
    for _ in range(KNN_K):
        vecs.append(np.zeros(dim, dtype="float32"))
        labels.append(99)
    d = tmp_path_factory.mktemp("quant_screen")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    kw = dict(force_screen_rerank=True)
    plain = {
        r.query_id: r
        for r in embedding_knn_classify_bulk(
            spark, str(d), quantize_screen=False, **kw
        ).collect()
    }
    quant = {
        r.query_id: r
        for r in embedding_knn_classify_bulk(
            spark, str(d), quantize_screen=True, **kw
        ).collect()
    }
    assert plain.keys() == quant.keys()
    eps = math.sqrt(dim) * (0.5 / 32767.0)
    bound = 2.0 * (2.0 * eps / (1.0 - eps / 2.0)) + 1e-6
    for qid, p in plain.items():
        q = quant[qid]
        assert (q.predicted_label, q.n_votes) == (p.predicted_label, p.n_votes), qid
        if p.best_cos is not None:
            assert abs(q.best_cos - p.best_cos) <= bound, (qid, p.best_cos, q.best_cos)
    # zero-norm cohort abstains on the quantized path too
    for qid in range(len(vecs) - KNN_K, len(vecs)):
        assert quant[qid].predicted_label is None and quant[qid].n_votes == 0
