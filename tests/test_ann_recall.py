"""Recall and scale-sizing pins for the similarity family.

ann_lsh_topk is approximate by design (rows-only driver check), so its
quality contract lives here: on a corpus with PLANTED near neighbors
(cos ≈ 0.97 vs ≈ 0.5 random background) the OR-amplified LSH must find
≥ 90 % of them while examining far fewer candidates than the corpus —
i.e. it is actually sub-linear, not "approximate" by losing everything.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from roar_spark.operators.similarity import (
    N_QUERIES,
    N_TABLES,
    TARGET_BLOCK_ROWS,
    TARGET_BUCKET_DOCS,
    _bucket_entries,
    _with_norm,
    ann_ivf_topk,
    ann_lsh_topk,
    n_blocks_for,
    n_centroids_for,
    n_planes_for,
    n_supers_for,
)

N = 2000
DIM = 64
PLANTED_PER_QUERY = 3


def _planted_corpus() -> tuple[pa.Table, dict[int, set[int]]]:
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((N, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    truth: dict[int, set[int]] = {}
    for q in range(N_QUERIES):
        ids = set()
        for j in range(PLANTED_PER_QUERY):
            nid = N_QUERIES + q * PLANTED_PER_QUERY + j
            noisy = vecs[q] + 0.12 * rng.standard_normal(DIM)
            vecs[nid] = noisy / np.linalg.norm(noisy)
            ids.add(nid)
        truth[q] = ids
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.array(
                [v.astype("float32") for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * N, pa.int32()),
        }
    )
    return tbl, truth


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted")
    tbl, truth = _planted_corpus()
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d), truth


def test_planes_scale_with_corpus():
    # occupancy-targeted widths: each 2× corpus adds ~1 plane
    assert n_planes_for(500) == 4
    assert n_planes_for(2000) == 6
    assert n_planes_for(1_000_000) == 15
    assert n_planes_for(100_000_000) == 22
    assert n_planes_for(10**12) == 24  # capped
    assert n_planes_for(0) == 4  # floor, no log(0)


def test_blocks_scale_with_corpus():
    assert n_blocks_for(2000) == 8  # floor keeps parallelism
    assert n_blocks_for(100_000) == 49
    assert n_blocks_for(10_000_000) > n_blocks_for(1_000_000)
    # per-block rows bounded by the target regardless of n
    for n in (10_000, 1_000_000, 50_000_000):
        assert n / n_blocks_for(n) <= TARGET_BLOCK_ROWS


@pytest.mark.parametrize("ann_fn", [ann_lsh_topk, ann_ivf_topk])
def test_ann_recall_on_planted_neighbors(spark, planted_dir, ann_fn):
    d, truth = planted_dir
    out = ann_fn(spark, d).collect()
    got: dict[int, set[int]] = {}
    for r in out:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & ids) for q, ids in truth.items())
    total = sum(len(ids) for ids in truth.values())
    assert hits / total >= 0.9, f"recall {hits}/{total}"


def test_ivf_centroids_scale_with_corpus():
    assert n_centroids_for(2000) == 45  # ~sqrt(n)
    assert n_centroids_for(1_000_000) == 1000
    assert n_centroids_for(10**9) == 2048  # scale-independent cap
    assert n_centroids_for(0) == 4  # floor
    # hierarchical assignment: supers = √C → per-vector assignment work is
    # O(√C·fan) — n^¼ below the cap, constant above it
    assert n_supers_for(45) == 7
    assert n_supers_for(2048) == 46
    assert n_supers_for(1) == 1
    assert n_supers_for(0) == 1


def test_ann_buckets_are_sublinear(spark, planted_dir):
    d, _ = planted_dir
    emb = _with_norm(
        spark.read.parquet(f"{d}/embeddings.parquet")
    )
    n_planes = n_planes_for(N)
    keys = _bucket_entries(emb, n_planes, DIM, probe=False)
    occ = keys.groupBy("tbl", "bkt").count()
    stats = occ.agg(
        F.max("count").alias("mx"), F.count(F.lit(1)).alias("n_buckets")
    ).collect()[0]
    # every table's biggest bucket is a small fraction of the corpus, and
    # buckets are actually spread (≫ the 16 buckets of a fixed-width hash)
    assert stats.mx <= N / 4
    assert stats.n_buckets >= N_TABLES * 2**n_planes / 4
    # expected occupancy is within a small factor of the design target
    assert N * N_TABLES / stats.n_buckets <= 4 * TARGET_BUCKET_DOCS


def test_ivf_survives_fewer_centroids_than_probes(spark, tmp_path):
    """Tiny corpus: C = 4 centroids < IVF_NPROBE = 8. The assignment
    kernel's emit width must follow the actual top width, not k (latent
    repeat-mismatch, r8 review); every row still gets ranked neighbors."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((10, 16)).astype("float32")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(10), pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 10, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = ann_ivf_topk(spark, str(tmp_path)).collect()
    assert out  # no repeat-width crash
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert ranks == sorted(ranks) and ranks[0] == 1
