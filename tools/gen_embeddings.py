"""Chunked embeddings-only corpus writer for the scan-bound scale probes.

``tools/scale_smoke.py``'s ``gen_corpus`` materializes the whole corpus
(texts + embeddings) in driver memory before writing — fine to 4M, but a
64M-row corpus is ~16 GB of float32 alone and the doc-text loop is hours
of single-threaded Python. The similarity family's scan-bound ops
(ann_lsh_topk / sim_brute_topk / embedding_knn_classify /
embedding_label_centroids / ann_ivf_topk) only read ``embeddings``, so
the 16M+ probes (SCALE.md r7–r9) use this writer instead: chunks of
``--chunk`` rows are generated with numpy and streamed to one parquet
file per chunk under ``/tmp/roar_scale/n{N}emb/embeddings.parquet/``.

The many-files layout is deliberate: Spark parallelizes a parquet scan
by file/row-group, so 64 × 1M-row files give the scan its parallelism
without any repartition (the shape a real multi-TB corpus has).

Schema and planted near-neighbors match ``gen_corpus`` exactly (same
rng seed and neighbor rule), so numbers are comparable across the
full-corpus and emb-only generations at the sizes where both exist.

Usage:
    python tools/gen_embeddings.py --rows 64000000 [--chunk 1000000]

Then:
    python tools/scale_smoke.py --sizes 64000000 --ops sim_brute_topk --reps 1
(the n{N}emb dir is picked up by scale_smoke's --emb-only-ok resolution;
pass the dir explicitly to one-off drivers otherwise).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

BASE = "/tmp/roar_scale"
EMB_DIM = 64


def gen_embeddings(n: int, chunk: int = 1_000_000, base: str = BASE) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"{base}/n{n}emb"
    meta = {"n": n, "dim": EMB_DIM, "chunk": chunk, "layout": "dir-v1"}
    meta_path = f"{out}/_meta.json"
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as fh:
                if json.load(fh) == meta:
                    return out
        except Exception:  # noqa: BLE001 — corrupt stamp → regenerate
            pass
    shutil.rmtree(out, ignore_errors=True)
    dataset = f"{out}/embeddings.parquet"
    os.makedirs(dataset, exist_ok=True)
    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    for start in range(0, n, chunk):
        rows = min(chunk, n - start)
        emb = rng.standard_normal((rows, EMB_DIM)).astype("float32")
        if start == 0:
            # same planted near-neighbor rule as scale_smoke.gen_corpus —
            # pairs (i, i+1) every 20 ids in the first 200. Clamp the
            # plant range to THIS chunk's rows: with --chunk below ~182
            # the unclamped loop indexed emb[i+1] past the chunk
            # (IndexError), and a chunk boundary inside the first 200
            # rows would have planted against the wrong base vector
            # (r9 ADVICE). Chunks that small only occur in tests; the
            # pairs that fit the first chunk are still planted.
            for i in range(0, min(n - 1, rows - 1, 200), 20):
                emb[i + 1] = emb[i] + 0.05 * rng.standard_normal(EMB_DIM).astype(
                    "float32"
                )
        flat = pa.array(emb.reshape(-1), pa.float32())
        offsets = pa.array(
            np.arange(0, (rows + 1) * EMB_DIM, EMB_DIM, dtype=np.int32)
        )
        table = pa.table(
            {
                "vec_id": pa.array(
                    np.arange(start, start + rows, dtype=np.int64)
                ),
                "embedding": pa.ListArray.from_arrays(offsets, flat),
                "label": pa.array(
                    (np.arange(start, start + rows) % 10).astype(np.int32)
                ),
            }
        )
        pq.write_table(table, f"{dataset}/part-{start // chunk:05d}.parquet")
        done = start + rows
        print(
            f"  {done:,}/{n:,} rows  ({done / (time.perf_counter() - t0):,.0f} rows/s)",
            flush=True,
        )
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    args = ap.parse_args()
    out = gen_embeddings(args.rows, args.chunk)
    print(out)


if __name__ == "__main__":
    main()
