"""Empirical recall sweep for the dedup_embedding_lsh banding configs.

Pair recall of a banded LSH screen depends ONLY on the pair's own hash
codes — corpus size sets cost (occupancy), not whether a given pair
collides — so this sweep plants pairs at controlled cosines, hashes them
with the engine's REAL deterministic hyperplanes (_plane_weights, md5-
derived), and counts collisions per config. Pure numpy: validates the
closed-form recall model in operators/similarity.py against the actual
plane family, at any plane count, in seconds.

Usage: python tools/lsh_recall_sweep.py [--pairs 2000] [--dim 64]
Prints one row per (config, cosine): empirical recall vs the model.
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from roar_spark.operators.similarity import _plane_weights

COSINES = [0.90, 0.93, 0.95, 0.97, 0.99, 0.999]


def planted_pairs(rng, n_pairs: int, dim: int, cos: float):
    """(a, b) unit-vector arrays with exact pairwise cosine `cos`."""
    a = rng.standard_normal((n_pairs, dim))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    g = rng.standard_normal((n_pairs, dim))
    g -= (g * a).sum(axis=1, keepdims=True) * a  # orthogonalize
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    b = cos * a + math.sqrt(1 - cos * cos) * g
    return a, b


def codes(x: np.ndarray, n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    w = np.array(
        [_plane_weights(t, p, dim) for t in range(n_tables) for p in range(n_planes)]
    ).T
    bits = (x @ w) > 0
    shifts = 1 << np.arange(n_planes, dtype=np.int64)
    return np.stack(
        [
            (bits[:, t * n_planes : (t + 1) * n_planes] * shifts).sum(axis=1)
            for t in range(n_tables)
        ],
        axis=1,
    )  # (rows, tables)


def pair_recall(a, b, n_tables, n_planes, dim, hamming1: bool) -> float:
    ca = codes(a, n_tables, n_planes, dim)
    cb = codes(b, n_tables, n_planes, dim)
    x = ca ^ cb
    if hamming1:
        # collide if codes match exactly OR differ in one bit (the probed
        # screen's Hamming<=1 space)
        hit = (x == 0) | ((x & (x - 1)) == 0)
    else:
        hit = x == 0
    return float(hit.any(axis=1).mean())


def model(cos, n_tables, n_planes, hamming1: bool) -> float:
    p = 1 - math.acos(min(cos, 1.0)) / math.pi
    per = p**n_planes
    if hamming1:
        per += n_planes * p ** (n_planes - 1) * (1 - p)
    return 1 - (1 - per) ** n_tables


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--planes", type=int, default=19, help="base b0 (16M default)")
    args = ap.parse_args()
    rng = np.random.default_rng(7)
    b0 = args.planes
    configs = [
        ("probed 8x%d" % b0, 8, b0, True),
        ("PF 24x%d" % (b0 - 1), 24, b0 - 1, False),
        ("PF 16x%d" % (b0 - 1), 16, b0 - 1, False),
        ("PF 14x%d" % b0, 14, b0, False),
    ]
    print("config".ljust(14) + "cos".rjust(7) + "empirical".rjust(11) + "model".rjust(9))
    for name, t, b, h1 in configs:
        for cos in COSINES:
            a, bb = planted_pairs(rng, args.pairs, args.dim, cos)
            emp = pair_recall(a, bb, t, b, args.dim, h1)
            print(
                name.ljust(14)
                + f"{cos:>7}"
                + f"{emp:>11.4f}"
                + f"{model(cos, t, b, h1):>9.4f}"
            )


if __name__ == "__main__":
    main()
