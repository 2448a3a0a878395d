"""Vector math over ``array<float|double>`` columns, as built-in Catalyst
expressions (zip_with/aggregate fold) — whole-stage-codegen'd, no UDFs.

Determinism: dot products fold left-to-right in DOUBLE (element order), so
results are bit-identical across engines that do ordered folds (the DuckDB
oracles use list_transform + list_reduce with the same ordering). This is
what lets similarity queries hash-match exactly.

At 100 TB these expressions stream through codegen per row with no Python
boundary; pair generation strategy (the quadratic part) lives in
operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """L2 norm (same fold as :func:`dot`, so bit-stable) — NULL for the
    zero vector. Zero-norm vectors have no direction, so every cosine
    built on this norm is NULL ("non-comparable") instead of a
    DIVIDE_BY_ZERO crash under Spark 4's ANSI default: NULL divisors
    propagate NULL through plain division with no error. Guarding HERE is
    O(n) — one nullif per vector — where a try_divide in :func:`cosine`
    re-pays the guard once per PAIR (O(n²) on all-pairs paths; measured
    interleaved A/B at sf0.1: try_divide cost sim_cosine_pairs ~0.3 s and
    sim_brute_topk ~0.15 s over this form). NULL flows through every
    consumer: a `cos >= t` filter rejects it, and the k-NN rank paths
    filter NULL before ranking so degenerate vectors never become
    neighbors and abstain as queries (r5 review + pinning test)."""
    return F.nullif(F.sqrt(dot(a, a)), F.lit(0.0))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from a precomputed-norm pair (norms are computed once per
    vector, not once per pair — O(n) not O(n²) sqrt calls). Safe under
    ANSI: :func:`norm` yields NULL (never 0.0) for degenerate vectors,
    and division by NULL is NULL, not an error."""
    return dot(a, b) / (norm_a * norm_b)
