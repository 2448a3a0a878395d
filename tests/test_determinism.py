"""Partition-count independence: the results the engine claims are
order/partitioning-independent must be IDENTICAL (exact values, not just
approximately equal) when the shuffle width and input split-up change.

This is the failure mode driver SFs can't show: a float sum whose value
depends on reduction order, a row_number tie broken by arrival order, a
hash threshold computed from a partition-local aggregate. At 1000
executors the partitioning is different on every run — anything unstable
here is wrong at scale even if every small-SF oracle matches.

Mechanism: run each query once under the session default (32 shuffle
partitions) and once with spark.sql.shuffle.partitions=7 (runtime-settable
since Spark 2.x; AQE coalescing stays on in both runs, so the second run
also exercises different post-AQE partition counts), then compare the full
row multisets exactly.
"""

from __future__ import annotations

import pytest

from roar_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

# Queries whose determinism story is the most load-bearing: exact float
# aggregation (stats, centroids, anomaly), hash-threshold sampling,
# rank/tie-breaking windows, multi-stage dedup candidate pipelines.
SENSITIVE = [
    "agg_stats_exact",
    "embedding_label_centroids",
    "agg_salted_twophase",
    "agg_kmv_distinct",
    "events_anomaly",
    "sample_temperature",
    "dataset_shuffle",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_brute_topk",
    "window_rank",
    "text_dup_ngrams",
]


def _multiset(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_is_partitioning_independent(spark, name):
    base = _multiset(QUERIES[name](spark, SF))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = _multiset(QUERIES[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert narrow == base


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_agg_stats_sketches_self_bounds_hold(spark, sf):
    """agg_stats_sketches is rows-only at the driver (sketch registers are
    engine-internal — see tools/check.py's allowlist entry), so the error
    bound is enforced HERE instead: every group's HLL distinct estimate and
    approx median must sit within the query's own 5% in-row envelope of the
    exact values it computes alongside them."""
    rows = QUERIES["agg_stats_sketches"](spark, sf).collect()
    assert rows, "sketch query returned no groups"
    for r in rows:
        assert r.hll_within_5pct, (
            f"{sf} {r.l_returnflag}: HLL {r.approx_parts} vs exact {r.exact_parts}"
        )
        assert r.median_within_5pct, (
            f"{sf} {r.l_returnflag}: approx median {r.approx_median_price} "
            f"vs exact {r.exact_median_price}"
        )
