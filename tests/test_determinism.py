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
