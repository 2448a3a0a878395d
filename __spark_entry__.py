"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over :mod:`roar_spark.registry`, which holds the query corpus
(one entry per implemented operator from SURVEY.md §2) and the matching
DuckDB oracle SQL. See tools/check.py for the local mimic of the driver's
comparison.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Stream-shaped aggregation (tumbling event-time windows per event type) —
    the batch form of the engine's Structured Streaming plan.
    """
    from roar_spark.operators.relational import events_hourly

    return events_hourly(spark, "/root/testdata/sf0.001")


# Queries with a cumulative GREEN driver row (CORRECTNESS_r01 ∪ … ∪ rNN).
# The driver samples ~50 queries per round, apparently in dict order, so
# anything NOT in this set is rotated to the front of queries() — never-
# sampled queries and new additions accumulate driver evidence first
# instead of re-spending samples on already-green rows (VERDICT r2 item 2).
#
# COMPUTED from the CORRECTNESS_r*.json files the driver writes into this
# repo, not hand-curated (the r9 verdict flagged the frozen list as stale:
# r6–r9 greens kept re-spending samples). A query is cumulatively green if
# any round hash-matched it, or — for the rows-only-by-design entries that
# have no oracle in the registry — any round recorded a non-erroring
# rows-only row. A query that was rows-only in an old round but has since
# GAINED an oracle is NOT green: it rotates to the front until it earns a
# hash-match (the ann_lsh_topk r2→r3 pattern).
def _driver_green() -> frozenset:
    import glob
    import json
    import os

    from roar_spark.registry import ORACLES

    green = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                green.add(name)
            elif (
                row.get("err") == "no_oracle"
                and name not in ORACLES
                # "non-erroring" evidence = the driver recorded a real,
                # POSITIVE row count. An int guard alone would let a
                # 0-row run (query silently returning nothing) count as
                # green (r10 ADVICE).
                and isinstance(row.get("spark_rows"), int)
                and row["spark_rows"] > 0
            ):
                green.add(name)
    return frozenset(green)


_DRIVER_GREEN = _driver_green()

# The r1–r5 hand-curated list, kept only as a regression floor: everything
# here earned green in a recorded round, so the computed set must contain
# it (pinned by tests/test_driver_rotation.py — catches a parse/rule bug
# silently emptying the rotation).
_DRIVER_GREEN_R5_FLOOR = frozenset({
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q12_shipmode_priority",
    "q14_promo_share", "join_inner", "join_left_outer", "join_full_outer",
    "join_semi", "join_anti", "join_non_equi", "asof_latest_order",
    "agg_distinct", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_pivot", "agg_stats_sketches", "window_rank", "window_running",
    "window_topk_per_group", "topk_global", "sort_offset_fetch",
    "setop_union_distinct", "setop_intersect", "setop_except",
    "scalar_string_date", "scalar_json_extract", "scalar_conditional",
    "scalar_array_ops", "scalar_date_arith", "events_hourly",
    "events_sessionize", "dedup_exact", "dedup_dataset",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_clusters", "dedup_decontaminate", "dedup_embedding",
    "sim_brute_topk", "sim_cosine_pairs",
    "text_stats", "text_hashing_features", "text_top_tokens", "text_langid",
    "text_fingerprint", "text_bpe_tokens", "text_gopher_quality",
    "text_pii_scrub", "text_dup_ngrams", "multimodal_meta",
    "multimodal_decode_stub", "multimodal_frame_sample", "pack_sequences",
    # round-3 green rows (CORRECTNESS_r03.json — 50/50, incl. the
    # hash-upgraded ann_lsh_topk / ann_ivf_topk and re-earned
    # subquery_scalar):
    "agg_array_collect", "agg_median_manual", "agg_salted_twophase",
    "agg_stats_exact", "ann_ivf_topk", "ann_lsh_topk", "dataset_shuffle",
    "dataset_split", "dedup_embedding_lsh", "embedding_knn_classify",
    "embedding_label_centroids", "embedding_quantize", "events_anomaly",
    "events_cohort_retention", "events_dau_wau", "events_funnel",
    "events_path_transitions", "events_range_join", "events_sliding",
    "lateral_explode", "multimodal_features", "multimodal_resize_pool",
    "pipeline_curate", "q11_important_parts", "q13_customer_distribution",
    "q15_top_supplier", "q16_supplier_count", "q17_small_quantity",
    "q18_large_orders", "q19_disjunctive_predicates", "q20_excess_suppliers",
    "q21_waiting_supplier", "q22_idle_customers", "q2_min_cost_supplier",
    "q4_late_orders", "q7_volume_shipping", "q8_market_share",
    "q9_product_type_profit", "sample_stratified", "sample_temperature",
    "scalar_string_extra", "served_nested", "served_rollup",
    "setop_except_all", "setop_union_by_name", "subquery_scalar",
    "text_chunk", "text_tfidf", "window_ntile", "window_range_frame",
    # round-4 green rows (CORRECTNESS_r04.json — the 5 never-sampled
    # queries plus the new star-components clustering all earned green):
    "agg_kmv_distinct", "corpus_mix_report", "dq_profile",
    "events_gap_fill", "sample_topk_per_stratum", "dedup_clusters_star",
    # round-5 green row (CORRECTNESS_r05.json):
    "embedding_knn_classify_bulk",
})


# Queries whose implementation was touched in the CURRENT optimization
# round: rotated to the front even when cumulatively green, so the driver
# re-verifies exactly the rows whose engine code changed (verdict r11
# item 3 — embedding_knn_classify_bulk and text_pii_scrub were touched in
# r11 on local-oracle evidence only and never re-entered the sample).
# With the whole registry cumulatively green the front is otherwise
# empty, so this spends sample slots on precisely the changed queries.
_TOUCHED_THIS_ROUND = frozenset({
    # r12 optimization surface (see OPTIMIZATION_r12.md)
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_simhash",
    "sim_cosine_pairs",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "embedding_knn_classify_bulk",
    "window_range_frame",
    "window_running",
    # seed revert (r12) touched the spans island stage
    "dedup_substring_spans",
    # remaining _verify_pairs consumers (the r12 single-row-group
    # aggregate barrier sits under all five)
    "dedup_clusters_star",
    "dedup_decontaminate",
    # scoped-cache drain-at-entry fix (r12) touched these persist-based
    # operator families too
    "text_tfidf",
    "text_gopher_quality",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # touched in r11, never driver-re-verified since
    "text_pii_scrub",
})


def _rotated() -> "dict[str, Callable[[SparkSession, str], DataFrame]]":
    from roar_spark.registry import QUERIES

    items = list(QUERIES.items())
    never_green = [(k, v) for k, v in items if k not in _DRIVER_GREEN]
    touched = [
        (k, v)
        for k, v in items
        if k in _DRIVER_GREEN and k in _TOUCHED_THIS_ROUND
    ]
    back = [
        (k, v)
        for k, v in items
        if k in _DRIVER_GREEN and k not in _TOUCHED_THIS_ROUND
    ]
    # never-sampled queries keep absolute priority; this round's touched
    # (but green) queries come next; settled greens last
    return dict(never_green + touched + back)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, driver-
    untested queries first (see _DRIVER_GREEN)."""
    return _rotated()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    driver's weaker rows-only check), same order as queries()."""
    from roar_spark.registry import ORACLES

    ordered = _rotated()
    return {k: ORACLES[k] for k in ordered if k in ORACLES}
