"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Per-query time includes full materialization (collect) — ordering, limits
and Python-visible results included, matching what a client of the engine
would wait for.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "window_running",
    "agg_distinct",
    "events_hourly",
    "events_sessionize",
    "asof_latest_order",
    "scalar_json_extract",
    # LLM-pipeline
    "dedup_exact",
    "dedup_dataset",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_brute_topk",
    "sim_cosine_pairs",
    "text_stats",
    "text_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from roar_spark.registry import QUERIES
    from roar_spark.session import get_spark

    spark = get_spark(app_name="roar_spark_bench")
    # warm up the JVM/codegen path so query 1 doesn't pay session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt
        _ = len(rows)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
