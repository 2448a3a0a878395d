"""Registry-wide physical-plan audit (r11): build every registry query
against $SPARK_GRAFT_SF_DIR (default sf0.01 — plan shape, not timing) and
count the structural red-flag nodes in `explain("formatted")`:
BatchEvalPython/ArrowEvalPython (row-at-a-time Python), CartesianProduct,
SortMergeJoin, Exchange counts. Prints one JSON line per run; the r11
optimization round's whole-surface sweep evidence (OPTIMIZATION_r11.md).

Usage: python tools/audit_plans.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from roar_spark.registry import QUERIES
    from roar_spark.session import get_spark

    spark = get_spark(app_name="roar_spark_audit")
    names = sys.argv[1:] or list(QUERIES)
    rows = []
    for name in names:
        try:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            rows.append(
                {
                    "q": name,
                    "build_s": round(time.perf_counter() - t0, 2),
                    "exch": p.count("+- Exchange") + p.count(":- Exchange"),
                    "bcast": p.count("BroadcastExchange ("),
                    "smj": p.count("SortMergeJoin ("),
                    "bnlj": p.count("BroadcastNestedLoopJoin ("),
                    "cart": p.count("CartesianProduct ("),
                    "rowudf": p.count("BatchEvalPython (")
                    + p.count("ArrowEvalPython ("),
                    "arrow_kernels": p.count("MapInPandas (")
                    + p.count("FlatMapGroupsInPandas ("),
                    "wind": p.count("Window ("),
                }
            )
        except Exception as e:  # noqa: BLE001 — audit must cover every row
            rows.append({"q": name, "err": str(e)[:120]})
    print(json.dumps(rows))
    flags = [
        r for r in rows if r.get("rowudf") or r.get("cart") or "err" in r
    ]
    print(
        f"# {len(rows)} queries audited; {len(flags)} flagged "
        f"(row-UDF / cartesian / error)",
        file=sys.stderr,
    )
    for r in flags:
        print(f"# FLAG {r}", file=sys.stderr)
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
