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
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_counts(p: str) -> dict:
    """Structural node counts for one explain("formatted") string.

    Join tree-lines carry the join type between the node name and the id
    ("SortMergeJoin LeftOuter (53)"), so a bare 'Name (' pattern NEVER
    matches them — count the numbered detail headers instead, which are
    one per node and type-free ("(53) SortMergeJoin"). The r11 audit's
    smj/bnlj counters had the unmatched pattern and read 0 unconditionally
    (found + fixed r12; pinned in tests/test_audit_counts.py against a
    committed plan dump)."""
    return {
        "exch": p.count("+- Exchange") + p.count(":- Exchange"),
        "bcast": p.count("BroadcastExchange ("),
        "smj": len(re.findall(r"^\(\d+\) SortMergeJoin", p, re.M)),
        "bnlj": len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", p, re.M)),
        "cart": len(re.findall(r"^\(\d+\) CartesianProduct", p, re.M)),
        "rowudf": p.count("BatchEvalPython (") + p.count("ArrowEvalPython ("),
        "arrow_kernels": p.count("MapInPandas (")
        + p.count("FlatMapGroupsInPandas ("),
        "wind": p.count("Window ("),
    }


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
                    **plan_counts(p),
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
