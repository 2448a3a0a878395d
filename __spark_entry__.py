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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from roar_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    driver's weaker rows-only check)."""
    from roar_spark.registry import ORACLES

    return dict(ORACLES)
