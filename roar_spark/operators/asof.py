"""As-of join — an operator Spark lacks natively, composed from built-ins.

``asof_join(left, right, key, left_time, right_time)``: for every left row,
the single most recent right row with ``right_time <= left_time`` on the
same key (left-outer semantics: unmatched left rows keep nulls).

Implementation is the union + running-last composition, NOT a range join:

1. tag and union both inputs on (key, time)
2. one window per key ordered by (time, tag, right tiebreak) — right rows
   sort before left rows at equal timestamps so ``<=`` matches inclusively
3. ``last(right_row_struct, ignorenulls=True)`` over the running frame
   carries the latest right ROW forward — one struct, null only on
   left-tagged rows, so a right row with null value columns is carried AS
   THAT ROW (per-column lasts would stitch values from different right
   rows whenever a newer row holds a null, synthesizing a row that never
   existed and diverging from the oracle's whole-row LATERAL … LIMIT 1)
4. keep only left-tagged rows

Scale: exactly ONE hash shuffle on the key (the window partition), state
O(1) per row while scanning — versus a range join's per-key quadratic
blow-up. This is the standard time-series as-of plan on MPP engines.

Determinism: ties (several right rows sharing the as-of timestamp) resolve
by largest tiebreak column, mirrored in the oracle's LATERAL ORDER BY …
DESC LIMIT 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from roar_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Generic as-of join (see module doc). ``value_cols`` are the right
    columns carried onto matching left rows; ``tiebreak`` must be a right
    column made part of ``value_cols`` ordering for equal timestamps.

    NULL semantics match the SQL LATERAL oracle: a right row with a NULL
    key or NULL time can never satisfy ``right_time <= left_time`` /
    ``key = key`` under three-valued logic, so it is dropped up front —
    without the filter, NULL times sorted NULLS FIRST in the window and
    were carried onto otherwise-matchless left rows, and NULL keys
    matched EACH OTHER through the hash partition (r8 review). Left rows
    keep left-outer semantics: NULL-key/time left rows simply carry NULL
    value columns."""
    reserved = {"_t", "_is_left", "_asof_row"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        # same contract as ranks.bucketed_global_rank: a caller column
        # with an internal name would be silently clobbered then dropped
        raise ValueError(f"asof_join: column names {sorted(clash)} are reserved")
    l_tag = left.withColumn("_t", F.col(left_time)).withColumn("_is_left", F.lit(1))
    r_tag = (
        right.filter(F.col(right_time).isNotNull() & F.col(key).isNotNull())
        .withColumn("_t", F.col(right_time))
        .withColumn("_is_left", F.lit(0))
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    u = r_tag.select(*sorted(r_tag.columns)).unionByName(l_tag.select(*sorted(l_tag.columns)))
    w = (
        W.partitionBy(key)
        .orderBy(F.asc("_t"), F.asc("_is_left"), F.asc_nulls_first(tiebreak))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    right_row = F.when(
        F.col("_is_left") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    carried = u.withColumn("_asof_row", F.last(right_row, ignorenulls=True).over(w))
    out = carried.filter(F.col("_is_left") == 1).drop("_t", "_is_left", *value_cols)
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_asof_row.{c}"))
    return out.drop("_asof_row")


def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: each event joined to the customer's most recent order at
    or before the event time (null columns for order-less users)."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join(
        ev,
        orders,
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    ).orderBy("event_id")
