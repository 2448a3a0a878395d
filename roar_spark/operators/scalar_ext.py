"""Extended scalar-function surface: JSON extraction, array functions,
correlated subqueries, date arithmetic, conditional expressions, and
dataset-level dedup — rounding out SURVEY.md §2 Part B's "scalar functions
(string/date/math/array/json)" row with oracle-checked queries.

Cross-engine notes encoded here (and mirrored in the oracles):
- JSON: Spark get_json_object ↔ DuckDB json_extract_string ('$.k' paths)
- day-of-week: Spark weekday() is 0=Monday, DuckDB isodow is 1=Monday →
  weekday()+1 == isodow
- array indexing: Spark element_at and DuckDB l[i] are both 1-based
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table


def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props payload column + typed
    aggregation of the extracted field."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: length, 1-based element
    access, predicate-filtered count (no float arithmetic → exact)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("long").alias("n_dims"),
            F.element_at("embedding", 1).cast("double").alias("first_val"),
            F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
            F.size(F.filter("embedding", lambda x: x < 0)).cast("long").alias("n_negative"),
        )
        .orderBy("vec_id")
    )


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery semantics: customers above their own
    nation's average balance. Declared as a join against the per-nation
    aggregate — the plan Catalyst would decorrelate the subquery into.

    The displayed 2-decimal average is rounded in EXACT integer
    arithmetic (half-away-from-zero on the cents rational s/cnt), not
    with round() on the computed double: a double average landing on a
    .xx5 boundary rounds differently in Spark (BigDecimal HALF_UP on the
    exact binary expansion) than in DuckDB — caught at sf0.001 where 5 of
    75 rows differed by exactly one cent. The filter compares against the
    UNROUNDED average with an identical (s/100.0)/cnt operation order on
    both engines, so the row set is unaffected."""
    from roar_spark.operators.relational import _scaled

    cust = load_table(spark, "customer", sf_dir)
    na = cust.groupBy("c_nationkey").agg(
        F.sum(_scaled(F.col("c_acctbal"))).alias("s_cents"),
        F.count("c_acctbal").alias("cnt"),
    )
    # round-half-away-from-zero of the rational s_cents/cnt, in integers:
    # sign(s) * ((2|s| + cnt) div (2 cnt)); div truncates toward zero and
    # operands are non-negative, so truncate == floor
    mag = F.expr("(2 * abs(s_cents) + cnt) div (2 * cnt)")
    na = na.select(
        "c_nationkey",
        (F.col("s_cents") / F.lit(100.0) / F.col("cnt")).alias("nation_avg_raw"),
        (
            F.when(F.col("s_cents") < 0, -mag).otherwise(mag) / F.lit(100.0)
        ).alias("nation_avg_r2"),
    )
    return (
        cust.join(F.broadcast(na), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg_raw"))
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.col("nation_avg_r2").alias("nation_avg"),
        )
        .orderBy("c_custkey")
    )


def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across the order→ship interval: day difference,
    month shift, ISO day-of-week, quarter, leap-second-free truncation."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_linenumber") == 1)
    orders = load_table(spark, "orders", sf_dir)
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.select(
            "l_orderkey",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("ship_delay_days"),
            F.add_months(F.col("o_orderdate"), 3).cast("date").alias("plus_3_months"),
            (F.weekday(F.col("o_orderdate")) + 1).alias("order_isodow"),
            F.quarter(F.col("o_orderdate")).alias("order_quarter"),
        )
        .orderBy("l_orderkey")
    )


def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression family: CASE, NULLIF, COALESCE, IF,
    LEAST/GREATEST."""
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") % 50 == 0)
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300000, "large")
            .when(F.col("o_totalprice") > 100000, "medium")
            .otherwise("small")
            .alias("size_class"),
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
                "status_display"
            ),
            F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("capped_price"),
            F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("floored_price"),
        )
        .orderBy("o_orderkey")
    )


def dedup_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level exact dedup with keep-first semantics: the full
    surviving table (min doc_id per normalized fingerprint) — what a
    training pipeline actually materializes, vs. dedup_exact's digest
    summary. One digest shuffle + a semi-join back, never shuffling text."""
    docs = load_table(spark, "documents", sf_dir)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    keepers = (
        docs.select(F.col("doc_id"), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        docs.join(keepers, "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
