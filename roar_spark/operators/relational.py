"""Relational operator corpus over the TPC-H-ish test tables.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; each has a
matching DuckDB oracle in :mod:`roar_spark.registry`. These cover SURVEY.md
§2 Part B: projection/filter, all join types, hash aggregation,
rollup/cube/grouping-sets, window functions, sorts/top-k, set ops, scalar
functions, and stream-shaped (event-time window) aggregation.

Scale posture (100 TB):
- Filters and projections are written directly against the parquet scan so
  Catalyst pushes them into the reader (verified via explain() in
  tests/test_plans.py).
- region/nation/supplier/customer/part are dimension tables — far below the
  broadcast threshold at every SF — so every dim join is a broadcast hash
  join (no shuffle of the fact table for the join itself). ``F.broadcast``
  hints pin the fixed-cardinality dims (region/nation) explicitly.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key — unavoidable
  and correct; AQE handles skew splitting at runtime.
- Aggregations use partial (map-side) aggregation automatically — the
  groupBy keys here are low-cardinality, so the shuffle carries only the
  partial aggregates, not rows.

Numeric determinism policy (the oracle hash-matches EXACT values): floating
sums are order-dependent, so every SUM over a 2-decimal double measure is
computed as an exact ×100 (or ×10⁴/×10⁶ for products) int64 sum and divided
back to double once at the end — see ``_scaled``/``dsum``/``revenue_expr``.
Averages are exact-sum / count. Outputs prefer integral / string values;
raw double aggregates only where exact (min/max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roar_spark.catalog import load_table

DEC = T.DecimalType(18, 4)


def _scaled(col: F.Column, scale_digits: int = 2) -> F.Column:
    """A 2-decimal double measure as an exact scaled integer (×10^digits).

    Every money/rate column in the corpus carries exactly 2 decimals, so
    x·100 lands within ~1e-7 of an integer; ROUND then cast is exact and
    unambiguous in both engines. From here on everything is int64
    arithmetic: exact, order-insensitive, and fully whole-stage-codegen'd
    (≈5× faster than decimal aggregation, which allocates BigDecimals).
    """
    return F.round(col * (10**scale_digits)).cast(T.LongType())


def dsum(col: F.Column) -> F.Column:
    """Order-insensitive exact sum of a 2-decimal double measure: sum the
    ×100 integers, divide once at the end. The final long→double division
    rounds the same exact rational in both engines → bit-identical."""
    return F.sum(_scaled(col)) / F.lit(100.0)


def davg(col: F.Column) -> F.Column:
    """Deterministic average: exact integer sum ÷ count, in double."""
    return F.sum(_scaled(col)) / F.lit(100.0) / F.count(col)


def revenue_expr() -> F.Column:
    """price × (1 − discount) as an exact integer scaled by 10⁴.

    A *computed double* can't be cast/rounded to fixed decimals portably at
    high scales, but each 2-decimal FACTOR scales to an exact integer, and
    the integer product is exact: (price·100) × ((1−disc)·100) ≤ ~1.1e9
    per row, summing to ≤ ~1e15 per group — comfortably int64.
    """
    return _scaled(F.col("l_extendedprice")) * _scaled(1 - F.col("l_discount"))


def charge_expr() -> F.Column:
    """price × (1 − discount) × (1 + tax) as an exact integer scaled by
    10⁶ (≤ ~1.2e11 per row; int64 sums stay exact to ~7.6e7 rows/group)."""
    return revenue_expr() * _scaled(1 + F.col("l_tax"))


# Row count beyond which scaled-int64 money sums switch to decimal(38)
# accumulators: charge's 1e6-scaled product is ~1.2e11 per row, so a single
# (returnflag, linestatus) group overflows int64 past ~7.6e7 rows — real at
# the 100 TB posture, where each of Q1's ~6 groups holds ~1e11 rows and a
# non-ANSI long sum would wrap SILENTLY (r8 review). Decimal(38) sums are
# exact to 38 digits (≫ any corpus); below the cutoff the long-sum fast
# path keeps the headline cost. The 1e4-scaled dsum/davg measures are
# ~1e7/row → int64 holds to ~9e11 rows PER GROUP (≈ 700 TB of lineitem),
# so only the 1e6-scaled charge needs the dispatch today.
_WIDE_SUM_ROWS = 50_000_000


def decsum(col: F.Column, scale_digits: int = 4, wide: bool = False) -> F.Column:
    """Exact sum of a scaled-integer money product, surfaced as double.
    ``wide=True`` accumulates in decimal(38,0) — see _WIDE_SUM_ROWS."""
    acc = F.sum(col.cast("decimal(38,0)")) if wide else F.sum(col)
    return acc / F.lit(float(10**scale_digits))


# --------------------------------------------------------------------------
# TPC-H-flavored analytical queries
# --------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with computed measures.
    The filter + 7-column projection push into the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = revenue_expr()
    charge = charge_expr()
    from roar_spark.catalog import table_row_count

    wide = table_row_count("lineitem", sf_dir) > _WIDE_SUM_ROWS
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            decsum(disc_price, wide=wide).alias("sum_disc_price"),
            decsum(charge, scale_digits=6, wide=wide).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + aggregate + deterministic top-10.
    customer is a broadcast-side dim; orders⋈lineitem shuffles on orderkey."""
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(decsum(revenue_expr()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. region/nation broadcast-pinned;
    the co-nation predicate (supplier and customer in the same nation)
    filters before aggregation."""
    region = F.broadcast(load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA"))
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, sup.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(decsum(revenue_expr()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer, top 20."""
    cust = load_table(spark, "customer", sf_dir)
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(decsum(revenue_expr()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Join types (SURVEY.md §2 Part B "Joins")
# --------------------------------------------------------------------------


def _order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("total_spent"))
    )


def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return (
        cust.join(_order_counts(spark, sf_dir), cust.c_custkey == F.col("o_custkey"), "inner")
        .select("c_custkey", "c_name", "n_orders", "total_spent")
        .orderBy("c_custkey")
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps order-less customers with null counts."""
    cust = load_table(spark, "customer", sf_dir)
    return (
        cust.join(_order_counts(spark, sf_dir), cust.c_custkey == F.col("o_custkey"), "left")
        .select("c_custkey", F.coalesce("n_orders", F.lit(0)).alias("n_orders"), "total_spent")
        .orderBy("c_custkey")
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two aggregates keyed differently (order status vs
    lineitem return flag histograms joined on the flag letter)."""
    orders = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_orderstatus").alias("flag"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    items = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    return (
        orders.join(items, "flag", "full_outer")
        .select("flag", "n_orders", "n_items")
        .orderBy("flag")
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS: customers having at least one high-value order."""
    cust = load_table(spark, "customer", sf_dir)
    big = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: customers with no orders at all."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def join_non_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: parts priced within a bracket table (range predicate).
    Broadcast-nested-loop on a 3-row bracket side — the only sane physical
    plan for a non-equi join against a tiny dim."""
    part = load_table(spark, "part", sf_dir)
    brackets = F.broadcast(
        spark.createDataFrame(
            [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1e9)],
            "bracket string, lo double, hi double",
        )
    )
    return (
        part.join(brackets, (part.p_retailprice >= F.col("lo")) & (part.p_retailprice < F.col("hi")))
        .groupBy("bracket")
        .agg(F.count(F.lit(1)).alias("n_parts"), davg(F.col("p_retailprice")).alias("avg_price"))
        .orderBy("bracket")
    )


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + conditional aggregation in one pass."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_quantity").alias("min_qty"),
        )
        .orderBy("l_returnflag")
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) with grouping-set id."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) via SQL (the DataFrame
    API has no direct grouping-sets builder; SQL is the declared form).

    The view name is keyed to sf_dir: a shared '_gs_orders' name would let
    a later invocation with a DIFFERENT corpus silently redirect an
    earlier, not-yet-executed lazy plan (temp views resolve at action
    time, not at creation)."""
    import hashlib

    view = f"_gs_orders_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    load_table(spark, "orders", sf_dir).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: status × priority → wide. Explicit value list so
    the plan is a single pass (no distinct-values pre-query)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank per brand, ordered by
    price. Deterministic tiebreak on partkey.

    Scale shape: the rank window runs on salted-survivor input
    (operators/ranks.py) — with 25 p_brand values, Catalyst's map-side
    WindowGroupLimit bounds the final per-brand sort to scan_partitions·5
    rows and the salt tightens it to a constant 64·5. The (price,
    partkey) order is total, so phase 1's per-(brand, salt) top-5
    provably contains every global top-5 row AND every row ranked above
    one — rank/dense_rank computed on the survivors therefore equal the
    full-input values for all kept rows."""
    from roar_spark.operators.ranks import salted_survivors

    part = load_table(spark, "part", sf_dir)
    order = [F.desc("p_retailprice"), F.asc("p_partkey")]
    surv = salted_survivors(
        part.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        order,
        5,
        "p_partkey",
    )
    w = W.partitionBy("p_brand").orderBy(*order)
    return (
        surv.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("p_brand", "rn")
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family: running sum, lag, lead over each customer's order
    history (frame = unbounded preceding → current row).

    The window is seeded with repartitionByRange(o_custkey) instead of the
    default hash exchange: RangePartitioning(custkey) satisfies both the
    window's ClusteredDistribution AND — as a prefix — the final orderBy's
    OrderedDistribution(custkey, orderdate, orderkey), so EnsureRequirements
    plans ONE exchange and drops the global sort outright (the window's
    partition-local sort already provides the full ordering). Guide §2.4:
    two operations keyed the same way share one exchange. No partition
    count is forced, so AQE stays free to size the shuffle."""
    orders = load_table(spark, "orders", sf_dir).repartitionByRange("o_custkey")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(_scaled(F.col("o_totalprice")))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            / F.lit(100.0)
        ).alias("running_spend"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per type — the row_number()<=k idiom in the
    salted two-phase form (operators/ranks.py): Catalyst's map-side
    WindowGroupLimit already bounds the final per-type sort to
    scan_partitions·k rows; the salt tightens that to a constant 64·k,
    which matters at the 1e5-partition scan widths of a 100 TB part
    table (~150 p_type values). Identical rows and rank numbers (the
    order is total via the partkey tiebreak)."""
    from roar_spark.operators.ranks import salted_topk

    part = load_table(spark, "part", sf_dir)
    return (
        salted_topk(
            part.select("p_type", "p_partkey", "p_name", "p_retailprice"),
            ["p_type"],
            [F.desc("p_retailprice"), F.asc("p_partkey")],
            3,
            "rn",
            "p_partkey",
        )
        .withColumn("rn", F.col("rn").cast("long"))
        .select("p_type", "rn", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "rn")
    )


# --------------------------------------------------------------------------
# Sorts / limits / set operations
# --------------------------------------------------------------------------


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by price. Spark plans orderBy+limit as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver; no full sort materializes at any scale."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of customer keys appearing in orders vs high-value
    lineitems."""
    a = load_table(spark, "orders", sf_dir).select(F.col("o_custkey").alias("custkey"))
    b = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.union(b).distinct().orderBy("custkey")


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: part keys that are both expensive and large-size."""
    a = load_table(spark, "part", sf_dir).filter(F.col("p_retailprice") > 1000).select("p_partkey")
    b = load_table(spark, "part", sf_dir).filter(F.col("p_size") >= 25).select("p_partkey")
    return a.intersect(b).orderBy("p_partkey")


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with orders minus BUILDING-segment customers."""
    a = load_table(spark, "orders", sf_dir).select(F.col("o_custkey").alias("custkey")).distinct()
    b = (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return a.exceptAll(b.distinct()).orderBy("custkey")


# --------------------------------------------------------------------------
# Scalar function surface
# --------------------------------------------------------------------------


def scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date scalar functions in one projection (the reference's
    only scalar ops are to-string and RFC3339 parse — SURVEY.md §2 Part B;
    this exposes the standard library the clients were using instead)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.upper(F.col("o_orderstatus")).alias("status_u"),
            F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
            F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
            F.length(F.col("o_orderpriority")).cast("long").alias("prio_len"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.round(F.col("o_totalprice"), 0).alias("price_rounded"),
            (F.col("o_totalprice") > 100000).cast("int").alias("is_large"),
        )
        .orderBy("o_orderkey")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-shaped aggregation: tumbling 1-hour event-time windows per
    event type. Batch form of the Structured Streaming plan (same window()
    expression works under readStream + watermark — see streaming module)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "total_value")
        .orderBy("hour_start", "event_type")
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, as the classic
    lag+cumsum composition (deterministic, oracle-expressible; the
    streaming-native form is F.session_window — see streaming module)."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap arithmetic in integral microseconds (unix_micros ↔ DuckDB epoch_us)
    # so both engines compare exact integers, not rounded epoch doubles.
    gap = F.when(
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1).over(w) > 1_800_000_000,
        1,
    ).otherwise(0)
    sess = ev.withColumn("new_sess", gap).withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum with range predicates (BETWEEN
    on date + discount band + quantity cap) — the canonical pushdown query;
    every predicate reaches the parquet reader."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            decsum(_scaled(F.col("l_extendedprice")) * _scaled(F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE-counted) aggregation —
    priority-class counts per return flag."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    # CASE semantics, not NULL-propagating arithmetic: sum(1 - high) skips
    # a NULL o_orderpriority row entirely, while the oracle's CASE ... ELSE
    # counts it as low priority — when/otherwise mirrors the ELSE branch
    # (r8 review; latent on the non-null fixture)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_priority"),
        )
        .orderBy("l_returnflag")
    )


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional sum to total sum (exact
    integer sums, one double division at the end)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    rev = revenue_expr()
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .agg(
            (F.sum(promo).cast("double") * 100.0 / F.sum(rev).cast("double")).alias(
                "promo_revenue_pct"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
