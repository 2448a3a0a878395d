"""Third breadth pass: the remaining classic TPC-H query *shapes*, adapted
to this corpus's simplified star schema (no partsupp/comment/phone
columns — each query keeps its defining operator structure and swaps the
missing column for an equivalent one).

Shapes covered (with the Spark plan each decorrelates to):

- Q4   EXISTS correlated subquery            → left-semi join (+ non-equi)
- Q13  LEFT OUTER + two-level aggregation    → count distribution, join
       predicate (not WHERE) keeps zero-order customers
- Q16  NOT-IN subquery + COUNT DISTINCT      → left-anti join + distinct agg
- Q18  grouped-HAVING subquery feeding IN    → join against the HAVING set
- Q22  scalar AVG subquery + NOT EXISTS      → broadcast scalar + left-anti

Determinism: money/quantity aggregates use the scaled-integer sum from
operators/relational.py; counts cast to long; LIMIT queries carry a unique
tiebreak. Every query has an exact DuckDB oracle in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from roar_spark.catalog import load_table
from roar_spark.operators.relational import _scaled, dsum

Q18_MIN_QTY = 200.0


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts of Q3-1997 orders having ≥1 lineitem
    shipped more than 60 days after the order date. The EXISTS subquery is
    declared as a left-semi join with a non-equi condition — Catalyst keeps
    the semi-join's early-out (no fanout on multi-lineitem orders)."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer-order-count distribution. The priority
    exclusion lives in the JOIN predicate, not a WHERE — a customer whose
    only orders are urgent must still appear with count 0 (the left join's
    whole point; a post-filter would delete them)."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips nulls → 0
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts for small parts, excluding
    flagged suppliers via NOT IN → left-anti join (lineitem stands in for
    partsupp as the part↔supplier relationship)."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_size") <= 5)
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    excluded = load_table(spark, "supplier", sf_dir).filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    rel = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
    )
    return (
        rel.groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, joined back to their customers. The IN-subquery is the
    grouped HAVING set joined directly (no decorrelation needed — the
    group key IS the join key)."""
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))  # unique tiebreak
        .limit(100)
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-segment count/balance of customers whose
    balance beats the positive-balance average (scalar subquery →
    broadcast one-row cross join) and who placed no 1998+ order
    (NOT EXISTS → left-anti join)."""
    cust = load_table(spark, "customer", sf_dir)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_scaled(F.col("c_acctbal"))) / F.lit(100.0) / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade volume by year — a 5-way star join
    (lineitem→supplier→nation, lineitem→orders→customer→nation) with the
    nation pair as a symmetric disjunction and year extraction. Both
    nation legs broadcast (fixed 25-row dim)."""
    from roar_spark.catalog import BROADCAST_TABLES  # noqa: F401  (doc pointer)
    from roar_spark.operators.relational import revenue_expr

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, supp.s_nationkey == F.col("s_nk"))
        .join(n2, cust.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg((F.sum(revenue_expr()) / F.lit(10_000.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: suppliers whose quarterly revenue equals the MAX
    over all suppliers — an aggregated view consumed twice (revenue per
    supplier + its max), the scalar MAX broadcast as a 1-row join."""
    from roar_spark.operators.relational import revenue_expr

    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        (F.sum(revenue_expr()) / F.lit(10_000.0)).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    join sides (brand/size on part × quantity on lineitem) — the classic
    test that disjunctions still evaluate after the join without a
    cartesian blowup, and that the shared conjuncts get pushed."""
    from roar_spark.operators.relational import revenue_expr

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 5))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 10))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15))
           & (F.col("l_quantity").between(20, 30)))
    )
    return joined.filter(cond).agg(
        (F.sum(revenue_expr()) / F.lit(10_000.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers whose lineitem shipped late (> 60 days
    after the order date) on a multi-supplier order where EVERY OTHER
    supplier shipped on time — EXISTS + NOT EXISTS over the same relation
    with a different-key correlation.

    Decorrelation (r9): after the per-(order, supplier) lateness rollup,
    both quantified predicates are functions of TWO per-order counters —
    EXISTS another supplier ⟺ n_supp ≥ 2, and NOT EXISTS another LATE
    supplier ⟺ n_late = 1 (the late pair itself accounts for the one) —
    so a single per-order aggregate equi-joined back replaces the earlier
    semi-join + anti-join pair whose `suppkey !=` correlation made each a
    within-order pair enumeration (quadratic in suppliers-per-order, and
    two more shuffles of the rollup at 100 TB). Values are identical by
    the set identity above; the oracle (EXISTS/NOT EXISTS SQL) is
    unchanged and green."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    # one row per (order, supplier): did this supplier ship anything late?
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late"),
    )
    waiting = (
        per_supp.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: groupwise-min correlated subquery — for each
    qualifying part, the EUROPE supplier(s) with the minimum supply cost.
    With no partsupp table, cost(part, supplier) is the minimum scaled
    price that supplier ever charged for the part (exact int64, so the
    groupwise-min equality join is exact in both engines). The correlated
    MIN decorrelates to an aggregate-and-rejoin on p_partkey; nation and
    region legs broadcast."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_size") == 3) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    # semi-join the highly selective part filter BELOW the aggregate:
    # Catalyst cannot push a join under a groupBy, so aggregating the full
    # lineitem table first wasted the whole shuffle on parts the next join
    # discards (~1-in-hundreds qualify). The group key includes the join
    # key, so the result is identical (r8 review).
    li = li.join(
        F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_scaled(F.col("l_extendedprice"))).alias("cost_s")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    region = F.broadcast(
        load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    )
    elig = (
        cost.join(part, cost.l_partkey == part.p_partkey)
        .join(supp, cost.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "cost_s")
    )
    # groupwise-min as a window over `elig` (r9): the aggregate-and-rejoin
    # form evaluated the whole 4-join elig pipeline TWICE — Catalyst does
    # not dedupe diamond plans (same finding as events_dau_wau's day
    # dimension, r8) — and shuffled it twice more for the agg + rejoin.
    # The window computes the identical exact-int64 per-part minimum over
    # one evaluation and one p_partkey exchange; equality on cost_s keeps
    # ALL tied minimum suppliers, exactly as the rejoin did.
    from pyspark.sql import Window as W

    return (
        elig.withColumn(
            "min_cost_s", F.min("cost_s").over(W.partitionBy("p_partkey"))
        )
        .filter(F.col("cost_s") == F.col("min_cost_s"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("cost_s") / F.lit(100.0)).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")  # (s_name,p_partkey) unique
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_1 suppliers' slice of
    PROMO-part revenue sold into ASIA-region customers, by order year. The
    conditional share is two exact int64 sums divided once at the end
    (IEEE-identical across engines); nation/region dims broadcast."""
    from roar_spark.operators.relational import revenue_expr

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir)
    n_cust = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")))
    n_supp = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    region = F.broadcast(load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA"))
    vol = revenue_expr()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n_cust, cust.c_nationkey == F.col("cn_key"))
        .join(region, F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n_supp, supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0))).alias("nation_vol_s"),
            F.sum(vol).alias("total_vol_s"),
        )
        .select(
            "o_year",
            (F.col("nation_vol_s").cast("double") / F.col("total_vol_s")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × order year over a
    part-name LIKE filter. With no partsupp, supply cost per unit is
    p_retailprice; profit = revenue − retail·quantity, computed entirely
    in scaled int64 (revenue at 10⁴, cost lifted ×100 to match) so the
    grouped sum is exact and order-insensitive."""
    from roar_spark.operators.relational import revenue_expr

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_retailprice")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = F.broadcast(load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name"))
    cost_s = (
        _scaled(F.col("p_retailprice"))
        * F.round(F.col("l_quantity")).cast("long")
        * F.lit(100)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(revenue_expr() - cost_s) / F.lit(10_000.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value from NATION_1 suppliers
    exceeds a fraction of the nation's total — a grouped aggregate HAVING a
    scalar-subquery threshold (broadcast 1-row join). Values are exact
    int64 (price_scaled × integral quantity); only the 0.1 % threshold is
    a double, computed identically in both engines from the same int."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = F.broadcast(
        load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_1")
    )
    val = _scaled(F.col("l_extendedprice")) * F.round(F.col("l_quantity")).cast("long")
    national = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select(F.col("l_partkey"), val.alias("val_s"))
    )
    per_part = national.groupBy("l_partkey").agg(F.sum("val_s").alias("value_s"))
    total = national.agg(F.sum("val_s").alias("total_s"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_s").cast("double") > F.col("total_s").cast("double") * 0.001)
        .select("l_partkey", (F.col("value_s") / F.lit(100.0)).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries with a correlated 50 % -of-
    total aggregate, decorrelated to semi-join chains. A NATION_3 supplier
    qualifies if, for some 'small *' part, its 1997 shipped quantity
    exceeds half that part's total 1997 volume (2·q > total in exact
    int64 — no fractional compare)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    shipped = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_suppkey", F.round(F.col("l_quantity")).cast("long").alias("qty")
    )
    per_ps = shipped.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("supp_qty"))
    # per-part total as a window-sum OVER the per-(part, supplier)
    # aggregate (r9): the earlier form aggregated `shipped` a second time
    # and equi-joined the two results — a second full-width shuffle of the
    # filtered lineitem rows plus a join exchange; summing the already-
    # reduced per_ps partials partitioned by part is the same exact int64
    # total with one narrow exchange and no join. The window input is the
    # per-part supplier list — bounded by suppliers-per-part, not corpus.
    from pyspark.sql import Window as W

    dominant = per_ps.withColumn(
        "total_qty", F.sum("supp_qty").over(W.partitionBy("l_partkey"))
    ).filter(F.col("supp_qty") * 2 > F.col("total_qty"))
    supp = load_table(spark, "supplier", sf_dir)
    nation = F.broadcast(
        load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    )
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
