"""Query registry: name → (spark callable, DuckDB oracle SQL).

This is the correctness contract consumed by ``__spark_entry__.py``: the
driver runs each Spark query and its oracle side by side at sf=0.01 and
hash-compares row count + schema + order-insensitive values. Column names
and value determinism rules are documented in operators/relational.py.

Oracle dialect notes (kept portable between Spark SQL and DuckDB):
- exact money sums:  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
- epoch arithmetic in integral MICROSECONDS (epoch_us ↔ unix_micros)
- explicit NULLS FIRST/LAST wherever ordering feeds a LIMIT
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from roar_spark.operators import relational as R

SparkQuery = Callable[[SparkSession, str], DataFrame]

_DSUM = "(SUM(CAST(ROUND(({x}) * 100) AS BIGINT)) / 100.0)"

# price × (1−disc) [× (1+tax)] as exact scaled-integer products — see
# operators/relational.py revenue_expr()/_scaled() for the determinism and
# performance rationale (2-decimal factors × 100 are exact int64s).
_REV = (
    "(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))"
)
_CHG = f"({_REV} * CAST(ROUND((1 + l_tax) * 100) AS BIGINT))"


def _dsum(x: str) -> str:
    return _DSUM.format(x=x)


def _decsum(x: str, scale_digits: int = 4) -> str:
    return f"(SUM({x}) / {10 ** scale_digits}.0)"


QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn: SparkQuery, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# --- TPC-H-flavored -------------------------------------------------------

_register(
    "q1_pricing_summary",
    R.q1_pricing_summary,
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_decsum(_REV)} AS sum_disc_price,
           {_decsum(_CHG, 6)} AS sum_charge,
           {_dsum('l_quantity')} / COUNT(l_quantity) AS avg_qty,
           {_dsum('l_extendedprice')} / COUNT(l_extendedprice) AS avg_price,
           {_dsum('l_discount')} / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

_register(
    "q3_shipping_priority",
    R.q3_shipping_priority,
    f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {_decsum(_REV)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)

_register(
    "q5_local_supplier_volume",
    R.q5_local_supplier_volume,
    f"""
    SELECT n_name, {_decsum(_REV)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)

_register(
    "q10_returned_items",
    R.q10_returned_items,
    f"""
    SELECT c_custkey, c_name, n_name,
           {_decsum(_REV)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)

# --- joins ----------------------------------------------------------------

_ORDER_COUNTS = f"""
    (SELECT o_custkey, COUNT(*) AS n_orders,
            {_dsum('o_totalprice')} AS total_spent
     FROM orders GROUP BY o_custkey) oc
"""

_register(
    "join_inner",
    R.join_inner,
    f"""
    SELECT c_custkey, c_name, n_orders, total_spent
    FROM customer JOIN {_ORDER_COUNTS} ON c_custkey = oc.o_custkey
    ORDER BY c_custkey
    """,
)

_register(
    "join_left_outer",
    R.join_left_outer,
    f"""
    SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders, total_spent
    FROM customer LEFT JOIN {_ORDER_COUNTS} ON c_custkey = oc.o_custkey
    ORDER BY c_custkey
    """,
)

_register(
    "join_full_outer",
    R.join_full_outer,
    """
    SELECT COALESCE(o.flag, i.flag) AS flag, n_orders, n_items
    FROM (SELECT o_orderstatus AS flag, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
    FULL OUTER JOIN
         (SELECT l_returnflag AS flag, COUNT(*) AS n_items FROM lineitem GROUP BY 1) i
    ON o.flag = i.flag
    ORDER BY flag
    """,
)

_register(
    "join_semi",
    R.join_semi,
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)

_register(
    "join_anti",
    R.join_anti,
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)

_register(
    "join_non_equi",
    R.join_non_equi,
    f"""
    SELECT bracket, COUNT(*) AS n_parts,
           {_dsum('p_retailprice')} / COUNT(p_retailprice) AS avg_price
    FROM part
    JOIN (VALUES ('budget', 0.0, 500.0),
                 ('mid', 500.0, 1200.0),
                 ('premium', 1200.0, 1000000000.0)) AS b(bracket, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY bracket
    ORDER BY bracket
    """,
)

# --- aggregation variants -------------------------------------------------

_register(
    "agg_distinct",
    R.agg_distinct,
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted,
           MAX(l_quantity) AS max_qty,
           MIN(l_quantity) AS min_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)

_register(
    "agg_rollup",
    R.agg_rollup,
    f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n, {_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)

_register(
    "agg_cube",
    R.agg_cube,
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n, {_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag, l_linestatus
    """,
)

_register(
    "agg_grouping_sets",
    R.agg_grouping_sets,
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)

_register(
    "agg_pivot",
    R.agg_pivot,
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

# --- windows --------------------------------------------------------------

_register(
    "window_rank",
    R.window_rank,
    """
    SELECT * FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
    ) WHERE rn <= 5
    ORDER BY p_brand, rn
    """,
)

_register(
    "window_running",
    R.window_running,
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS prev_order,
           LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS next_order
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)

_register(
    "window_topk_per_group",
    R.window_topk_per_group,
    """
    SELECT p_type, rn, p_partkey, p_name, p_retailprice FROM (
      SELECT p_type, p_partkey, p_name, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_type
                 ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part
    ) WHERE rn <= 3
    ORDER BY p_type, rn
    """,
)

# --- sorts / set ops ------------------------------------------------------

_register(
    "topk_global",
    R.topk_global,
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)

_register(
    "setop_union_distinct",
    R.setop_union_distinct,
    """
    SELECT DISTINCT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) ORDER BY custkey
    """,
)

_register(
    "setop_intersect",
    R.setop_intersect,
    """
    SELECT p_partkey FROM part WHERE p_retailprice > 1000
    INTERSECT
    SELECT p_partkey FROM part WHERE p_size >= 25
    ORDER BY p_partkey
    """,
)

_register(
    "setop_except",
    R.setop_except,
    """
    SELECT DISTINCT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY custkey
    """,
)

# --- scalar functions / stream-shaped -------------------------------------

_register(
    "scalar_string_date",
    R.scalar_string_date,
    """
    SELECT o_orderkey,
           UPPER(o_orderstatus) AS status_u,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio,
           LENGTH(o_orderpriority) AS prio_len,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           ROUND(o_totalprice, 0) AS price_rounded,
           CAST(o_totalprice > 100000 AS INT) AS is_large
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
)

_register(
    "events_hourly",
    R.events_hourly,
    f"""
    SELECT CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n_events, {_dsum('"value"')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start, event_type
    """,
)

_register(
    "events_sessionize",
    R.events_sessionize,
    """
    WITH ev AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ), marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)

# --- LLM-data-pipeline operators (dedup / similarity / text / multimodal) --
# Registered last; oracle-less entries (ann_lsh_topk, multimodal_decode_stub)
# get the driver's rows-only check by design.
from roar_spark.registry_pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES  # noqa: E402

QUERIES.update(PIPELINE_QUERIES)
ORACLES.update(PIPELINE_ORACLES)

# --- as-of join / offset-fetch / sketches ---------------------------------
from roar_spark.operators.asof import asof_latest_order  # noqa: E402


def _sort_offset_fetch(spark, sf_dir):
    from pyspark.sql import functions as F

    from roar_spark.catalog import load_table

    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(5)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def _agg_stats_sketches(spark, sf_dir):
    """Approximate/statistical aggregates (HLL distinct, approx median,
    stddev, corr). Rows-only at the driver BY CEILING, but SELF-BOUNDING:
    sketch register layouts are engine-internal (Spark HLL++ vs DuckDB's
    HLL cannot agree bit-for-bit) and stddev/corr at full double precision
    are accumulation-order-dependent — so instead of an external oracle,
    each estimate travels WITH its exact counterpart (computed in the same
    scan) and a within-tolerance flag the engine evaluates itself:
    |approx − exact| ≤ 5% of exact. tests/test_determinism.py pins the
    flags all-true, and the exact-integer twin ``agg_stats_exact`` carries
    the value-hash oracle for the statistical half. The HLL sketch runs at
    rsd=0.01 (1% standard error) so the 5% envelope is a genuine ~5σ bound
    (Spark's DEFAULT rsd is 0.05 — the envelope would be a coin-flip 1σ);
    percentile_approx's rank error at the default accuracy is ≤ 1e-4 of
    the rank range, far inside 5% on this distribution."""
    from pyspark.sql import functions as F

    from roar_spark.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir)
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= F.lit(0.05) * F.abs(F.col(exact))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
            F.expr("median(l_extendedprice)").alias("exact_median_price"),
            F.stddev_samp("l_quantity").alias("stddev_qty"),
            F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
        )
        .withColumn("hll_within_5pct", within("approx_parts", "exact_parts"))
        .withColumn(
            "median_within_5pct", within("approx_median_price", "exact_median_price")
        )
        .orderBy("l_returnflag")
    )


_register(
    "asof_latest_order",
    asof_latest_order,
    """
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
    FROM events e
    LEFT JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = e.user_id AND o_orderdate <= CAST(e.ts AS TIMESTAMP)
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
    ) o ON true
    ORDER BY event_id
    """,
)

_register(
    "sort_offset_fetch",
    _sort_offset_fetch,
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10 OFFSET 5
    """,
)

_register("agg_stats_sketches", _agg_stats_sketches, None)  # rows-only


def _agg_stats_exact(spark, sf_dir):
    """EXACT twin of the statistical half of agg_stats_sketches: sample
    stddev and Pearson correlation per return flag, plus exact distinct
    parts. Where stddev_samp/corr are float-order-dependent (engine-
    internal accumulation order over doubles), here every moment (Σq, Σq²,
    Σp, Σp², Σqp) is an INTEGER sum — quantities are integral, prices are
    2-decimal ×100-scaled — accumulated in decimal(38,0) (Spark) /
    HUGEINT (DuckDB), and the variance/covariance NUMERATORS
    (n·Σx²−(Σx)²) are computed in that exact integer arithmetic too, so
    each engine casts one exact integer per term to double (no float
    cancellation, no accumulation-order dependence at any cluster size).
    The single int→double cast is correctly-rounded in Spark (BigDecimal)
    while DuckDB's HUGEINT cast composes two roundings (upper·2⁶⁴+lower),
    so agreement is exact integers + doubles pinned at the rounded 6
    decimals (a ≤1-ulp cast divergence sits ~10 orders below that). Same
    moment-sum technique as events_anomaly's z-scores. Shape: one scan,
    map-side partial aggregation, a 3-row result."""
    from pyspark.sql import functions as F

    from roar_spark.catalog import load_table

    li = load_table(spark, "lineitem", sf_dir)
    q = F.round(F.col("l_quantity")).cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    g = li.select(
        "l_returnflag",
        "l_partkey",
        q.alias("q"),
        p.alias("p"),
        (q * q).alias("q2"),
        (p * p).alias("p2"),
        (q * p).alias("qp"),
    )
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)"))  # noqa: E731
    agg = g.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_partkey").alias("n_parts"),
        dec("q").alias("sq"),
        dec("q2").alias("sq2"),
        dec("p").alias("sp"),
        dec("p2").alias("sp2"),
        dec("qp").alias("sqp"),
    )
    nd = F.col("n_rows").cast("decimal(38,0)")
    # numerators stay in decimal(38,0): products ~1e22 at sf0.1, ~1e33 at
    # the 100 TB SF — inside decimal(38,0)/int128 range either way
    n = F.col("n_rows").cast("double")
    var_q = (nd * F.col("sq2") - F.col("sq") * F.col("sq")).cast("double")
    var_p = (nd * F.col("sp2") - F.col("sp") * F.col("sp")).cast("double")
    cov = (nd * F.col("sqp") - F.col("sq") * F.col("sp")).cast("double")
    return agg.select(
        "l_returnflag",
        "n_rows",
        "n_parts",
        F.round(F.sqrt(var_q / (n * (n - F.lit(1.0)))), 6).alias("stddev_qty"),
        F.round(cov / (F.sqrt(var_q) * F.sqrt(var_p)), 6).alias("qty_price_corr"),
    ).orderBy("l_returnflag")


_register(
    "agg_stats_exact",
    _agg_stats_exact,
    """
    WITH s AS (
      SELECT l_returnflag, l_partkey,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem),
    a AS (
      SELECT l_returnflag,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT l_partkey) AS n_parts,
             SUM(CAST(q AS HUGEINT)) AS sq,
             SUM(CAST(q AS HUGEINT) * q) AS sq2,
             SUM(CAST(p AS HUGEINT)) AS sp,
             SUM(CAST(p AS HUGEINT) * p) AS sp2,
             SUM(CAST(q AS HUGEINT) * p) AS sqp
      FROM s GROUP BY l_returnflag),
    b AS (
      SELECT l_returnflag, n_rows, n_parts,
             CAST(n_rows * sq2 - sq * sq AS DOUBLE) AS var_q,
             CAST(n_rows * sp2 - sp * sp AS DOUBLE) AS var_p,
             CAST(n_rows * sqp - sq * sp AS DOUBLE) AS cov
      FROM a)
    SELECT l_returnflag, n_rows, n_parts,
           round(sqrt(var_q / (CAST(n_rows AS DOUBLE)
                               * (CAST(n_rows AS DOUBLE) - 1.0))), 6) AS stddev_qty,
           round(cov / (sqrt(var_q) * sqrt(var_p)), 6) AS qty_price_corr
    FROM b ORDER BY l_returnflag
    """,
)

# --- extended scalar surface + dataset dedup ------------------------------
from roar_spark.operators import scalar_ext as SE  # noqa: E402

_register(
    "scalar_json_extract",
    SE.scalar_json_extract,
    """
    SELECT event_type,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

_register(
    "scalar_array_ops",
    SE.scalar_array_ops,
    """
    SELECT vec_id,
           len(embedding) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           len(list_filter(embedding, x -> x < 0)) AS n_negative
    FROM embeddings
    ORDER BY vec_id
    """,
)

_register(
    "subquery_scalar",
    SE.subquery_scalar,
    """
    WITH na AS (
      SELECT c_nationkey,
             SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s_cents,
             COUNT(c_acctbal) AS cnt
      FROM customer GROUP BY c_nationkey)
    SELECT c_custkey, c.c_nationkey, c_acctbal,
           (CASE WHEN s_cents < 0
                 THEN -((2 * abs(s_cents) + cnt) // (2 * cnt))
                 ELSE (2 * s_cents + cnt) // (2 * cnt) END) / 100.0 AS nation_avg
    FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
    WHERE c_acctbal > (s_cents / 100.0) / cnt
    ORDER BY c_custkey
    """,
)

_register(
    "scalar_date_arith",
    SE.scalar_date_arith,
    """
    SELECT l_orderkey,
           date_diff('day', o_orderdate, l_shipdate) AS ship_delay_days,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
           CAST(isodow(o_orderdate) AS INT) AS order_isodow,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_linenumber = 1
    ORDER BY l_orderkey
    """,
)

_register(
    "scalar_conditional",
    SE.scalar_conditional,
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'large'
                WHEN o_totalprice > 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_display,
           LEAST(o_totalprice, 250000.0) AS capped_price,
           GREATEST(o_totalprice, 1000.0) AS floored_price
    FROM orders
    WHERE o_orderkey % 50 = 0
    ORDER BY o_orderkey
    """,
)

_register(
    "dedup_dataset",
    SE.dedup_dataset,
    """
    WITH keep AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents GROUP BY md5(lower(trim(text))))
    SELECT d.doc_id, lang, source, n_chars
    FROM documents d JOIN keep USING (doc_id)
    ORDER BY doc_id
    """,
)

# --- TPC-H breadth: q6 / q12 / q14 ----------------------------------------
_register(
    "q6_forecast_revenue",
    R.q6_forecast_revenue,
    """
    SELECT (SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)

_register(
    "q12_shipmode_priority",
    R.q12_shipmode_priority,
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_priority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)

_register(
    "q14_promo_share",
    R.q14_promo_share,
    """
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                ELSE 0 END) AS DOUBLE) * 100.0
             / CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
             AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)

# --- relational breadth pass 2 --------------------------------------------
from roar_spark.operators import relational_ext as RX  # noqa: E402

_register(
    "window_range_frame",
    RX.window_range_frame,
    """
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS order_day,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders)
    SELECT o_custkey, o_orderkey, order_day,
           (SUM(price_c) OVER w / 100.0) AS trailing_90d_spend,
           COUNT(*) OVER w AS trailing_90d_orders
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY order_day
                 RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, order_day, o_orderkey
    """,
)

_register(
    "lateral_explode",
    RX.lateral_explode,
    """
    WITH t AS (SELECT doc_id,
                      string_split_regex(lower(trim(text)), '\\s+') AS toks
               FROM documents)
    SELECT doc_id, i AS token_no, toks[i] AS token
    FROM t CROSS JOIN UNNEST(range(1, 6)) AS r(i)
    WHERE i <= len(toks)
    ORDER BY doc_id, token_no
    """,
)

_register(
    "scalar_string_extra",
    RX.scalar_string_extra,
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           lpad(p_brand, 12, '#') AS brand_padded,
           rpad(p_type, 10, '.') AS type_padded,
           reverse(p_brand) AS brand_rev,
           replace(p_name, ' ', '_') AS name_snake,
           split_part(p_name, ' ', 1) AS name_head,
           CAST(starts_with(p_type, 'PROMO') AS INT) AS is_promo,
           CAST(ends_with(p_name, 'a') AS INT) AS ends_a
    FROM part
    WHERE p_partkey % 20 = 0
    ORDER BY p_partkey
    """,
)

_register(
    "agg_median_manual",
    RX.agg_median_manual,
    """
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
           (SUM(price_c) / COUNT(*) / 100.0) AS median_price
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

_register(
    "setop_union_by_name",
    RX.setop_union_by_name,
    """
    SELECT c_custkey, name, balance, segment FROM (
      SELECT c_custkey, c_name AS name, c_acctbal AS balance
      FROM customer WHERE c_acctbal > 9000
      UNION ALL BY NAME
      SELECT c_custkey, c_mktsegment AS segment, c_name AS name
      FROM customer WHERE c_acctbal < -500
    )
    ORDER BY c_custkey
    """,
)

_register(
    "events_sliding",
    RX.events_sliding,
    """
    WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS eu, event_type FROM events),
    slid AS (
      SELECT make_timestamp(((eu - k * 1800000000) // 3600000000) * 3600000000
                            + k * 1800000000) AS window_start,
             event_type
      FROM e CROSS JOIN UNNEST([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS u(k))
    SELECT window_start, event_type, COUNT(*) AS n_events
    FROM slid
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)

_register(
    "events_hourly_quartiles",
    RX.events_hourly_quartiles,
    """
    WITH hourly AS (
      SELECT CAST(DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_start,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), q AS (
      SELECT event_type, n_events,
             CAST(NTILE(4) OVER (PARTITION BY event_type
                    ORDER BY n_events DESC, hour_start ASC) AS BIGINT)
               AS volume_quartile
      FROM hourly
    )
    SELECT event_type, volume_quartile, COUNT(*) AS n_hours,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(MIN(n_events) AS BIGINT) AS min_events,
           CAST(MAX(n_events) AS BIGINT) AS max_events
    FROM q
    GROUP BY 1, 2
    ORDER BY event_type, volume_quartile
    """,
)

_register(
    "setop_except_all",
    RX.setop_except_all,
    """
    WITH diff AS (
      SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity > 45
      EXCEPT ALL
      SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT okey, COUNT(*) AS n_left FROM diff GROUP BY okey ORDER BY okey
    """,
)

_register(
    "agg_array_collect",
    RX.agg_array_collect,
    """
    SELECT l_orderkey,
           array_to_string(list(CAST(l_linenumber AS BIGINT) ORDER BY l_linenumber), ',')
             AS line_numbers,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
)

_register(
    "window_ntile",
    RX.window_ntile,
    """
    WITH q AS (
      SELECT c_mktsegment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c,
             CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS quartile
      FROM customer)
    SELECT c_mktsegment, quartile,
           COUNT(*) AS n_customers,
           (SUM(bal_c) / 100.0) AS total_balance
    FROM q
    GROUP BY c_mktsegment, quartile
    ORDER BY c_mktsegment, quartile
    """,
)

_register(
    "q17_small_quantity",
    RX.q17_small_quantity,
    """
    WITH pa AS (
      SELECT l_partkey,
             (SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT (SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0) / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN pa USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)

_register(
    "events_funnel",
    RX.events_funnel,
    """
    WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
    signup AS (
      SELECT user_id, MIN(ts) AS t_signup FROM e WHERE event_type = 'signup' GROUP BY user_id),
    click AS (
      SELECT c.user_id, s.t_signup, MIN(c.ts) AS t_click
      FROM e c JOIN signup s ON c.user_id = s.user_id
      WHERE c.event_type = 'click' AND c.ts > s.t_signup
      GROUP BY c.user_id, s.t_signup),
    purchase AS (
      SELECT p.user_id, MIN(p.ts) AS t_purchase
      FROM e p JOIN click c ON p.user_id = c.user_id
      WHERE p.event_type = 'purchase' AND p.ts > c.t_click
      GROUP BY p.user_id)
    SELECT s.user_id, s.t_signup, c.t_click, p.t_purchase
    FROM signup s
    LEFT JOIN click c ON s.user_id = c.user_id
    LEFT JOIN purchase p ON s.user_id = p.user_id
    ORDER BY s.user_id
    """,
)

# --- deterministic sampling / splitting -----------------------------------
from roar_spark.operators import sampling as SM  # noqa: E402
from roar_spark.operators.sampling import _TRAIN_END, _VAL_END  # noqa: E402

_register(
    "dataset_split",
    SM.dataset_split,
    f"""
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) AS hv
      FROM documents)
    SELECT CASE WHEN hv < {_TRAIN_END} THEN 'train'
                WHEN hv < {_VAL_END} THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc
    FROM h
    GROUP BY 1
    ORDER BY split
    """,
)

_register(
    "sample_stratified",
    SM.sample_stratified,
    """
    SELECT lang, doc_id
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < 6553
    ORDER BY lang, doc_id
    """,
)

_register(
    "events_range_join",
    RX.events_range_join,
    """
    WITH p AS (
      SELECT event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'),
    e AS (
      SELECT CAST(ts AS TIMESTAMP) AS e_ts FROM events WHERE event_type = 'error')
    SELECT p.purchase_id,
           p.p_ts AS purchase_ts,
           COUNT(e.e_ts) AS n_errors_60s
    FROM p LEFT JOIN e
      ON e.e_ts > p.p_ts AND e.e_ts <= p.p_ts + INTERVAL 60 SECOND
    GROUP BY p.purchase_id, p.p_ts
    ORDER BY p.purchase_id
    """,
)

_register(
    "events_anomaly",
    RX.events_anomaly,
    """
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
             epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 3600000000
               AS epoch_hour,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2, 3),
    win AS (
      SELECT hour_start, event_type, n_events,
             COUNT(*) OVER w AS hist_n,
             SUM(n_events) OVER w AS hist_s,
             SUM(n_events * n_events) OVER w AS hist_ss
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY epoch_hour
                   RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
    scored AS (
      SELECT hour_start, event_type, n_events,
             CAST(hist_s AS DOUBLE) / CAST(hist_n AS DOUBLE) AS mean,
             (CAST(hist_ss AS DOUBLE)
              - CAST(hist_s AS DOUBLE) * CAST(hist_s AS DOUBLE)
                / CAST(hist_n AS DOUBLE))
             / (CAST(hist_n AS DOUBLE) - 1.0) AS var
      FROM win WHERE hist_n >= 12)
    SELECT hour_start, event_type, n_events,
           round(mean, 6) AS trailing_mean,
           CASE WHEN var > 0 THEN
             round((CAST(n_events AS DOUBLE) - mean) / sqrt(var), 6)
           END AS z_score,
           COALESCE(abs(CASE WHEN var > 0 THEN
             (CAST(n_events AS DOUBLE) - mean) / sqrt(var) END) > 2.5,
             FALSE) AS is_anomaly
    FROM scored ORDER BY hour_start, event_type
    """,
)

_register(
    "sample_temperature",
    SM.sample_temperature,
    """
    WITH counts AS (SELECT COALESCE(lang, '__null__') AS lang_key, COUNT(*) AS n_docs
                    FROM documents GROUP BY 1),
    scaled AS (
      SELECT lang_key, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS sq
      FROM counts),
    z AS (SELECT SUM(sq) AS z FROM scaled),
    frac AS (
      SELECT lang_key,
             LEAST(1.0, 250.0 * CAST(sq AS DOUBLE) / CAST(z.z AS DOUBLE)
                        / CAST(n_docs AS DOUBLE)) AS sample_frac
      FROM scaled CROSS JOIN z)
    SELECT d.lang, round(f.sample_frac, 6) AS sample_frac, d.doc_id
    FROM documents d JOIN frac f ON COALESCE(d.lang, '__null__') = f.lang_key
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
          < CAST(floor(f.sample_frac * 65536) AS BIGINT)
    ORDER BY d.lang, d.doc_id
    """,
)

_register(
    "dataset_shuffle",
    SM.dataset_shuffle,
    """
    SELECT doc_id,
           md5('shuffle0|' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(('0x' || substr(md5('shuffle0|' || CAST(doc_id AS VARCHAR)), 1, 2))
                AS BIGINT) % 16 AS shard
    FROM documents
    ORDER BY shuffle_key
    """,
)

_register(
    "agg_salted_twophase",
    RX.agg_salted_twophase,
    """
    SELECT l_returnflag,
           (SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)

# --- serve→query composition (streaming store feeds the relational surface)
from roar_spark.operators.serve_compose import (  # noqa: E402
    served_nested,
    served_rescued,
    served_retention,
    served_rollup,
)

_register(
    "served_rollup",
    served_rollup,
    f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n, {_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)

# Oracle = the flat aggregation on events the nested serve path must
# reproduce: Spark serializes each row to nested JSON, infers a Struct/
# Array schema from a 10-payload sample (infer_nested=True), parses and
# stores every envelope, and flattens the snapshot — any loss anywhere in
# that roundtrip breaks the hash match.
_register(
    "served_nested",
    served_nested,
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid,
           round(MAX(value), 6) AS max_score,
           MIN(upper(event_type)) AS tag_upper
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

# Oracle = the flat aggregation the RESCUED fields must reproduce: the
# schema froze before user_id/value existed, every envelope carries them
# post-freeze, and they come back out of the reserved _rescued JSON column
# through the store — a hash match proves the freeze→drift→rescue→serve→
# extract roundtrip loses nothing (serve_compose.served_rescued).
_register(
    "served_rescued",
    served_rescued,
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid,
           round(MAX(value), 6) AS max_score,
           round(MIN(value), 6) AS min_score
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)

# Oracle = the survivors byte-cap eviction provably keeps (the LAST two of
# four mod-4 order batches — see served_retention's cap derivation): a
# hash match proves drop-oldest retention dropped exactly batches 0 and 1
# and nothing else anywhere in the store/snapshot path.
_register(
    "served_retention",
    served_retention,
    f"""
    SELECT o_orderstatus, COUNT(*) AS n, {_dsum('o_totalprice')} AS total
    FROM orders
    WHERE o_orderkey % 4 >= 2
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)

# --- TPC-H breadth pass 3 (remaining classic query shapes) -----------------
from roar_spark.operators import tpch_ext as TX  # noqa: E402

_register(
    "q4_late_orders",
    TX.q4_late_orders,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

_register(
    "q13_customer_distribution",
    TX.q13_customer_distribution,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

_register(
    "q16_supplier_count",
    TX.q16_supplier_count,
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 5
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)

_register(
    "q18_large_orders",
    TX.q18_large_orders,
    f"""
    WITH big AS (
      SELECT l_orderkey, {_dsum('l_quantity')} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {_dsum('l_quantity')} > {TX.Q18_MIN_QTY}
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM orders
    JOIN big ON o_orderkey = l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)

_register(
    "q22_idle_customers",
    TX.q22_idle_customers,
    f"""
    WITH avg_bal AS (
      SELECT ({_dsum('c_acctbal')}) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment, COUNT(*) AS numcust, {_dsum('c_acctbal')} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)

# --- composite curation pipeline (quality→lang→dedup→split) ----------------
from roar_spark.operators.curate import pipeline_curate  # noqa: E402

_register(
    "pipeline_curate",
    pipeline_curate,
    f"""
    WITH t AS (
      SELECT doc_id, md5(text) AS digest,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
               / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
             CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
               / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS ttr,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> list_contains(['the','and','of','to','a','in','is','it'], x))) AS n_stop
      FROM documents),
    gated AS (
      SELECT doc_id, digest, n_tokens FROM t
      WHERE n_tokens BETWEEN 5 AND 1000
        AND punct_ratio <= 0.2 AND ttr >= 0.3 AND n_stop > 0),
    keep AS (SELECT digest, MIN(doc_id) AS doc_id FROM gated GROUP BY digest),
    kept AS (SELECT g.doc_id, g.n_tokens FROM gated g
             JOIN keep k ON g.digest = k.digest AND g.doc_id = k.doc_id),
    assigned AS (
      SELECT doc_id, n_tokens,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < {_TRAIN_END} THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < {_VAL_END} THEN 'val'
                  ELSE 'test' END AS split
      FROM kept)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc
    FROM assigned GROUP BY split ORDER BY split
    """,
)

_register(
    "events_dau_wau",
    RX.events_dau_wau,
    """
    WITH du AS (
      SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
      FROM events),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    days AS (SELECT DISTINCT day AS anchor FROM du),
    wau AS (
      SELECT anchor, COUNT(DISTINCT user_id) AS wau
      FROM days JOIN du ON date_diff('day', du.day, days.anchor) BETWEEN 0 AND 6
      GROUP BY anchor)
    SELECT dau.day AS day, dau, wau
    FROM dau JOIN wau ON dau.day = wau.anchor
    ORDER BY day
    """,
)

_register(
    "q7_volume_shipping",
    TX.q7_volume_shipping,
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
           {_decsum(_REV)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)

_register(
    "q15_top_supplier",
    TX.q15_top_supplier,
    f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {_decsum(_REV)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-07-01'
        AND l_shipdate <  TIMESTAMP '1997-10-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)

_register(
    "q19_disjunctive_predicates",
    TX.q19_disjunctive_predicates,
    f"""
    SELECT {_decsum(_REV)} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)

_register(
    "q21_waiting_supplier",
    TX.q21_waiting_supplier,
    """
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) = 1 AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY l_orderkey, l_suppkey),
    waiting AS (
      SELECT l1.l_orderkey, l1.l_suppkey
      FROM lo l1
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM lo l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lo l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey AND l3.late))
    SELECT s_name, COUNT(*) AS numwait
    FROM waiting JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
    """,
)

_register(
    "q2_min_cost_supplier",
    TX.q2_min_cost_supplier,
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_s
      FROM lineitem GROUP BY 1, 2),
    elig AS (
      SELECT p_partkey, s_name, s_acctbal, n_name, cost_s
      FROM cost
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 3 AND p_type = 'ECONOMY' AND r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, cost_s / 100.0 AS supplycost
    FROM elig e
    WHERE cost_s = (SELECT MIN(cost_s) FROM elig m WHERE m.p_partkey = e.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)

_register(
    "q8_market_share",
    TX.q8_market_share,
    f"""
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN ns.n_name = 'NATION_1' THEN {_REV} ELSE 0 END)
                AS DOUBLE) / SUM({_REV}) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region ON nc.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)

_register(
    "q9_product_type_profit",
    TX.q9_product_type_profit,
    f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           SUM({_REV} - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                        * CAST(ROUND(l_quantity) AS BIGINT) * 100) / 10000.0
             AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)

_register(
    "q11_important_parts",
    TX.q11_important_parts,
    """
    WITH national AS (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * CAST(ROUND(l_quantity) AS BIGINT) AS val_s
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1')
    SELECT l_partkey, SUM(val_s) / 100.0 AS value
    FROM national
    GROUP BY l_partkey
    HAVING CAST(SUM(val_s) AS DOUBLE)
           > (SELECT CAST(SUM(val_s) AS DOUBLE) FROM national) * 0.001
    ORDER BY value DESC, l_partkey
    """,
)

_register(
    "q20_excess_suppliers",
    TX.q20_excess_suppliers,
    """
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'),
    per_ps AS (
      SELECT l_partkey, l_suppkey, SUM(qty) AS supp_qty
      FROM shipped GROUP BY 1, 2),
    per_part AS (
      SELECT l_partkey, SUM(qty) AS total_qty
      FROM shipped GROUP BY 1)
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT p.l_suppkey
        FROM per_ps p JOIN per_part t ON p.l_partkey = t.l_partkey
        WHERE p.supp_qty * 2 > t.total_qty)
    ORDER BY s_name
    """,
)

_register(
    "events_cohort_retention",
    RX.events_cohort_retention,
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (
      SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
           COUNT(*) AS n_users
    FROM ud JOIN first USING (user_id)
    WHERE date_diff('day', cohort_day, day) <= 13
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)

_register(
    "events_path_transitions",
    RX.events_path_transitions,
    """
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type AS src_type, next_type AS dst_type,
           COUNT(*) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n_transitions DESC, src_type, dst_type
    """,
)

_register(
    "events_gap_fill",
    RX.events_gap_fill,
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_raw
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    all_days AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span),
    filled AS (
      SELECT a.user_id, a.day, CAST(COALESCE(n_raw, 0) AS BIGINT) AS n_events
      FROM all_days a
      LEFT JOIN daily d ON a.user_id = d.user_id AND a.day = d.day)
    SELECT user_id, day, n_events,
           CAST(SUM(n_events) OVER w AS BIGINT) AS cum_events,
           LAST_VALUE(CASE WHEN n_events > 0 THEN day END IGNORE NULLS)
             OVER w AS last_active_day
    FROM filled
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, day
    """,
)

_register(
    "dq_profile",
    RX.dq_profile,
    """
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderkey) AS o_orderkey__nn, COUNT(DISTINCT o_orderkey) AS o_orderkey__nd,
             COUNT(o_custkey) AS o_custkey__nn, COUNT(DISTINCT o_custkey) AS o_custkey__nd,
             COUNT(o_orderstatus) AS o_orderstatus__nn, COUNT(DISTINCT o_orderstatus) AS o_orderstatus__nd,
             COUNT(o_totalprice) AS o_totalprice__nn, COUNT(DISTINCT o_totalprice) AS o_totalprice__nd,
             COUNT(o_orderdate) AS o_orderdate__nn, COUNT(DISTINCT o_orderdate) AS o_orderdate__nd,
             COUNT(o_orderpriority) AS o_orderpriority__nn, COUNT(DISTINCT o_orderpriority) AS o_orderpriority__nd
      FROM orders)
    SELECT column_name, n_rows, n_nulls, n_distinct FROM (
      SELECT 'o_orderkey' AS column_name, n_rows, n_rows - o_orderkey__nn AS n_nulls, o_orderkey__nd AS n_distinct FROM m
      UNION ALL SELECT 'o_custkey' AS column_name, n_rows, n_rows - o_custkey__nn AS n_nulls, o_custkey__nd AS n_distinct FROM m
      UNION ALL SELECT 'o_orderstatus' AS column_name, n_rows, n_rows - o_orderstatus__nn AS n_nulls, o_orderstatus__nd AS n_distinct FROM m
      UNION ALL SELECT 'o_totalprice' AS column_name, n_rows, n_rows - o_totalprice__nn AS n_nulls, o_totalprice__nd AS n_distinct FROM m
      UNION ALL SELECT 'o_orderdate' AS column_name, n_rows, n_rows - o_orderdate__nn AS n_nulls, o_orderdate__nd AS n_distinct FROM m
      UNION ALL SELECT 'o_orderpriority' AS column_name, n_rows, n_rows - o_orderpriority__nn AS n_nulls, o_orderpriority__nd AS n_distinct FROM m)
    ORDER BY column_name
    """,
)


from roar_spark.operators.relational_ext import agg_kmv_distinct  # noqa: E402

_register(
    "agg_kmv_distinct",
    agg_kmv_distinct,
    """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM d),
    v AS (SELECT event_type,
                 (((((((((((((((CAST(0 AS BIGINT) * 16 + (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 9, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 10, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 11, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 12, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 13, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 14, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substr(hx, 15, 1)) - 1)) AS v
          FROM h),
    r AS (SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
          FROM v),
    a AS (SELECT event_type, COUNT(*) AS n_exact,
                 MAX(CASE WHEN rn <= 64 THEN v END) AS kth_hash
          FROM r GROUP BY event_type)
    SELECT event_type, n_exact, kth_hash,
           CASE WHEN n_exact < 64 THEN CAST(n_exact AS DOUBLE)
                ELSE round(63.0 * 1152921504606846976.0 / CAST(kth_hash AS DOUBLE), 6)
           END AS kmv_est
    FROM a ORDER BY event_type
    """,
)


_register(
    "sample_topk_per_stratum",
    SM.sample_topk_per_stratum,
    """
    WITH r AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
      FROM documents)
    SELECT lang, rk, doc_id FROM r WHERE rk <= 20 ORDER BY lang, rk
    """,
)

_register(
    "corpus_mix_report",
    SM.corpus_mix_report,
    r"""
    WITH a AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT)
               AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY 1, 2)
    SELECT source, lang, n_docs, n_tokens, n_chars,
           round(100.0 * CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER () AS DOUBLE), 6) AS pct_docs,
           round(100.0 * CAST(n_tokens AS DOUBLE)
                 / CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS pct_tokens
    FROM a ORDER BY source, lang
    """,
)
