"""Second breadth pass over the relational surface: range window frames,
lateral explode (UDTF-shaped), extended string functions, exact median via
window ranking, and schema-evolution union (unionByName).

Same determinism rules as relational.py; every query here has an exact
DuckDB oracle in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from roar_spark.catalog import load_table
from roar_spark.operators.relational import _scaled, davg, dsum


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, total spend in the trailing 90 days of
    each order (value-based frame, not row-based — orders on the same day
    all see the same window). Frame bounds on integral epoch days.

    §2.4 range-seed audit note (r12): the window_running prefix-rule seed
    (repartitionByRange(o_custkey)) was applied, plan-verified (2
    exchanges → 1, plans/r12/window_range_frame_after.txt) — and then
    REVERTED on measurement: a drift-1.000 interleaved A/B read the
    seeded form ~10-15% SLOWER (old best/median 0.946/1.029 s vs seeded
    1.053/1.188 s over 5 rep pairs). Unlike window_running — whose window
    sort keys equal the output order, so the seed deletes the global
    sort outright — this window sorts on (custkey, order_day) while the
    output adds an orderkey tiebreak: the seeded plan still pays a full
    3-key partition-local sort ON TOP of the window's 2-key sort, plus
    the range-sampling pass, and those together cost more than the
    removed exchange returns at this row width. SCALE.md r12 records
    both numbers."""
    orders = load_table(spark, "orders", sf_dir)
    # timezone-free day number (o_orderdate is TIMESTAMP_NTZ; epoch-micros
    # functions would need an LTZ cast that shifts under non-UTC sessions)
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("order_day"))
        .rangeBetween(-90, 0)
    )
    return (
        orders.withColumn("order_day", day)
        .select(
            "o_custkey",
            "o_orderkey",
            "order_day",
            (F.sum(_scaled(F.col("o_totalprice"))).over(w) / F.lit(100.0)).alias(
                "trailing_90d_spend"
            ),
            F.count(F.lit(1)).over(w).alias("trailing_90d_orders"),
        )
        .orderBy("o_custkey", "order_day", "o_orderkey")
    )


def lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped lateral: explode each document's token array WITH
    position, keep the first 5 tokens per doc (posexplode ↔ UNNEST WITH
    ORDINALITY)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        docs.select("doc_id", F.posexplode(toks).alias("pos", "token"))
        .filter(F.col("pos") < 5)
        .select("doc_id", (F.col("pos") + 1).cast("long").alias("token_no"), "token")
        .orderBy("doc_id", "token_no")
    )


def scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function family: regexp_extract, lpad/rpad, reverse,
    replace, split_part, starts/ends-with."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") % 20 == 0)
    return (
        part.select(
            "p_partkey",
            F.regexp_extract(F.col("p_name"), r"([a-z]+)", 1).alias("first_word"),
            F.lpad(F.col("p_brand"), 12, "#").alias("brand_padded"),
            F.rpad(F.col("p_type"), 10, ".").alias("type_padded"),
            F.reverse(F.col("p_brand")).alias("brand_rev"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("name_head"),
            F.col("p_type").startswith("PROMO").cast("int").alias("is_promo"),
            F.col("p_name").endswith("a").cast("int").alias("ends_a"),
        )
        .orderBy("p_partkey")
    )


def agg_median_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group via the ranking composition (deterministic,
    unlike interpolating percentile built-ins whose arithmetic differs
    across engines): median = avg of the middle one/two values, computed
    on exact scaled integers.

    Scale shape: the rank comes from the two-level bucketed global rank
    (operators/ranks.py) — o_orderpriority has 5 values and a
    rank-producing window gets no WindowGroupLimit protection, so the
    plain form sorts orders/5 per task at 100 TB; the bucketed form ranks
    inside (priority, price-bucket) at full parallelism. Identical rank
    values (equivalence-pinned), same oracle."""
    from roar_spark.operators.ranks import bucketed_global_rank

    orders = load_table(spark, "orders", sf_dir)
    ranked = bucketed_global_rank(
        orders.select(
            "o_orderpriority",
            _scaled(F.col("o_totalprice")).alias("price_c"),
            "o_orderkey",
        ),
        ["o_orderpriority"],
        "price_c",
        "o_orderkey",
        # ~$164 price buckets → ~3.7k rank slices per priority over the
        # observed ~$9..$600k totalprice spread (width needs no domain
        # bound; narrower = more parallel, level-2 table stays tiny)
        1 << 14,
        rank_col="rn",
        count_col="n",
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
    )
    return (
        mid.groupBy("o_orderpriority")
        .agg((F.sum("price_c") / F.count(F.lit(1)) / F.lit(100.0)).alias("median_price"))
        .orderBy("o_orderpriority")
    )


def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two projections with different column sets
    unioned by NAME with missing columns null-filled (unionByName ↔ SQL
    UNION ALL BY NAME)."""
    cust = load_table(spark, "customer", sf_dir)
    a = cust.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.col("c_name").alias("name"), F.col("c_acctbal").alias("balance")
    )
    b = cust.filter(F.col("c_acctbal") < -500).select(
        "c_custkey", F.col("c_mktsegment").alias("segment"), F.col("c_name").alias("name")
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .select("c_custkey", "name", "balance", "segment")
        .orderBy("c_custkey")
    )


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h wide, 30 min slide): every event
    lands in exactly two overlapping windows. Uses Spark's native
    window(slide) — epoch-aligned, mirrored in the oracle by integer epoch
    arithmetic over the two slide offsets."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per-lineitem order keys minus one
    occurrence per matching order key — multiplicities matter, unlike the
    set-based setop_except."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 45).select(
        F.col("l_orderkey").alias("okey")
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).select(F.col("o_orderkey").alias("okey"))
    return li.exceptAll(orders).groupBy("okey").agg(
        F.count(F.lit(1)).alias("n_left")
    ).orderBy("okey")


def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation with deterministic ordering: per order, the sorted
    list of its line numbers and quantities-by-line. collect_list is
    order-nondeterministic in a distributed engine, so the sort happens
    explicitly AFTER collection (array_sort ↔ DuckDB list(… ORDER BY …)).
    The list is serialized to a CSV string for the driver's canonicalizer
    (raw array columns are unhashable in its pandas sort — r2 finding)."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") % 100 == 0)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("l_linenumber").cast("long"))).cast(
                    "array<string>"
                ),
                ",",
            ).alias("line_numbers"),
            # count, not size(collect_list): the latter materialized a full
            # duplicate per-group array buffer just to measure it (r8
            # review); l_linenumber is non-null so the values are identical
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


# Balance-cents per ntile rank bucket: c_acctbal spans ~1.1M cents
# (TPC-H -999.99..9999.99), so 64-cent buckets give ~17k rank slices per
# segment — parallelism is |groups|·|occupied buckets|, and the width is
# the lever that keeps per-slice sort input small as the corpus grows
# (r7 review: a 4096-cent width capped the slices at ~270, a constant
# improvement rather than a scale-out one). floor(bal/width) is monotone
# in balance, so bucket order = rank order and no sampling pass is
# needed; the level-2 offsets table is |groups|·|buckets| rows — tiny at
# any width down to 1 cent. Value skew (many equal balances)
# concentrates one bucket, bounded by that value's row mass only.
_NTILE_BUCKET_CENTS = 64


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing (ntile) of customers by balance within market
    segment, with per-quartile aggregates.

    Scale shape: ntile needs each row's GLOBAL rank and its group's total
    count, and — unlike the rank-filter family — gets no WindowGroupLimit
    protection (every row is output), so a single segment-keyed window
    sorts corpus/5 rows per task at 100 TB. Computed instead as the
    two-level rank the pack_sequences prefix sum uses: rows bucket by
    fixed-width balance ranges (monotone in the sort key, no sampling
    job), level 1 ranks inside (segment, bucket) at full parallelism,
    level 2 cumulates per-bucket counts per segment (tiny) and the global
    rank is offset + local. The quartile is then Spark's exact NTile
    arithmetic (first n%4 tiles take ⌈n/4⌉ rows) applied to (rank, count)
    — value-identical to ntile(4) OVER the single window, pinned by a
    direct equivalence test across remainder/undersized groups."""
    from roar_spark.operators.ranks import bucketed_global_rank

    cust = load_table(spark, "customer", sf_dir)
    ranked = bucketed_global_rank(
        cust.select(
            "c_mktsegment",
            _scaled(F.col("c_acctbal")).alias("bal_c"),
            "c_custkey",
        ).withColumn(
            # ASC rank = DESC balance; NULL balances map to a sentinel ABOVE
            # every real negated value so they rank LAST — matching native
            # ntile's DESC NULLS LAST default (a bare -bal_c left NULL as
            # NULL, which bucketed_global_rank ranks FIRST; r8 review).
            # bal_c is a ×100 long ≤ ~1e8, so 2^61 clears any real value.
            "neg_bal",
            F.coalesce(-F.col("bal_c"), F.lit(1 << 61)),
        ),
        ["c_mktsegment"],
        "neg_bal",
        "c_custkey",
        _NTILE_BUCKET_CENTS,
        rank_col="rn",
        count_col="cnt",
    )
    # Spark NTile(4): base = n div 4 rows per tile, the first n % 4 tiles
    # take one extra; ceil-division via floor((a + b - 1) / b) on longs
    base = F.floor(F.col("cnt") / 4).cast("long")
    rem = F.pmod(F.col("cnt"), F.lit(4)).cast("long")
    wide = base + 1  # size of the padded tiles (first `rem` of them)
    threshold = wide * rem  # rows covered by the padded tiles
    tile = F.when(
        F.col("rn") <= threshold,
        F.floor((F.col("rn") + wide - 1) / wide),
    ).otherwise(
        rem
        + F.floor(
            (F.col("rn") - threshold + F.greatest(base, F.lit(1)) - 1)
            / F.greatest(base, F.lit(1))
        )
    )
    quartiled = ranked.select(
        "c_mktsegment", "bal_c", tile.cast("long").alias("quartile")
    )
    return (
        quartiled.groupBy("c_mktsegment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("bal_c") / F.lit(100.0)).alias("total_balance"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


def events_hourly_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, bucket its hours into volume quartiles with the
    NATIVE ntile window and report per-quartile hour counts and volume
    bounds. The window input is the PRE-AGGREGATED hourly table —
    |event_types|·|hours| rows by construction — so the plain ntile
    window IS the scale-correct plan here, in contrast to window_ntile,
    which ranks raw corpus rows and therefore uses the bucketed two-level
    rank. Also keeps Spark's native NTile expression under the DuckDB
    oracle after the window_ntile rewrite stopped exercising it
    (r7 review)."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("event_type").orderBy(F.desc("n_events"), F.asc("hour_start"))
    q = hourly.withColumn("volume_quartile", F.ntile(4).over(w).cast("long"))
    return (
        q.groupBy("event_type", "volume_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("n_events").cast("long").alias("total_events"),
            F.min("n_events").cast("long").alias("min_events"),
            F.max("n_events").cast("long").alias("max_events"),
        )
        .orderBy("event_type", "volume_quartile")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below a per-group aggregate threshold
    (lineitems with quantity under 20% of their part's average) — the
    classic correlated-aggregate-subquery, declared as the decorrelated
    join Catalyst would produce."""
    li = load_table(spark, "lineitem", sf_dir)
    # the canonical exact-sum helpers, not inline re-spellings (identical
    # value and division order on these non-null columns; r8 review)
    part_avg = li.groupBy("l_partkey").agg(davg(F.col("l_quantity")).alias("avg_qty"))
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel sequencing over the event stream: per user, first signup,
    first click after that signup, first purchase after that click —
    exact timestamps, fully deterministic.

    Plan shape (r9): ONE hash exchange on user_id, then three chained
    conditional window-mins over that partitioning. Each step's condition
    references the previous step's windowed value, so Catalyst stacks
    three Window operators — but the child is already hash-partitioned on
    user_id and no operator re-orders, so NO further exchange appears,
    and the final per-user collapse reuses the same partitioning. The
    previous form chained three self-joins of the event table (signup ⋈
    click ⋈ purchase): at 100 TB that re-shuffles the fact table per
    funnel step (the stats-independence audit counted 10 SortMergeJoins);
    this form shuffles it once regardless of funnel depth. Values are
    bit-identical (same conditional-min semantics; the oracle is
    unchanged): a user with no qualifying click leaves t_click NULL and
    the purchase condition ts > NULL never fires, exactly as the old
    inner-join chain produced absent rows surfaced as NULLs."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id")
    staged = (
        ev.select("user_id", "event_type", "ts")
        .withColumn(
            "t_signup",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("t_signup").isNotNull())
        .groupBy("user_id")  # rows per user all carry identical windowed
        # values — min() collapses without a second exchange (same key)
        .agg(
            F.min("t_signup").alias("t_signup"),
            F.min("t_click").alias("t_click"),
            F.min("t_purchase").alias("t_purchase"),
        )
        .orderBy("user_id")
    )


def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation via salting: phase 1 aggregates on
    (salt, key) — spreading a hot key over 16 reducers — phase 2 merges the
    partials per key. Results are identical to the direct groupBy (the
    oracle is the plain GROUP BY), but no single reducer ever owns a hot
    key's full row stream. The salt must be DETERMINISTIC (hash-derived,
    not rand()) so re-runs and retries agg identically; partial sums are
    exact scaled integers so the two-phase split can't change the result.

    This is the manual form; AQE's skew-join splitting (enabled in
    session.py) handles the join-side version automatically at runtime.
    """
    li = load_table(spark, "lineitem", sf_dir)
    salt = F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(16)).alias("salt")
    partial = (
        li.select("l_returnflag", salt, _scaled(F.col("l_quantity")).alias("qty_c"))
        .groupBy("l_returnflag", "salt")
        .agg(F.sum("qty_c").alias("qty_part"), F.count(F.lit(1)).alias("n_part"))
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            (F.sum("qty_part") / F.lit(100.0)).alias("sum_qty"),
            F.sum("n_part").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + 7-day rolling active users — the retention dashboard query.

    Exact rolling distinct is not window-decomposable (you cannot merge
    per-day distinct sets), so each (day, user) row is EXPLODED to the 7
    anchor days whose trailing window contains it (sequence + explode —
    pure map-side fan-out), then COUNT DISTINCT per anchor. Cost is
    exactly 7× the (day, user) table — linear in users, never in raw
    events; the raw event table is reduced to (day, user) FIRST. (The
    equivalent date-range JOIN has no equi key: Spark plans it as a
    broadcast nested loop evaluating |days| × |day,user| predicates —
    measured as the dominant cost at scale — while the explode form
    shuffles only the fanned rows on the anchor key.) Anchors beyond the
    observed day range cost nothing: they drop in the semi-join against
    the real distinct-day dimension."""
    ev = load_table(spark, "events", sf_dir)
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # the day dimension comes from the ALREADY-AGGREGATED dau table (~|days|
    # rows), not a third distinct over the corpus-sized du — exchange reuse
    # rarely dedupes these diamonds (r8 review / memory note)
    days = dau.select(F.col("day").alias("anchor"))
    fanned = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("anchor"),
    )
    wau = (
        # BROADCAST the day dimension into the semi-join (r9): `fanned` is
        # corpus-scale (7x the (day, user) table) while `days` is bounded
        # by the observed calendar (~|days| rows at any corpus size), but
        # above the stats threshold the fallback SMJ would shuffle all of
        # `fanned` on anchor just to drop out-of-range anchors; the hint
        # keeps the only corpus-scale exchange the COUNT DISTINCT's own.
        fanned.join(F.broadcast(days), "anchor", "left_semi")
        .groupBy("anchor")
        .agg(F.count_distinct(F.col("user_id")).alias("wau"))
    )
    return (
        dau.join(F.broadcast(wau), dau.day == wau.anchor)  # both |days|-sized
        .select("day", "dau", "wau")
        .orderBy("day")
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day, counted
    on each subsequent active day (offset 0–13).

    Scale shape: the raw event stream collapses to the distinct
    (user, day) table FIRST (map-side combinable), the per-user MIN is one
    key-partitioned aggregation, and the cohort join is user_id⋈user_id —
    both sides already hash-partitioned on the same key, so AQE plans one
    co-located shuffle, never a day-range explosion. Because (user, day)
    is distinct, the final per-(cohort, offset) count needs no
    COUNT DISTINCT — each user contributes exactly one row per active
    day. Cost is linear in active (user, day) pairs, never raw events."""
    ev = load_table(spark, "events", sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ud.join(first, "user_id")
        .withColumn("day_offset", F.datediff(F.col("day"), F.col("cohort_day")).cast("long"))
        .filter(F.col("day_offset") <= 13)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix: per user, consecutive event pairs in
    (ts, event_id) order, counted corpus-wide — the Markov/path-analysis
    primitive behind funnels and next-action models.

    One hash shuffle on user_id for the lead() window (event_id breaks ts
    ties deterministically), then a partial-agg count on the tiny
    (src, dst) type-pair space — the second shuffle carries at most
    |event_types|² rows per partition."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src_type"), F.col("next_type").alias("dst_type")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), "src_type", "dst_type")
    )


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + forward fill: every user gets a dense
    daily row over their active span — missing days appear with
    n_events = 0, a running event total, and the last active day carried
    forward (the imputation shape feeding downstream feature pipelines).

    Scale shape: raw events collapse to (user, day) counts FIRST; the
    dense calendar is generated distributed via sequence()+explode per
    user (never a driver loop), bounded by each user's own span; the
    fill join and both window functions share ONE hash shuffle on
    user_id. All emitted metrics are integers/dates — exact under any
    partitioning."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_raw")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    all_days = span.select(
        "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    filled = all_days.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce(F.col("n_raw"), F.lit(0)).cast("long").alias("n_events")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        filled.select(
            "user_id",
            "day",
            "n_events",
            F.sum("n_events").over(w).alias("cum_events"),
            F.last(
                F.when(F.col("n_events") > 0, F.col("day")), ignorenulls=True
            ).over(w).alias("last_active_day"),
        )
        .orderBy("user_id", "day")
    )


DQ_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of ``orders``: per-column row/null/distinct
    counts — the validation pass a pipeline runs before trusting a drop.

    ONE aggregation computes every column's metrics (the count-distincts
    expand map-side; no per-column table rescans — profiling N columns
    costs one scan, which is the only acceptable cost at 100 TB), then a
    six-row stack() unpivot reshapes metrics into rows. Counts only — no
    min/max, whose cross-engine float formatting is non-portable."""
    orders = load_table(spark, "orders", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in DQ_PROFILE_COLS:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.count_distinct(c).alias(f"{c}__nd"))
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd" for c in DQ_PROFILE_COLS
    )
    return (
        one.selectExpr(
            "n_rows",
            f"stack({len(DQ_PROFILE_COLS)}, {stack_args})"
            " AS (column_name, n_nonnull, n_distinct)",
        )
        .select(
            "column_name",
            "n_rows",
            (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
            "n_distinct",
        )
        .orderBy("column_name")
    )


RANGE_JOIN_WINDOW_SEC = 60


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join without a nested loop: for every purchase event,
    count error events in the following 60 s (any user — incident
    correlation).

    A naive t-range join is O(n·m) (BroadcastNestedLoopJoin). This is the
    bin-bucketed form: both sides get a minute-bin key; a 60 s window
    starting anywhere spans at most two adjacent bins, so the probe side
    fans out to (bin, bin+1) and the join is a plain EQUI-join on the bin
    key with the exact (ts, ts+60 s] predicate as a cheap post-filter.
    Shuffle is keyed by time bin — uniform for event streams — and cost is
    candidates-per-bin, linear at any scale. The same shape handles any
    bounded-window interval join (the streaming twin is
    stream_stream_join's watermarked time-range join)."""
    ev = load_table(spark, "events", sf_dir)
    win = RANGE_JOIN_WINDOW_SEC
    bin_of = lambda c: F.floor(c.cast("double") / win).cast("long")  # noqa: E731
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        bin_of(F.col("ts")).alias("bin"),
    )
    probe = purchases.withColumn("probe", F.explode(F.array(F.col("bin"), F.col("bin") + 1))).drop(
        "bin"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"), bin_of(F.col("ts")).alias("probe")
    )
    hits = (
        probe.join(errors, "probe")
        .filter(
            (F.col("e_ts") > F.col("p_ts"))
            & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {win} SECONDS"))
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    return (
        purchases.select("purchase_id", "p_ts")
        .join(hits, "purchase_id", "left")
        .select(
            "purchase_id",
            F.col("p_ts").alias("purchase_ts"),
            F.coalesce(F.col("n_errors"), F.lit(0)).alias("n_errors_60s"),
        )
        .orderBy("purchase_id")
    )


def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection over hourly event counts —
    the ops-dashboard "is this hour abnormal for this event type" query.

    Each (event_type, hour) count is scored against the observed hourly
    counts in the trailing 24 WALL-CLOCK hours (RANGE frame over integral
    epoch-hours, current hour excluded) — a ROWS frame would silently
    stretch the lookback across gaps in the hourly pre-aggregation
    (ADVICE r2). Hours with zero events are absent, so they contribute no
    observations rather than zeros (documented observed-rows semantics;
    events_gap_fill is the densified twin). Hours with fewer than 12
    observed trailing hours are unscored (cold start). Mean and
    sample variance come from EXACT integer window sums (Σc and Σc² of
    bigint counts), so the doubles on both engines derive from identical
    integers through an identical operation order — bit-exact across
    engines, unlike stddev_samp whose accumulation order is
    engine-internal. Shape: one shuffle for the hourly pre-aggregation
    (map-side combined), one hash shuffle on event_type for the window;
    the window frame is O(24) state per row. The pre-aggregation bounds
    the window input to |event_types| × |hours| rows regardless of raw
    event volume."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    hourly = hourly.withColumn(
        "epoch_hour", (F.unix_micros(F.col("hour_start")) / F.lit(3_600_000_000)).cast("long")
    )
    w = W.partitionBy("event_type").orderBy("epoch_hour").rangeBetween(-24, -1)
    c = F.col("n_events").cast("double")
    n = F.col("hist_n").cast("double")
    s = F.col("hist_s").cast("double")
    ss = F.col("hist_ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1.0))
    z = (c - mean) / F.sqrt(var)
    return (
        hourly.select(
            "hour_start",
            "event_type",
            "n_events",
            F.count(F.lit(1)).over(w).alias("hist_n"),
            F.sum("n_events").over(w).alias("hist_s"),
            F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("hist_ss"),
        )
        .filter(F.col("hist_n") >= 12)
        .select(
            "hour_start",
            "event_type",
            "n_events",
            F.round(mean, 6).alias("trailing_mean"),
            F.when(var > 0, F.round(z, 6)).alias("z_score"),
            F.coalesce(F.abs(F.when(var > 0, z)) > 2.5, F.lit(False)).alias("is_anomaly"),
        )
        .orderBy("hour_start", "event_type")
    )


# KMV (k-minimum-values) distinct sketch: k smallest hash values of the
# set estimate its cardinality as (k-1)/F(v_k), F(v) = v / 16^15 the
# uniform-fraction of the 60-bit hash space. Chosen over HLL for the
# oracle story: every ingredient (md5, hex-digit arithmetic, rank, one
# double division) is deterministic and portable, so unlike
# agg_stats_sketches (engine-native HLL, rows-only check) this sketch is
# exact-value verifiable cross-engine.
KMV_K = 64
KMV_HEX_DIGITS = 15  # 60-bit numeric hash: max value 16^15 = 2^60 < 2^63


def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distinct-count sketch per event type: KMV over
    md5(user_id), reported next to the exact distinct count.

    Shape: DISTINCT (event_type, user_id) → one md5 per row, materialized
    once (Horner fold over 15 hex digits into a 60-bit int64) → per-type
    rank window over just (event_type, v). The shuffles are keyed exactly
    like the exact distinct count the sketch sits beside — nothing here is
    worse than COUNT(DISTINCT). At 100 TB the production form of this
    sketch is a partially-mergeable accumulator (each task keeps its k
    smallest, merge keeps the k smallest of unions — what
    approx_count_distinct's HLL does natively); this operator demonstrates
    the sketch mathematics with exact cross-engine verifiability, which
    the engine-native HLL cannot offer."""
    ev = load_table(spark, "events", sf_dir)
    d = (
        ev.select("event_type", "user_id")
        .distinct()
        .withColumn("h", F.md5(F.col("user_id").cast("string")))
    )
    # one conv parse of the 15-digit prefix — identical value to the
    # digit-by-digit horner loop it replaces, minus 15 strpos scans/row
    from roar_spark.functions.text_fns import hex_prefix_long

    d = d.select(
        "event_type", hex_prefix_long(F.col("h"), KMV_HEX_DIGITS).alias("v")
    )
    w = W.partitionBy("event_type").orderBy("v")
    ranked = d.withColumn("rn", F.row_number().over(w))
    space = float(16**KMV_HEX_DIGITS)  # 2^60, exact in double
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.max(F.when(F.col("rn") <= KMV_K, F.col("v"))).alias("kth_hash"),
    )
    est = F.when(
        F.col("n_exact") < KMV_K, F.col("n_exact").cast("double")
    ).otherwise(
        # (k-1) * 2^60 exact in double (6 significant bits); one division
        F.round(F.lit((KMV_K - 1) * space) / F.col("kth_hash").cast("double"), 6)
    )
    return agg.select(
        "event_type", "n_exact", "kth_hash", est.alias("kmv_est")
    ).orderBy("event_type")
