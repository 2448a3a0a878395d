"""Physical-plan hygiene: the properties that make these plans survive a
100× scale-up. Asserted against explain() output so regressions in filter
pushdown, join strategy, or accidental Python-in-the-hot-path fail CI."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from roar_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_q1_filter_and_projection_pushdown(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must NOT read join keys it doesn't need
    read_schema = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q5_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region pinned
    assert "CartesianProduct" not in plan


def test_q3_pushes_all_three_filters(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge


def test_partial_aggregation_before_shuffle(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning(l_returnflag" in plan  # partial aggs meet at one key exchange


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in plan_of(spark, "join_semi")
    assert "LeftAnti" in plan_of(spark, "join_anti")


def test_non_equi_join_is_broadcast_nested_loop(spark):
    # tiny bracket dim → BNLJ is the correct physical choice
    assert "BroadcastNestedLoopJoin" in plan_of(spark, "join_non_equi")


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q5_local_supplier_volume",
        "window_running",
        "dedup_minhash_lsh",
        "text_stats",
        "events_sessionize",
        "asof_latest_order",
    ],
)
def test_no_python_in_hot_path(spark, name):
    """Relational + text/dedup operators must stay fully JVM-side; Python
    stages are reserved for the two vectorized kernels that declare them
    (cosine block screen, multimodal decode)."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan  # row-at-a-time UDF — never OK
    assert "ArrowEvalPython" not in plan


def test_asof_join_single_shuffle(spark):
    """The as-of composition must shuffle ONCE on the key (window), not
    produce a range-join explosion."""
    plan = plan_of(spark, "asof_latest_order")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(user_id" in plan


def test_cosine_screen_is_arrow_batched(spark):
    """The one sanctioned Python stage runs via Arrow — the blocked screen's
    FlatMapGroupsInPandas or the small-corpus single-task MapInPandas (r11)
    — never row-at-a-time."""
    plan = plan_of(spark, "sim_cosine_pairs")
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_salted_aggregation_two_exchanges(spark):
    """The salted two-phase agg must show BOTH exchanges — (key, salt)
    then (key) — proving the hot key actually spreads over reducers."""
    plan = plan_of(spark, "agg_salted_twophase")
    assert "hashpartitioning(l_returnflag" in plan
    assert "salt" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final × two phases


def test_tpch_subquery_shapes_decorrelate(spark):
    # q4 EXISTS → left-semi; q16 NOT IN → left-anti; q22 NOT EXISTS →
    # left-anti with its scalar subquery as a 1-row broadcast (the only
    # sanctioned BroadcastNestedLoopJoin)
    assert "LeftSemi" in plan_of(spark, "q4_late_orders")
    p16 = plan_of(spark, "q16_supplier_count")
    assert "LeftAnti" in p16 and "CartesianProduct" not in p16
    p22 = plan_of(spark, "q22_idle_customers")
    assert "LeftAnti" in p22 and "CartesianProduct" not in p22


def test_minhash_verify_has_no_shingle_self_join(spark):
    # candidate-driven verification: the only aggregations over the full
    # shingle table are the signature mins and the per-doc size count —
    # the O(hot-shingle²) shingle-key self-join must not exist
    plan = plan_of(spark, "dedup_minhash_lsh")
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "shingle#" not in line.split("Join")[1].split("]")[0] or (
                "doc_id" in line
            ), f"shingle-only join key: {line}"


def test_curate_is_scan_plus_digest_shuffles(spark):
    # the three gates fuse into the scan projection; shuffles are only the
    # keep-list aggregation, its semi-join, and the final split rollup
    plan = plan_of(spark, "pipeline_curate")
    assert "LeftSemi" in plan
    import re

    n_exchanges = len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan))
    assert n_exchanges <= 5, f"{n_exchanges} exchange nodes"
    assert "BatchEvalPython" not in plan  # all gates are JVM expressions


def test_served_rollup_expands_after_store_scan(spark):
    plan = plan_of(spark, "served_rollup")
    assert "Expand" in plan  # rollup grouping-set expansion
    assert "BatchEvalPython" not in plan


def test_q2_groupwise_min_stays_equi(spark):
    # groupwise-min rejoin is an equi-join on (partkey, cost); dims broadcast
    p = plan_of(spark, "q2_min_cost_supplier")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2  # nation + region (+ small aggs)
    assert "BatchEvalPython" not in p


def test_q8_q9_star_joins_push_filters(spark):
    p8 = plan_of(spark, "q8_market_share")
    assert "CartesianProduct" not in p8 and "BatchEvalPython" not in p8
    assert "EqualTo(p_type,PROMO)" in p8  # dim filter reaches the part scan
    p9 = plan_of(spark, "q9_product_type_profit")
    assert "StringContains(p_name,widget)" in p9  # LIKE pushed as Contains
    assert "CartesianProduct" not in p9


def test_q11_threshold_is_one_row_broadcast(spark):
    # the only nested-loop join is the sanctioned 1-row scalar threshold
    p = plan_of(spark, "q11_important_parts")
    assert "CartesianProduct" not in p
    # exactly one BNLJ node (formatted output names each node twice:
    # once in the tree, once in the detail section)
    assert p.count("BroadcastNestedLoopJoin") == 2


def test_q20_semi_join_chain(spark):
    p = plan_of(spark, "q20_excess_suppliers")
    assert "LeftSemi" in p
    assert "StringStartsWith(p_name,small)" in p  # prefix LIKE pushed
    assert "CartesianProduct" not in p


def test_dedup_embedding_screen_and_anti_join(spark):
    # same Arrow-batched screen as sim_cosine_pairs (either the blocked
    # FlatMapGroupsInPandas or the small-corpus single-task MapInPandas
    # kernel — r11, mirrors the sim_cosine_pairs pin), then an id-only
    # anti-join
    p = plan_of(spark, "dedup_embedding")
    assert "FlatMapGroupsInPandas" in p or "MapInPandas" in p
    assert "LeftAnti" in p
    assert "BatchEvalPython" not in p


def test_decontaminate_broadcasts_eval_side(spark):
    # the eval shingle set must broadcast; the training shingle table
    # streams through without a shuffle on the shingle key
    p = plan_of(spark, "dedup_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_top_tokens_no_global_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "text_top_tokens")


def test_gap_fill_single_user_shuffle(spark):
    # daily collapse, calendar explode, fill join and both windows all
    # meet on ONE user_id hash partitioning; no range/cartesian blowup
    p = plan_of(spark, "events_gap_fill")
    assert "hashpartitioning(user_id" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p


def test_cohort_retention_no_range_join(spark):
    p = plan_of(spark, "events_cohort_retention")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert p.count("HashAggregate") >= 2  # partial + final


def test_dq_profile_is_single_scan(spark):
    # profiling all columns must cost ONE table scan (tree + detail
    # sections each name the node once → max 2 mentions)
    p = plan_of(spark, "dq_profile")
    assert p.count("Scan parquet") <= 2
    assert "Expand" in p  # multi-count-distinct expansion, map-side


def test_frame_sample_is_arrow_batched(spark):
    p = plan_of(spark, "multimodal_frame_sample")
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p


def test_sample_temperature_broadcasts_rates(spark):
    # per-stratum rates are a handful of rows: the corpus-side join must
    # broadcast them, never shuffle the documents on lang
    p = plan_of(spark, "sample_temperature")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_dataset_shuffle_prunes_to_id(spark):
    # shuffle key derives from doc_id only — the scan must not read text
    p = plan_of(spark, "dataset_shuffle")
    read_schema = next(line for line in p.splitlines() if "ReadSchema" in line)
    assert "text" not in read_schema
    assert "doc_id" in read_schema
    # global order comes from a range-partitioned sort, not a single task
    assert "rangepartitioning" in p.lower()
    assert "BatchEvalPython" not in p


def test_gopher_quality_keyed_shuffles_only(spark):
    # two n-gram aggregations + joins, all keyed by doc_id / (doc_id, g):
    # no cartesian pair space, no Python in the plan
    p = plan_of(spark, "text_gopher_quality")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p
    assert p.count("HashAggregate") >= 4  # partial+final per n-gram stage


def test_embedding_quantize_single_scan_no_python(spark):
    p = plan_of(spark, "embedding_quantize")
    assert p.count("Scan parquet") <= 2  # tree + detail sections
    assert "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p


def test_embedding_quantize_abs_max_hoisted(spark):
    # abs_max must be a projection column, never re-evaluated inside the
    # per-element quantization lambda: higher-order functions run their
    # lambda tree once PER ELEMENT with no loop-invariant hoisting, so an
    # inlined array_max makes the op O(dim^2) per row (measured 88 s vs
    # 0.2 s at 80k vectors, dim 64)
    import re

    from roar_spark.operators.similarity import embedding_quantize
    from roar_spark.catalog import sf_dir

    df = embedding_quantize(spark, sf_dir())
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # Same-line match ('.' stops at newline): a regressed plan inlines
    # array_max INSIDE the lambdafunction(...) printout on one plan line,
    # while the hoisted _abs_max projection prints on its own line. The
    # earlier [^)]* form stopped at the lambda's first ')' and could never
    # match (ADVICE r2) — verified this form fails on a hand-inlined plan.
    assert not re.search(r"lambdafunction\(.*array_max", optimized)


def test_registry_outputs_are_driver_hashable(spark):
    # The driver's canonicalizer sorts result rows via pandas; list/struct/
    # map cells are unhashable there and crash the whole correctness row
    # (r2: embedding_quantize `err`). Every registry query must therefore
    # emit only atomic top-level columns — arrays get serialized (CSV
    # string) before leaving the operator.
    from pyspark.sql.types import ArrayType, MapType, StructType

    from roar_spark.catalog import sf_dir
    from roar_spark.registry import QUERIES

    offenders = []
    for name, fn in QUERIES.items():
        schema = fn(spark, sf_dir()).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, f"non-hashable driver outputs: {offenders}"


def test_range_join_is_bin_bucketed(spark):
    # the interval join must be an equi-join on the minute bin (probe side
    # exploded to 2 bins), never a nested-loop over the t-range predicate
    p = plan_of(spark, "events_range_join")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Generate" in p


def test_pii_scrub_map_only_no_python(spark):
    # redaction is a pure projection: one scan, no exchange before the
    # final sort, nothing leaves the JVM
    p = plan_of(spark, "text_pii_scrub")
    assert "BatchEvalPython" not in p and "FlatMapGroupsInPandas" not in p
    assert p.count("Scan parquet") <= 2  # tree + detail sections
    assert "HashAggregate" not in p


def test_dup_ngrams_keyed_shuffles_only(spark):
    # df computation + join back are keyed by shingle / doc_id — no pair
    # explosion, no Python
    p = plan_of(spark, "text_dup_ngrams")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p


def test_pack_sequences_sharded_window(spark):
    # the running offset must be partitioned by source (parallel across
    # shards), never a global single-partition window
    p = plan_of(spark, "pack_sequences")
    assert "hashpartitioning(source" in p
    assert "SinglePartition" not in p
    assert "BatchEvalPython" not in p


def test_events_anomaly_preagg_before_window(spark):
    # the hourly aggregation must run BEFORE the trailing window (two
    # HashAggregate levels = partial+final), bounding the window's input to
    # |event_types| x |hours| rows regardless of raw event volume; the
    # window itself must not trigger Python or a nested loop
    p = plan_of(spark, "events_anomaly")
    assert "HashAggregate" in p and "Window" in p
    assert p.index("HashAggregate") > p.index("Window")  # formatted plan is top-down: agg feeds window
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_text_chunk_plan_is_map_only(spark):
    """The chunk fan-out must stay a map-side generate: no exchange before
    the display sort, no Python, and the scan reads only what it needs."""
    plan = plan_of(spark, "text_chunk")
    assert "Generate" in plan  # sequence+explode, not a join against an index table
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only partitioning in the plan is the rangepartitioning of the
    # final orderBy — no hash shuffle anywhere in the chunk logic
    assert "hashpartitioning" not in plan
    assert "rangepartitioning(doc_id" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "lang" not in read_schema and "source" not in read_schema


def test_centroids_aggregate_partially_before_shuffle(spark):
    """posexplode fan-out must collapse map-side: partial+final HashAggregate
    around a single (label, dim)-keyed exchange, all JVM-side."""
    plan = plan_of(spark, "embedding_label_centroids")
    assert plan.count("HashAggregate") >= 2
    assert "hashpartitioning(label" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dau_wau_has_no_nested_loop(spark):
    # rolling-distinct via sequence+explode fan-out: the equivalent
    # date-range join is a BroadcastNestedLoopJoin evaluating
    # |days| x |day,user| predicates — must never come back
    plan = plan_of(spark, "events_dau_wau")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gopher_gram_aggs_are_partial_agg_shuffles(spark):
    """Pin gopher's measured-best shape (SCALE.md records the three
    losing alternatives at 1 M docs): explode → partial-aggregated
    (doc_id, gram) shuffles, no cartesian/nested-loop join, no Python.
    The gram aggregations must keep map-side partial aggregation — that
    collapse is what bounds the shuffle at ~distinct-grams-per-doc."""
    plan = plan_of(spark, "text_gopher_quality")
    assert "HashAggregate" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shuffle_width_for_clamps(spark):
    """Width math: never below the base, never above 64x base, ceil-divided
    by ROWS_PER_SHUFFLE_TASK in between."""
    from roar_spark.session import ROWS_PER_SHUFFLE_TASK, shuffle_width_for

    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert shuffle_width_for(base, 1) == base
    assert shuffle_width_for(base, 10 * ROWS_PER_SHUFFLE_TASK) == max(base, 10)
    assert shuffle_width_for(base, 10**15) == 64 * base


def test_tuned_session_isolates_width_per_query(spark):
    """r5 VERDICT task 2 + ADVICE: shuffle-width tuning must be per-query,
    not session-global. A large tuned build returns a CLONE carrying the
    wide AQE initialPartitionNum; the caller's session is never mutated,
    so a small query built before OR after on the original session starts
    at the base width, and the tuned plan keeps its width at execution no
    matter what runs in between."""
    from roar_spark.session import tuned_session

    key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # small volume: same session back — zero overhead at driver SFs
    assert tuned_session(spark, 1) is spark

    # runtime conf set by the host must survive into the clone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    big = tuned_session(spark, 10**12)
    try:
        assert big is not spark
        # clone carries the tuned width...
        assert int(big.conf.get(key)) == 64 * base
        # ...the parent session is untouched (small-after-big leak dead):
        assert spark.conf.get(key, None) in (None, str(base))
        # ...and the clone inherited the parent's runtime conf
        assert big.conf.get("spark.sql.session.timeZone") == "UTC"
        # composition: same corpus volume on the already-tuned session
        # reuses it (dedup_clusters -> dedup_ngram_jaccard single-session)
        assert tuned_session(big, 10**12) is big
        # a query built on the clone executes (shared SparkContext) and
        # the parent keeps running at base width concurrently
        got = big.range(100).selectExpr("id % 3 as g").groupBy("g").count().collect()
        assert sorted(r.g for r in got) == [0, 1, 2]
        assert spark.range(10).count() == 10
    finally:
        # newSession shares the context; nothing to stop — drop the ref
        del big


def test_session_confs_fallback_warns_once():
    """When the private SessionState API drifts, _session_confs degrades to
    the redacting SET enumeration — and must SAY so, once per process, so a
    secret-bearing conf copied as '*(redacted)' onto a tuned clone is
    traceable to the drift instead of failing invisibly at 4M-doc scale
    (r6 ADVICE). Pure test: a fake session whose JVM handle raises."""
    import warnings

    from roar_spark import session as sess

    class _Row:
        key, value = "k", "v"

    class _FakeDF:
        def collect(self):
            return [_Row()]

    class _FakeSpark:
        @property
        def _jsparkSession(self):
            raise AttributeError("API drift")

        def sql(self, q):
            return _FakeDF()

    old_flag = sess._warned_redacting_fallback
    sess._warned_redacting_fallback = False
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = sess._session_confs(_FakeSpark())
            assert out == [("k", "v")]
            # second call: degraded result again, but NO second warning
            sess._session_confs(_FakeSpark())
        hits = [w for w in caught if "redaction" in str(w.message)]
        assert len(hits) == 1 and issubclass(hits[0].category, RuntimeWarning)
    finally:
        sess._warned_redacting_fallback = old_flag


def test_spread_row_floor_skips_small_embeddings(spark):
    """The embeddings consumers pass an int spread floor (20k rows): at
    driver SFs the table is far smaller, so the plan must contain NO
    round-robin repartition — the exchange measurably loses there (while
    a bool spread on the 5k-doc documents table still fires for the
    heavy-per-row text ops, which measurably win)."""
    plan = plan_of(spark, "sim_brute_topk")
    assert "RoundRobinPartitioning" not in plan
    plan = plan_of(spark, "ann_lsh_topk")
    assert "RoundRobinPartitioning" not in plan


def test_funnel_shuffles_events_once(spark):
    """events_funnel (r9 rewrite): three chained conditional window-mins
    over ONE user_id hash partitioning instead of three event-table
    self-joins — the plan must contain no join at all and exactly two
    exchanges (the user_id hash + the output orderBy's range), with the
    three Window operators stacked on the same partitioning."""
    import re

    plan = plan_of(spark, "events_funnel")
    assert "SortMergeJoin" not in plan and "Join" not in plan
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\n\(\d+\) Window", plan)) == 3


def test_ann_rerank_join_broadcasts_candidates(spark):
    """The ANN rerank join's small side is the CANDIDATE set by
    construction (probe fan x bucket occupancy), but table stats cannot
    see that: above the auto-broadcast threshold the stats-based planner
    fell back to a sort-merge join that shuffle-wrote the ENTIRE
    embeddings table (16 GB at 64M rows — r9 probe, ~470 MB/s sustained
    writes, 2.9x-at-2x growth). The explicit broadcast hint must
    therefore carry the plan on its own: with stats-based broadcasting
    disabled entirely, neither ANN plan may contain a SortMergeJoin."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ("ann_lsh_topk", "ann_ivf_topk"):
            plan = plan_of(spark, name)
            assert "SortMergeJoin" not in plan, f"{name} rerank fell back to SMJ"
            assert "BroadcastHashJoin" in plan, name
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_spread_zero_floor_means_always_spread(spark):
    """ADVICE r5: spread=0 is an int floor of 0 ('no row floor — always
    spread'), not falsy-False. A single-row-group table below every other
    floor must still get the round-robin repartition under spread=0."""
    from roar_spark.catalog import load_table

    df = load_table(spark, "documents", "/root/testdata/sf0.001", spread=0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "RoundRobinPartitioning" in buf.getvalue()


def test_salted_topk_equals_plain_window(spark):
    """operators/ranks.py: the salted two-phase top-k must return the SAME
    rows and rank numbers as the single group-keyed window, on a skewed
    input (one giant group, several tiny ones, rank ties broken by the
    unique id) — the losslessness proof exercised, not just asserted."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from roar_spark.operators.ranks import salted_topk

    df = spark.range(20000).select(
        F.when(F.col("id") < 19000, F.lit("big"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 7).cast("string")))
        .alias("grp"),
        F.col("id"),
        # heavy ties: only 5 distinct scores, so the unique-id tiebreak
        # carries the total order
        (F.col("id") % 5).alias("score"),
    )
    order = [F.desc("score"), F.asc("id")]
    plain = (
        df.withColumn("rk", F.row_number().over(W.partitionBy("grp").orderBy(*order)))
        .filter(F.col("rk") <= 4)
        .collect()
    )
    salted = salted_topk(df, ["grp"], order, 4, "rk", "id").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    assert len(plain) == 8 * 4  # big + 7 tiny groups, 4 rows each


def test_distributed_ntile_equals_plain_ntile(spark, tmp_path):
    """window_ntile's two-level rank + NTile arithmetic must equal
    ntile(4) OVER the single segment window on every group-size regime:
    n % 4 == 0, n % 4 != 0, n < 4, heavy balance ties (rank buckets
    collapse onto few values), and NULL balances (must rank LAST like the
    native window's DESC NULLS LAST — r8 review: the bare negation left
    NULL as NULL, which the bucketed rank placed FIRST)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from roar_spark.operators.relational_ext import _scaled, window_ntile

    rows = []
    ck = 0
    for seg, n in (("A", 16), ("B", 13), ("C", 3), ("D", 1), ("E", 7)):
        for i in range(n):
            ck += 1
            # ties: only 3 distinct balances per segment, incl. negatives;
            # every 5th row has a NULL balance (DESC NULLS LAST regime)
            bal = None if i % 5 == 4 else float([-55.25, 0.0, 9999.99][i % 3])
            rows.append((ck, seg, bal))
    d = tmp_path / "cust"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
                "c_name": pa.array([f"c{r[0]}" for r in rows]),
                "c_mktsegment": pa.array([r[1] for r in rows]),
                "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
                "c_nationkey": pa.array([0] * len(rows), pa.int64()),
            }
        ),
        str(d / "customer.parquet"),
    )
    got = sorted(map(tuple, window_ntile(spark, str(d)).collect()))
    cust = spark.read.parquet(str(d / "customer.parquet"))
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    plain = sorted(
        map(
            tuple,
            cust.select(
                "c_mktsegment",
                _scaled(F.col("c_acctbal")).alias("bal_c"),
                F.ntile(4).over(w).cast("long").alias("quartile"),
            )
            .groupBy("c_mktsegment", "quartile")
            .agg(
                F.count(F.lit(1)).alias("n_customers"),
                (F.sum("bal_c") / F.lit(100.0)).alias("total_balance"),
            )
            .collect(),
        )
    )
    assert got == plain


def test_bucketed_global_rank_equals_plain_window(spark):
    """operators/ranks.py bucketed_global_rank: rank values and group
    counts must equal row_number()/count() OVER the plain group window —
    exercised on data with heavy value ties, negative values, values
    straddling bucket boundaries, and a tiny bucket width that forces
    many buckets."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from roar_spark.operators.ranks import bucketed_global_rank

    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").alias("tid"),
        # ties + negatives + boundary-straddling values, bucket width 7
        ((F.col("id") * 37) % 50 - 25).alias("val"),
    )
    got = bucketed_global_rank(df, ["grp"], "val", "tid", 7).collect()
    w = W.partitionBy("grp").orderBy(F.asc("val"), F.asc("tid"))
    plain = df.select(
        "grp",
        "tid",
        "val",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).cast("long").alias("n"),
    ).collect()
    key = lambda r: (r.grp, r.tid)  # noqa: E731
    gm = {key(r): (r.rn, r.n) for r in got}
    pm = {key(r): (r.rn, r.n) for r in plain}
    assert gm == pm and len(gm) == 5000


def test_bucketed_global_rank_null_values_and_groups(spark):
    """r7 review contract fixes: NULL values must rank FIRST (Spark's ASC
    NULLS FIRST), not silently vanish while still being counted; NULL
    group keys must keep forming their own group through the null-safe
    offsets join; reserved internal names must raise."""
    import pytest as _pytest

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from roar_spark.operators.ranks import bucketed_global_rank

    rows = [
        ("a", 1, 5),
        ("a", 2, None),
        ("a", 3, 7),
        (None, 4, 9),
        (None, 5, None),
    ]
    df = spark.createDataFrame(rows, "grp string, tid long, val long")
    got = bucketed_global_rank(df, ["grp"], "val", "tid", 7).collect()
    w = W.partitionBy("grp").orderBy(F.asc("val"), F.asc("tid"))
    plain = df.select(
        "grp",
        "tid",
        "val",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).cast("long").alias("n"),
    ).collect()
    gm = {r.tid: (r.grp, r.val, r.rn, r.n) for r in got}
    pm = {r.tid: (r.grp, r.val, r.rn, r.n) for r in plain}
    assert gm == pm and len(gm) == 5  # every row present, NULLs rank first

    with _pytest.raises(ValueError, match="collide"):
        bucketed_global_rank(df.withColumn("_bkt", F.lit(1)), ["grp"], "val", "tid", 7)
    with _pytest.raises(ValueError, match="collide"):
        bucketed_global_rank(df.withColumn("n", F.lit(1)), ["grp"], "val", "tid", 7)
