"""Bucketing: the write-time answer to the one big shuffle in the corpus
(orders⋈lineitem on orderkey). SCALE.md documents it as the 100 TB path;
this test pins that a join between tables bucketed on the join key plans
WITHOUT a shuffle exchange — co-located partitions meet directly."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from roar_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_avoids_shuffle(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, "orders", SF).write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, "lineitem", SF).write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    try:
        # force the sort-merge path (broadcast would hide the point)
        joined = (
            spark.table("b_lineitem")
            .hint("merge")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # the join inputs read bucketed scans — no Exchange below the join
        assert "Exchange" not in join_section, join_section
        # and it computes the right thing
        n_total = sum(r.n for r in joined.collect())
        assert n_total == load_table(spark, "lineitem", SF).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_catalog_mode_end_to_end(spark):
    """The opt-in catalog mode, not just a hand-built demo: after
    enable_bucketed_catalog, load_table transparently serves the bucketed
    managed copies, an orderkey merge-join plans with no exchange below
    the join, and a real registry query returns identical results in both
    modes."""
    from roar_spark.catalog import (
        disable_bucketed_catalog,
        enable_bucketed_catalog,
    )
    from roar_spark.operators.relational import q12_shipmode_priority

    plain = q12_shipmode_priority(spark, SF).collect()
    enable_bucketed_catalog(spark, SF)
    try:
        joined = (
            load_table(spark, "lineitem", SF)
            .hint("merge")
            .join(
                load_table(spark, "orders", SF),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        bucketed = q12_shipmode_priority(spark, SF).collect()
        assert plain == bucketed
    finally:
        disable_bucketed_catalog()


def test_cli_bucketed_materialize_end_to_end(spark, tmp_path):
    """The opt-in mode through its user surface: `materialize --bucketed`
    builds (once) and queries orderkey-bucketed managed copies from the
    CLI, results are identical to plain mode, and the bucketed q18 plan
    carries NO shuffle exchange at all — the groupBy(l_orderkey) /
    orders⋈lineitem shuffle the mode exists to remove — while the plain
    plan has one."""
    from roar_spark.catalog import (
        disable_bucketed_catalog,
        enable_bucketed_catalog,
    )
    from roar_spark.cli import main
    from roar_spark.operators.tpch_ext import q18_large_orders

    def shuffle_exchanges(df) -> list[str]:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return [
            line
            for line in buf.getvalue().splitlines()
            if "Exchange" in line and "BroadcastExchange" not in line
        ]

    assert shuffle_exchanges(
        q18_large_orders(spark, SF)
    ), "plain q18 should shuffle on orderkey — contrast baseline"
    enable_bucketed_catalog(spark, SF)
    try:
        assert not shuffle_exchanges(q18_large_orders(spark, SF))
    finally:
        disable_bucketed_catalog()

    out_b, out_p = tmp_path / "bucketed", tmp_path / "plain"
    for out, extra in ((out_b, ["--bucketed"]), (out_p, [])):
        rc = main(
            [
                "materialize", "--query-name", "q18_large_orders",
                "--dir", SF, "--key", "o_orderkey", "--out", str(out),
            ]
            + extra
        )
        assert rc == 0
    read = lambda p: sorted(  # noqa: E731
        map(str, spark.read.parquet(str(p)).drop("shard").collect())
    )
    assert read(out_b) == read(out_p)
    # the command-scoped mode must not leak into the in-process session
    from roar_spark.catalog import _bucketed_tables

    assert not _bucketed_tables
