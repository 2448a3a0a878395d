"""As-of join semantics the corpus oracle can't exercise (its value
columns are never null): the carried match must be a WHOLE right row."""

from __future__ import annotations

from roar_spark.operators.asof import asof_join


def test_asof_carries_whole_row_not_stitched_columns(spark):
    """Right rows (t=1, price=10, size=NULL), (t=2, price=NULL, size=5):
    the as-of match at t=3 is the ENTIRE t=2 row (price NULL, size 5).
    Per-column last(ignorenulls) would synthesize (price=10, size=5) — a
    row that never existed — and diverge from the whole-row LATERAL
    ORDER BY … LIMIT 1 oracle."""
    left = spark.createDataFrame([(1, 3, 100)], "k int, t int, event int")
    right = spark.createDataFrame(
        [(1, 1, 10, None), (1, 2, None, 5)], "k int, t int, price int, size int"
    )
    out = asof_join(
        left, right, key="k", left_time="t", right_time="t",
        value_cols=["price", "size"], tiebreak="t",
    ).collect()
    assert len(out) == 1
    assert out[0].price is None and out[0].size == 5


def test_asof_unmatched_left_rows_keep_nulls(spark):
    left = spark.createDataFrame([(1, 0, 7)], "k int, t int, event int")
    right = spark.createDataFrame([(1, 5, 1, 1)], "k int, t int, price int, size int")
    out = asof_join(
        left, right, key="k", left_time="t", right_time="t",
        value_cols=["price", "size"], tiebreak="t",
    ).collect()
    assert out[0].price is None and out[0].size is None


def test_asof_join_null_times_and_keys_never_match(spark):
    """SQL three-valued logic: a right row with NULL time or NULL key can
    never satisfy right_time <= left_time / key = key, and NULL-key left
    rows match nothing (r8 review: NULL times sorted NULLS FIRST and were
    carried onto matchless left rows; NULL keys matched each other)."""
    from roar_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 5, 100), (1, 1, 101), (None, 5, 102)], "k int, t int, event int"
    )
    right = spark.createDataFrame(
        [(1, None, 9.0), (None, 3, 8.0), (1, 4, 7.0)], "k int, t int, price double"
    )
    out = {
        r.event: r.price
        for r in asof_join(left, right, "k", "t", "t", ["price"], "price").collect()
    }
    assert out[100] == 7.0  # real match: t=4 <= 5
    assert out[101] is None  # no right row at or before t=1 (NULL-t row ignored)
    assert out[102] is None  # NULL-key left row matches nothing
    # reserved internal names raise instead of silently clobbering
    import pytest as _p

    with _p.raises(ValueError, match="reserved"):
        asof_join(left.withColumnRenamed("event", "_t"), right, "k", "t", "t",
                  ["price"], "price")
