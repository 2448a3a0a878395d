"""Driver-contract invariants for __spark_entry__ (the surface the external
checker consumes): registry/oracle key consistency and the untested-first
rotation (r3) that steers sampling toward queries without a green row."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_every_oracle_has_a_query_and_orders_match():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # oracle iteration order mirrors queries() so driver sampling sees the
    # same rotation in both maps
    assert [k for k in q if k in o] == list(o)


def test_rotation_puts_unverified_queries_first():
    q = list(entry_mod.queries())
    green = entry_mod._DRIVER_GREEN
    n_front = sum(1 for k in q if k not in green)
    assert q[:n_front] == [k for k in q if k not in green]
    # the green set never names queries that left the registry
    assert green <= set(q)


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert len(df.columns) >= 2
    assert df.count() > 0
