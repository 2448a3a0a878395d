"""Pins for __spark_entry__'s driver-sample rotation.

The r9 verdict flagged the hand-curated _DRIVER_GREEN as stale (r6–r9
greens kept re-spending driver samples); the set is now COMPUTED from the
CORRECTNESS_r*.json files the driver writes into the repo. These pins
keep the computation honest without a Spark session.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry
from roar_spark.registry import ORACLES, QUERIES

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_green_set_contains_every_recorded_hash_match():
    """Rule-change guard: anything any round hash-matched must be green —
    a parse or rule bug that silently empties the set would push already-
    proven queries back to the front and waste the sampling budget."""
    recorded = set()
    for fname in sorted(os.listdir(HERE)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        with open(os.path.join(HERE, fname)) as fh:
            for name, row in json.load(fh).items():
                if isinstance(row, dict) and row.get("hash_match") is True:
                    recorded.add(name)
    assert recorded, "no CORRECTNESS files found next to __spark_entry__"
    assert recorded <= entry._DRIVER_GREEN


def test_green_set_covers_the_r5_curated_floor():
    # the old hand-curated list is a proven lower bound on the computed set
    assert entry._DRIVER_GREEN_R5_FLOOR <= entry._DRIVER_GREEN


def test_rows_only_green_requires_no_oracle_today():
    """A query that was rows-only in an old round but has since gained an
    oracle must NOT count as green on the strength of the old rows-only
    row (the ann_lsh_topk r2→r3 pattern): it needs a hash-match."""
    hash_matched = set()
    rows_only = set()
    for fname in sorted(os.listdir(HERE)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        with open(os.path.join(HERE, fname)) as fh:
            for name, row in json.load(fh).items():
                if not isinstance(row, dict):
                    continue
                if row.get("hash_match") is True:
                    hash_matched.add(name)
                elif row.get("err") == "no_oracle":
                    rows_only.add(name)
    for name in rows_only - hash_matched:
        if name in ORACLES:
            assert name not in entry._DRIVER_GREEN, name


def test_every_green_query_sorts_behind_every_never_sampled_one():
    """The ordering contract the rotation exists for: the driver samples
    queries() in dict order, so never-green queries must ALL precede
    green ones."""
    order = list(entry.queries())
    assert set(order) == set(QUERIES)
    greens = [name in entry._DRIVER_GREEN for name in order]
    first_green = greens.index(True) if True in greens else len(order)
    assert all(greens[first_green:]), (
        "a non-green query sorts behind a green one: "
        f"{[n for n, g in zip(order[first_green:], greens[first_green:]) if not g]}"
    )


def test_oracle_sql_order_matches_queries_order():
    qorder = [k for k in entry.queries() if k in ORACLES]
    assert list(entry.oracle_sql()) == qorder


def test_touched_queries_front_run_settled_greens():
    """r12: queries whose engine code changed this round re-enter the
    driver sample ahead of settled greens (verdict r11 item 3), but never
    ahead of a never-green query."""
    order = list(entry.queries())
    settled = [
        n
        for n in order
        if n in entry._DRIVER_GREEN and n not in entry._TOUCHED_THIS_ROUND
    ]
    first_settled = order.index(settled[0])
    for name in entry._TOUCHED_THIS_ROUND & entry._DRIVER_GREEN:
        assert order.index(name) < first_settled, name
    # every touched name must exist in the registry (a typo here would
    # silently waste the re-verify slot)
    assert entry._TOUCHED_THIS_ROUND <= set(QUERIES)
