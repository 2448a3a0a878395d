"""The bench regression gate must actually trip (VERDICT r2 item 6: a gate
that can never fire is decoration). Pure logic test — no Spark."""

from __future__ import annotations

import bench


def test_gate_trips_on_deliberate_slowdown():
    budgets = dict(bench.BUDGETS_SF01)
    # every headline query at exactly budget: clean
    assert bench.find_regressions(dict(budgets), budgets) == []
    # the slowest query 2x over (above both the 1.5x and +3s arms): trips
    slow = dict(budgets)
    worst = max(budgets, key=budgets.get)
    slow[worst] = max(budgets[worst] * 2.0, budgets[worst] + 3.5)
    hits = bench.find_regressions(slow, budgets)
    assert len(hits) == 1 and hits[0].startswith(worst)


def test_gate_tolerates_session_noise_on_subsecond_queries():
    budgets = dict(bench.BUDGETS_SF01)
    # +2.5s of host noise on a sub-second query stays inside the +3s arm
    noisy = dict(budgets)
    fastest = min(budgets, key=budgets.get)
    noisy[fastest] = budgets[fastest] + 2.5
    assert bench.find_regressions(noisy, budgets) == []


def test_budgets_cover_every_headline_query():
    assert set(bench.HEADLINE) == set(bench.BUDGETS_SF01)
