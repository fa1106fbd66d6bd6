"""Driver-window rotation: brand-new queries (no driver row at all) run
just AHEAD of the oldest verified cohort (r11 verdict item 2 — the r10
defer-behind policy existed only to drain the overdue r05 backlog,
which is complete); red rows and must-run names still jump to the
absolute head."""

from __future__ import annotations

from redshift_etl_spark import queries as Q


def test_new_query_runs_ahead_of_oldest_cohort():
    oldest = min(Q._LAST_GREEN.values())
    assert Q._tier("a_brand_new_query_name") == oldest - 0.5
    # every verified query keeps its recorded tier
    some = next(iter(Q._LAST_GREEN))
    assert Q._tier(some) == float(Q._LAST_GREEN[some])


def test_red_row_is_urgent_head():
    # simulate: seen by the driver but never green
    name = "synthetic_red_query"
    assert name not in Q._LAST_GREEN
    old = Q._SEEN_ANY
    Q._SEEN_ANY = frozenset(old | {name})
    try:
        assert Q._tier(name) == 0.0
        # and a red row outranks a brand-new query
        assert Q._tier(name) < Q._tier("a_brand_new_query_name")
    finally:
        Q._SEEN_ANY = old


def test_window_head_is_never_driver_checked_then_oldest_cohort():
    """The next driver window (~50 slots) must open with every query
    that has NO driver row yet, then fill with the oldest green
    cohort."""
    names = list(Q.all_queries())
    new = [n for n in names if n not in Q._LAST_GREEN]
    oldest = min(Q._LAST_GREEN.values())
    head = names[: len(new)]
    assert set(head) == set(new), (
        "a verified query displaced a never-driver-checked one from the head"
    )
    rest = names[len(new) : 50]
    assert all(Q._LAST_GREEN.get(n) == oldest for n in rest), (
        "a non-oldest query displaced the oldest cohort from the window"
    )


def test_no_green_rows_state_keeps_red_ahead_of_new():
    """Degenerate driver state (rows ran, none green): brand-new must
    still sort BEHIND red rows (r12 self-review: a 0-anchored tier put
    new queries at -0.5, inverting the priority)."""
    old_green, old_seen = dict(Q._LAST_GREEN), Q._SEEN_ANY
    try:
        Q._LAST_GREEN.clear()
        Q._SEEN_ANY = frozenset({"some_red_query"})
        assert Q._tier("some_red_query") == 0.0
        assert Q._tier("a_brand_new_query") > Q._tier("some_red_query")
    finally:
        Q._LAST_GREEN.update(old_green)
        Q._SEEN_ANY = old_seen
