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


def test_window_head_is_never_driver_checked_then_staleness_order():
    """The next driver window (~50 slots) must open with every query
    that has NO driver row yet, then fill in non-decreasing staleness
    tier — and no query left OUT of the window may be strictly staler
    than one that got in.

    r12 verdict item 1: the previous spelling asserted every post-head
    slot belongs to THE oldest cohort, which only holds while that
    cohort has >= 50-len(new) members. When a fresh driver artifact
    shrinks the oldest cohort below the window (the exact r12 state:
    r06 cohort at 28 rows, 0 new queries pending), `_prioritized`
    correctly back-fills from the next cohort and the old assertion
    tripped. The suite must be green against ANY driver state on disk,
    so assert only what the code promises."""
    names = list(Q.all_queries())
    new = [n for n in names if n not in Q._LAST_GREEN]
    head = names[: len(new)]
    assert set(head) == set(new), (
        "a verified query displaced a never-driver-checked one from the head"
    )
    window, omitted = names[:50], names[50:]
    tiers = [Q._tier(n) for n in window[len(new):]]
    assert tiers == sorted(tiers), (
        "window slots after the never-checked head are not in "
        "non-decreasing staleness order"
    )
    if window and omitted:
        assert max(Q._tier(n) for n in window) <= min(
            Q._tier(n) for n in omitted
        ), "an omitted query is strictly staler than an included one"


def test_window_backfills_next_cohort_when_oldest_is_small():
    """Regression pin for the exact r12 driver state: the oldest green
    cohort is SMALLER than the window and there are no brand-new
    queries, so the window must open with the full oldest cohort and
    back-fill from the next cohort — in that order."""
    old_green, old_seen = dict(Q._LAST_GREEN), Q._SEEN_ANY
    old_must = Q._MUST_RUN
    try:
        names = list(Q._merge("QUERIES"))
        assert len(names) > 50
        Q._MUST_RUN = frozenset()
        Q._LAST_GREEN.clear()
        # synthetic history: 28-query oldest cohort (tier 6), remainder
        # split across tiers 7 and 8 — every query has a green row.
        for i, n in enumerate(names):
            Q._LAST_GREEN[n] = 6 if i < 28 else (7 if i < 200 else 8)
        Q._SEEN_ANY = frozenset(names)
        window = list(Q.all_queries())[:50]
        assert [Q._tier(n) for n in window] == [6.0] * 28 + [7.0] * 22, (
            "window must be the whole oldest cohort then the next cohort"
        )
    finally:
        Q._LAST_GREEN.clear()
        Q._LAST_GREEN.update(old_green)
        Q._SEEN_ANY = old_seen
        Q._MUST_RUN = old_must


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
