"""Driver-window rotation: brand-new queries defer just behind the
OLDEST verified cohort so they cannot displace stale-evidence refreshes
out of the driver's ~50-slot window (r10 verdict item 4); red rows and
must-run names still jump to the absolute head."""

from __future__ import annotations

from redshift_etl_spark import queries as Q


def test_new_query_defers_behind_oldest_cohort():
    oldest = min(Q._LAST_GREEN.values())
    assert Q._tier("a_brand_new_query_name") == oldest + 0.5
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
    finally:
        Q._SEEN_ANY = old


def test_current_head_is_the_oldest_stale_cohort():
    # after the r10 sweep the oldest cohort is r05 (50 queries); the
    # head of the window must be exactly queries at that tier until the
    # cohort is exhausted
    names = list(Q.all_queries())
    oldest = min(Q._LAST_GREEN.values())
    n_oldest = sum(1 for v in Q._LAST_GREEN.values() if v == oldest)
    head = names[:n_oldest]
    assert all(Q._LAST_GREEN.get(n) == oldest for n in head), (
        "a non-oldest query displaced the stale cohort from the head"
    )
