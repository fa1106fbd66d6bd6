"""Funnel analysis (operators/funnel.py) — in-order subsequence
semantics."""

from __future__ import annotations

import datetime as dt

from redshift_etl_spark.operators import funnel as FN

STEPS = ("view", "click", "purchase")


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, 0, s), i, t)
         for i, (u, s, t) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long, event_type string",
    )


def _depths(spark, rows):
    ev = _events(spark, rows)
    return {
        r["user_id"]: r["funnel_depth"]
        for r in FN.funnel_depth(
            ev, "user_id", "ts", "event_type", STEPS, ("event_id",)
        ).collect()
    }


def test_order_matters_not_presence(spark):
    got = _depths(
        spark,
        [
            # u1: full funnel with noise interleaved
            (1, 0, "view"), (1, 1, "error"), (1, 2, "click"),
            (1, 3, "signup"), (1, 4, "purchase"),
            # u2: purchase BEFORE the view→click — depth stops at 2
            (2, 0, "purchase"), (2, 1, "view"), (2, 2, "click"),
            # u3: click only, never viewed — depth 0
            (3, 0, "click"), (3, 1, "purchase"),
            # u4: no funnel events at all
            (4, 0, "error"),
        ],
    )
    assert got == {1: 3, 2: 2, 3: 0, 4: 0}


def test_repeated_steps_consume_once(spark):
    got = _depths(
        spark,
        [(1, 0, "view"), (1, 1, "view"), (1, 2, "click"), (1, 3, "click")],
    )
    assert got == {1: 2}


def test_same_timestamp_tiebreak_by_event_id(spark):
    # both events at t=0: event_id order makes view precede click
    got = _depths(spark, [(1, 0, "view"), (1, 0, "click")])
    assert got == {1: 2}


def test_retention_cohorts_fractions(spark):
    # cohort A (week of Jan 1): users 1,2 — user 1 returns week 1,
    # user 2 does not. cohort B (week of Jan 8): user 3 only.
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1)),   # Monday, cohort A week 0
            (2, dt.datetime(2024, 1, 3)),   # cohort A week 0
            (1, dt.datetime(2024, 1, 10)),  # cohort A week 1
            (3, dt.datetime(2024, 1, 8)),   # Monday, cohort B week 0
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r["cohort_week"].date().isoformat(), r["week_n"]):
            (r["n_active"], r["retention"])
        for r in FN.retention_cohorts(ev, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
    }


def test_transition_matrix_counts_and_rows(spark):
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 0, "a"),
            (1, dt.datetime(2024, 1, 1, 0, 0, 1), 1, "b"),
            (1, dt.datetime(2024, 1, 1, 0, 0, 2), 2, "a"),
            (2, dt.datetime(2024, 1, 1, 0, 0, 0), 3, "a"),
            (2, dt.datetime(2024, 1, 1, 0, 0, 1), 4, "a"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in FN.transition_matrix(
            ev, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    # user boundaries never produce cross-user transitions
    assert got == {
        ("a", "b"): (1, 0.5),
        ("b", "a"): (1, 1.0),
        ("a", "a"): (1, 0.5),
    }


def test_windowed_funnel_binds_earliest_and_enforces_window(spark):
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators import funnel as FU

    rows = [
        # u1: full funnel inside windows
        (1, 0.0, "view"), (1, 50.0, "click"), (1, 120.0, "purchase"),
        # u2: click too late (window 100)
        (2, 0.0, "view"), (2, 500.0, "click"),
        # u3: greedy earliest — the EARLY click binds, so the purchase
        # window starts there and the late purchase misses it
        (3, 0.0, "view"), (3, 10.0, "click"), (3, 90.0, "click"),
        (3, 150.0, "purchase"),
        # u4: no view at all — absent from output
        (4, 0.0, "click"), (4, 10.0, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["u", "t", "ty"])
    got = {
        r["u"]: r["funnel_depth"]
        for r in FU.windowed_funnel(
            df, "u", F.col("t"), "ty", ("view", "click", "purchase"), 100.0
        ).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2}
