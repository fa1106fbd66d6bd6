"""funnel.log_rank_test: hand-checked two-cohort example, censoring
semantics shared with kaplan_meier, degenerate one-group NULL."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from redshift_etl_spark.operators.funnel import log_rank_test


def _rows():
    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    # g1: user 1 events day 1, user 3 censored (day 2 at censor_ts)
    # g0: user 2 events day 1, user 4 events day 2
    return [
        (1, t(1), "view"), (1, t(2), "purchase"),
        (3, t(1), "view"),
        (2, t(1), "view"), (2, t(2), "purchase"),
        (4, t(1), "view"), (4, t(3), "purchase"),
    ]


def test_logrank_hand_check(spark):
    df = spark.createDataFrame(
        _rows(), "user_id long, ts timestamp, event_type string"
    )
    out = log_rank_test(
        df, "user_id", "ts", F.col("event_type") == "purchase",
        "2024-01-03 00:00:00", F.col("user_id") % 2,
    ).first()
    assert (out["n_g1"], out["n_g2"]) == (2, 2)
    assert (out["events_g1"], out["events_g2"]) == (1, 2)
    # day 1: d=2, n1=n2=2 -> e1=1, v=1/3; day 2: d=1, n1=n2=1 ->
    # e1=0.5, v=0.25 (nano-fixed: 333333333 + 250000000)
    assert out["o_minus_e"] == -0.5
    assert out["var_sum"] == 0.583333333
    assert math.isclose(out["z"], -0.5 / math.sqrt(0.583333333))
    assert math.isclose(out["chi2"], out["z"] ** 2)


def test_logrank_one_group_is_null(spark):
    df = spark.createDataFrame(
        [(2, datetime(2024, 1, 1), "view"),
         (2, datetime(2024, 1, 2), "purchase"),
         (4, datetime(2024, 1, 1), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    out = log_rank_test(
        df, "user_id", "ts", F.col("event_type") == "purchase",
        "2024-01-03 00:00:00", F.col("user_id") % 2,
    ).first()
    assert out["n_g1"] == 0 and out["n_g2"] == 2
    assert out["var_sum"] == 0.0
    assert out["z"] is None and out["chi2"] is None


def test_logrank_identical_cohorts_z_zero(spark):
    t = lambda d: datetime(2024, 1, d)  # noqa: E731
    rows = []
    # two users per cohort with mirrored histories (event day 1 and
    # day 2 in each) — day 1 carries variance (n=4, d=2), day 2 is a
    # d=n tie with zero variance, and O−E folds to exactly 0
    for u in (1, 2):
        rows += [(u, t(1), "view"), (u, t(2), "purchase")]
    for u in (3, 4):
        rows += [(u, t(1), "view"), (u, t(3), "purchase")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = log_rank_test(
        df, "user_id", "ts", F.col("event_type") == "purchase",
        "2024-01-05 00:00:00", F.col("user_id") % 2,
    ).first()
    assert out["o_minus_e"] == 0.0 and out["z"] == 0.0
