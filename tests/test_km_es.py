"""kaplan_meier / weighted_topk_sample (wave-11 r10) — hand-checked
survival accounting and the A-ES weighting property."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from redshift_etl_spark.operators.funnel import kaplan_meier
from redshift_etl_spark.operators.sampling import weighted_topk_sample


def test_km_hand_check(spark):
    # 4 users enter on day 0 (2024-01-01). u1 converts day 1,
    # u2 converts day 2, u3/u4 censored at 2024-01-04 (day 3).
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "view"), (1, datetime(2024, 1, 2), "purchase"),
        (2, t0, "view"), (2, datetime(2024, 1, 3), "purchase"),
        (3, t0, "view"),
        (4, t0, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, event_type: string")
    out = {
        r["day"]: r
        for r in kaplan_meier(
            df, "user_id", "ts", F.col("event_type") == "purchase",
            "2024-01-04 00:00:00",
        ).collect()
    }
    assert out[1]["n_at_risk"] == 4 and out[1]["n_events"] == 1
    assert out[2]["n_at_risk"] == 3 and out[2]["n_events"] == 1
    assert out[3]["n_at_risk"] == 2 and out[3]["n_censored"] == 2
    t1 = round(math.log(3 / 4) * 1e6)
    t2 = round(math.log(2 / 3) * 1e6)
    assert out[1]["ln_s_micro"] == t1
    assert out[2]["ln_s_micro"] == t1 + t2
    assert out[3]["ln_s_micro"] == t1 + t2  # censoring adds no term
    # identity: everyone leaves exactly once
    assert sum(r["n_events"] + r["n_censored"] for r in out.values()) == 4


def test_km_risk_set_empties_to_null(spark):
    # both users convert on the last day -> d = n -> S hits 0, NULL
    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, "view"), (1, datetime(2024, 1, 2), "purchase"),
        (2, t0, "view"), (2, datetime(2024, 1, 2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, event_type: string")
    out = kaplan_meier(
        df, "user_id", "ts", F.col("event_type") == "purchase",
        "2024-01-09 00:00:00",
    ).collect()
    assert len(out) == 1 and out[0]["ln_s_micro"] is None


def test_es_sample_exact_k_and_weight_monotone(spark):
    # weights 1 vs 1000: the heavy rows must dominate the sample
    rows = [(i, 1.0) for i in range(500)] + [(1000 + i, 1000.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id: long, w: double")
    got = weighted_topk_sample(df, "id", F.col("w"), k=40).collect()
    assert len(got) == 40
    heavy = sum(1 for r in got if r["id"] >= 1000)
    assert heavy >= 30  # ~all heavy rows selected, light ones rare
    # zero/negative weights are never sampled
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "id: long, w: double"
    )
    got2 = weighted_topk_sample(df2, "id", F.col("w"), k=3).collect()
    assert [r["id"] for r in got2] == [3]
