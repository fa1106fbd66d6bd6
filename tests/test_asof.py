"""asof_join operator: inclusive vs strict, missing matches, per-key
isolation."""

from __future__ import annotations

from datetime import datetime

from redshift_etl_spark.operators.asof import asof_join


def _t(d):
    return datetime(2024, 1, d)


def test_asof_inclusive_and_strict(spark):
    left = spark.createDataFrame(
        [("k1", _t(5), "e1"), ("k1", _t(10), "e2"), ("k2", _t(5), "e3")],
        "k string, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [("k1", _t(5), 100.0), ("k1", _t(8), 200.0)],
        "k string, rts timestamp, price double",
    )
    inc = {
        r["ev"]: r["price"]
        for r in asof_join(
            left, right, "k", "ts", "rts", ["price"], inclusive=True
        ).collect()
    }
    assert inc == {"e1": 100.0, "e2": 200.0, "e3": None}

    strict = {
        r["ev"]: r["price"]
        for r in asof_join(
            left, right, "k", "ts", "rts", ["price"], inclusive=False
        ).collect()
    }
    # e1 at day 5: the day-5 right row is NOT visible strictly-before
    assert strict == {"e1": None, "e2": 200.0, "e3": None}


def test_asof_carries_latest_not_any(spark):
    left = spark.createDataFrame(
        [("k", _t(9), "e")], "k string, ts timestamp, ev string"
    )
    right = spark.createDataFrame(
        [("k", _t(1), 1.0), ("k", _t(8), 8.0), ("k", _t(12), 12.0)],
        "k string, rts timestamp, price double",
    )
    out = asof_join(left, right, "k", "ts", "rts", ["price"]).first()
    assert out["price"] == 8.0  # latest at-or-before, not first, not future
