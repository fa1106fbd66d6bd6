"""asof_join operator: inclusive vs strict, missing matches, per-key
isolation."""

from __future__ import annotations

import pytest

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


def test_nearest_join_picks_closer_side_and_tie_goes_back(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.asof import asof_nearest_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [
            ("k", 1, T("2024-01-01 10:00:00")),  # back at 9:59, fwd 10:03
            ("k", 2, T("2024-01-01 10:05:00")),  # equidistant 10:03/10:07
            ("k", 3, T("2024-01-01 09:00:00")),  # before all -> fwd only
            ("q", 4, T("2024-01-01 00:00:00")),  # key with no right rows
        ],
        "kk string, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", 100, T("2024-01-01 09:59:00")),
            ("k", 101, T("2024-01-01 10:03:00")),
            ("k", 102, T("2024-01-01 10:07:00")),
        ],
        "kk string, rid long, rts timestamp",
    )
    out = {
        r["lid"]: r.asDict()
        for r in asof_nearest_join(
            left, right, "kk", "ts", "rts", ["rid"]
        ).collect()
    }
    assert out[1]["rid"] == 100  # 1 min back beats 3 min fwd
    assert out[2]["rid"] == 101  # 2 min either way -> backward wins
    assert out[3]["rid"] == 100  # nothing before -> nearest forward
    assert out[4]["rid"] is None and out[4]["matched_time"] is None


def test_nearest_equal_time_is_distance_zero_backward(spark):
    import datetime as dt

    from redshift_etl_spark.operators.asof import asof_nearest_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [("k", 1, T("2024-01-01 10:00:00"))], "kk string, lid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("k", 100, T("2024-01-01 10:00:00")),
            ("k", 101, T("2024-01-01 10:00:01")),
        ],
        "kk string, rid long, rts timestamp",
    )
    r = asof_nearest_join(left, right, "kk", "ts", "rts", ["rid"]).collect()[0]
    assert r["rid"] == 100


@pytest.mark.slow
def test_nearest_join_partition_invariance(spark):
    import datetime as dt

    from redshift_etl_spark.operators.asof import asof_nearest_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (f"k{i % 7}", i, base + dt.timedelta(minutes=i * 3))
            for i in range(100)
        ],
        "kk string, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (f"k{i % 7}", 1000 + i, base + dt.timedelta(minutes=i * 5 + 1))
            for i in range(60)
        ],
        "kk string, rid long, rts timestamp",
    )
    one = sorted(map(tuple, asof_nearest_join(
        left.coalesce(1), right.coalesce(1), "kk", "ts", "rts", ["rid"]
    ).collect()))
    many = sorted(map(tuple, asof_nearest_join(
        left.repartition(8), right.repartition(5), "kk", "ts", "rts", ["rid"]
    ).collect()))
    assert one == many


def test_tolerance_gates_stale_matches(spark):
    from datetime import datetime

    from redshift_etl_spark.operators.asof import asof_join

    t = lambda d, h: datetime(2024, 1, d, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(2, 12), "a"), (1, t(5, 12), "b"), (2, t(2, 12), "c")],
        "k: long, ts: timestamp, tag: string",
    )
    right = spark.createDataFrame(
        [(1, t(2, 11), 100), (2, t(1, 1), 200)],
        "k: long, rts: timestamp, v: long",
    )
    out = {
        r["tag"]: r["v"]
        for r in asof_join(
            left, right, "k", "ts", "rts", ["v"],
            tolerance="INTERVAL 1 DAY",
        ).collect()
    }
    assert out["a"] == 100      # 1h old: fresh
    assert out["b"] is None     # 3d old: match exists but stale -> NULL
    assert out["c"] is None     # 1d11h old: stale
    # without tolerance the same stale matches carry through
    out2 = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, "k", "ts", "rts", ["v"]).collect()
    }
    assert out2 == {"a": 100, "b": 100, "c": 200}


def test_tolerance_judges_matched_row_even_when_value_is_null(spark):
    """pandas merge_asof parity on NULL-valued right rows: the matched
    row is the newest preceding RIGHT ROW; its value is returned as-is
    (NULL included), and the tolerance gate judges THAT row's time —
    an old non-null value must not ride past a newer NULL row and pass
    the gate on the newer row's freshness (r10 ADVICE, asof.py)."""
    from datetime import datetime

    from redshift_etl_spark.operators.asof import asof_join

    t = lambda d, h=0: datetime(2024, 1, d, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "e")], "k: long, ts: timestamp, tag: string"
    )
    # old non-null value (day 1), newest right row (day 10 −1h) is NULL
    right = spark.createDataFrame(
        [(1, t(1), 100), (1, t(9, 23), None)],
        "k: long, rts: timestamp, v: long",
    )
    # no tolerance: matched row is the day-9,23h row -> its NULL value
    out = asof_join(spark.createDataFrame(
        [(1, t(10), "e")], "k: long, ts: timestamp, tag: string"
    ), right, "k", "ts", "rts", ["v"]).first()
    assert out["v"] is None
    # with tolerance: the matched (fresh) row's value is still NULL —
    # the stale day-1 value must NOT be resurrected by the fresh gate
    out = asof_join(
        left, right, "k", "ts", "rts", ["v"], tolerance="INTERVAL 1 DAY"
    ).first()
    assert out["v"] is None
