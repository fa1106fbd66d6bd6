"""Rollup cascade + incremental maintenance (operators/rollup.py)."""

from __future__ import annotations

import datetime as dt

from redshift_etl_spark.operators import rollup as RU


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (t, dt.datetime(2024, 1, 1, hh, mm, ss), v)
            for t, hh, mm, ss, v in rows
        ],
        "event_type string, ts timestamp, value double",
    )


def test_apply_delta_empty_is_identity(spark):
    base = _events(spark, [("a", 0, 0, 10, 1.25), ("a", 0, 0, 40, 2.50)])
    stored = RU.finest_rollup(base, "ts", ["event_type"], "value")
    empty = base.filter("1=0")
    refreshed = RU.apply_delta(stored, empty, "ts", ["event_type"], "value")
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, stored.collect())
    )


def test_apply_delta_merges_and_inserts_buckets(spark):
    base = _events(spark, [("a", 0, 0, 10, 1.00), ("a", 0, 0, 40, 3.00)])
    delta = _events(spark, [("a", 0, 0, 55, 5.00), ("b", 0, 1, 0, 7.00)])
    stored = RU.finest_rollup(base, "ts", ["event_type"], "value")
    out = {
        (r["event_type"], r["bucket_ts"].minute): r
        for r in RU.finish_rollup(
            RU.apply_delta(stored, delta, "ts", ["event_type"], "value")
        ).collect()
    }
    touched = out[("a", 0)]
    assert touched["n_events"] == 3
    assert touched["sum_value"] == 9.0
    assert touched["min_value"] == 1.0 and touched["max_value"] == 5.0
    fresh = out[("b", 1)]
    assert fresh["n_events"] == 1 and fresh["sum_value"] == 7.0


def test_delta_refresh_equals_full_recompute(spark):
    base = _events(
        spark,
        [("a", h, m, s, float(h + m + s)) for h in (0, 1) for m in (0, 30)
         for s in (5, 10)],
    )
    delta = _events(spark, [("a", 0, 0, 7, 99.25), ("c", 2, 0, 0, 1.75)])
    stored = RU.finest_rollup(base, "ts", ["event_type"], "value")
    incr = RU.finish_rollup(
        RU.apply_delta(stored, delta, "ts", ["event_type"], "value")
    )
    full = RU.finish_rollup(
        RU.finest_rollup(
            base.unionByName(delta), "ts", ["event_type"], "value"
        )
    )
    assert sorted(map(tuple, incr.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_rollup_empty_frame(spark):
    empty = spark.createDataFrame(
        [], "event_type string, ts timestamp, value double"
    )
    assert RU.rollup_cascade(empty, "ts", ["event_type"], "value").count() == 0


def test_time_weighted_avg_weights_by_interval(spark):
    # value 10 held for 9s, value 1 held for 1s, last sample dropped:
    # TWA = (10·9000 + 1·1000)/10000 = 9.1 — a plain AVG would say 7.0
    ev = spark.createDataFrame(
        [
            (1, "g", dt.datetime(2024, 1, 1, 0, 0, 0), 0, 10.0),
            (1, "g", dt.datetime(2024, 1, 1, 0, 0, 9), 1, 1.0),
            (1, "g", dt.datetime(2024, 1, 1, 0, 0, 10), 2, 99.0),
        ],
        "user_id long, event_type string, ts timestamp, event_id long, "
        "value double",
    )
    out = RU.time_weighted_avg(
        ev, ["user_id", "event_type"], "ts", "value", "event_id"
    ).collect()
    assert len(out) == 1
    assert out[0]["time_weighted_avg"] == 9.1
    assert out[0]["n_intervals"] == 2


def test_time_weighted_avg_single_sample_drops_out(spark):
    ev = spark.createDataFrame(
        [(1, "g", dt.datetime(2024, 1, 1), 0, 5.0)],
        "user_id long, event_type string, ts timestamp, event_id long, "
        "value double",
    )
    assert (
        RU.time_weighted_avg(
            ev, ["user_id", "event_type"], "ts", "value", "event_id"
        ).count()
        == 0
    )


def test_peak_concurrency_sweep(spark):
    iv = spark.createDataFrame(
        [
            # three overlapping at 00:05; boundary pair at 00:10/00:10
            ("a", dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 10)),
            ("a", dt.datetime(2024, 1, 1, 0, 3), dt.datetime(2024, 1, 1, 0, 7)),
            ("a", dt.datetime(2024, 1, 1, 0, 5), dt.datetime(2024, 1, 1, 0, 6)),
            ("a", dt.datetime(2024, 1, 1, 0, 10), dt.datetime(2024, 1, 1, 0, 20)),
            ("b", dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 1)),
        ],
        "k string, s timestamp, e timestamp",
    )
    got = {
        r["k"]: (r["peak_concurrency"], r["peak_at"])
        for r in RU.peak_concurrency(iv, ["k"], "s", "e").collect()
    }
    assert got["a"] == (3, dt.datetime(2024, 1, 1, 0, 5))
    # the 00:10 end sorts before the 00:10 start — never 2 concurrent
    assert got["b"] == (1, dt.datetime(2024, 1, 1, 0, 0))


def test_interval_coverage_merges_overlaps_excludes_gaps(spark):
    iv = spark.createDataFrame(
        [
            # [0,10) and [5,15) merge → 15 min; gap; [20,25) → 5 min
            ("a", dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 0, 10)),
            ("a", dt.datetime(2024, 1, 1, 0, 5), dt.datetime(2024, 1, 1, 0, 15)),
            ("a", dt.datetime(2024, 1, 1, 0, 20), dt.datetime(2024, 1, 1, 0, 25)),
        ],
        "k string, s timestamp, e timestamp",
    )
    r = RU.interval_coverage(iv, ["k"], "s", "e").collect()[0]
    assert r["covered_us"] == 20 * 60 * 1_000_000
    assert r["span_us"] == 25 * 60 * 1_000_000


def test_linear_trend_recovers_known_slope(spark):
    # y = 2.5 + 0.5/min, exact on the grid → r2 == 1.0, slope exact
    ev = spark.createDataFrame(
        [("g", dt.datetime(2024, 1, 1, 0, m), 2.5 + 0.5 * m)
         for m in range(10)]
        + [("flat", dt.datetime(2024, 1, 1, 0, m), 7.0) for m in range(5)]
        + [("deg", dt.datetime(2024, 1, 1, 0, 0, s), 1.0 + s) for s in range(3)],
        "event_type string, ts timestamp, value double",
    )
    got = {
        r["event_type"]: r
        for r in RU.linear_trend(ev, ["event_type"], "ts", "value").collect()
    }
    g = got["g"]
    assert abs(g["slope_per_min"] - 0.5) < 1e-12
    assert abs(g["intercept"] - 2.5) < 1e-12
    assert abs(g["r2"] - 1.0) < 1e-12
    flat = got["flat"]  # zero variance in y → r2 NULL, slope 0
    assert flat["slope_per_min"] == 0.0 and flat["r2"] is None
    deg = got["deg"]  # all in one minute → varx == 0 → NULLs
    assert deg["slope_per_min"] is None and deg["r2"] is None


def test_sketch_distinct_rollup_error_bound_and_mergeability(spark):
    """HLL sketch rollup: (a) per-bucket estimates within the
    theoretical error bound of exact distinct counts; (b) union of
    stored daily sketches ≡ sketching the union — the property that
    makes stored rollups re-aggregable without rescanning raw."""
    from pyspark.sql import functions as F

    from redshift_etl_spark.queries.tables import load

    from .conftest import SF_ORACLE

    ev = load(spark, SF_ORACLE, "events")
    daily = RU.sketch_distinct_rollup(
        ev, "ts", ["event_type"], "user_id", level="day"
    )
    exact = (
        ev.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("bucket"))
        .agg(F.count_distinct("user_id").alias("exact"))
    )
    joined = daily.join(exact, ["event_type", "bucket"]).collect()
    assert joined
    for r in joined:
        err = abs(r["approx_distinct"] - r["exact"]) / max(r["exact"], 1)
        assert err < 0.05, (r["event_type"], r["bucket"], err)

    # mergeability: union-of-daily-sketches == sketch-of-all (exact
    # same registers -> exact same estimate, not merely close)
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in RU.merge_distinct_sketches(daily, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in ev.groupBy("event_type").agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("approx_distinct")
        ).collect()
    }
    assert merged == direct


# --- binned quantile rollup ------------------------------------------------

def test_binned_merge_exactness(spark):
    """merge-of-histograms == histogram-of-union, bit-exact."""
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import rollup as RU

    df = spark.range(5000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 13).alias("sub"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("v"),
    )
    fine = RU.binned_histogram(df, ["k", "sub"], "v", 0.0, 2.0, 50)
    merged = RU.merge_binned(fine, ["k"])
    direct = RU.binned_histogram(df, ["k"], "v", 0.0, 2.0, 50)
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b


def test_binned_quantile_error_bound(spark):
    """Every estimate within one bin width of the exact percentile."""
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import rollup as RU

    df = spark.range(20000).select(
        F.lit("g").alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / 20.0).alias("v"),
    )
    width = 5.0
    hist = RU.binned_histogram(df, ["k"], "v", 0.0, width, 100)
    est = RU.binned_quantiles(
        hist, ["k"], [(1, 2), (9, 10), (99, 100)], 0.0, width
    ).collect()[0]
    exact = df.agg(
        F.expr("percentile(v, 0.5)").alias("p50"),
        F.expr("percentile(v, 0.9)").alias("p90"),
        F.expr("percentile(v, 0.99)").alias("p99"),
    ).collect()[0]
    for p in ("p50", "p90", "p99"):
        assert abs(est[p] - exact[p]) <= width, p
    assert est["n_rows"] == 20000


def test_binned_clamps_and_drops_nulls(spark):
    from redshift_etl_spark.operators import rollup as RU

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 99.9), ("a", 1e9), ("a", None)],
        "k string, v double",
    )
    rows = {
        (r["bin"], r["cnt"])
        for r in RU.binned_histogram(df, ["k"], "v", 0.0, 10.0, 10).collect()
    }
    assert rows == {(0, 2), (9, 2)}


def test_rolling_binned_histogram_equals_direct_window(spark):
    """Rolling histogram by replication == recomputing each window's
    histogram from raw rows."""
    import datetime as dt

    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import rollup as RU

    rows = []
    base = dt.date(2024, 1, 1)
    for day_off in range(6):
        for i in range(20):
            rows.append(
                ("k", base + dt.timedelta(days=day_off),
                 float((i * 7 + day_off * 3) % 50))
            )
    df = spark.createDataFrame(rows, "k string, day date, v double")
    daily = RU.binned_histogram(df, ["k", "day"], "v", 0.0, 5.0, 10)
    rolled = RU.rolling_binned_histogram(daily, ["k"], "day", 3)
    days = df.select("k", "day").distinct()
    got = {
        tuple(r)
        for r in rolled.join(days, ["k", "day"], "left_semi").collect()
    }
    # direct: for each day, histogram of rows in [day-2, day]
    want = set()
    for day_off in range(6):
        d = base + dt.timedelta(days=day_off)
        sub = df.filter(
            (F.col("day") <= F.lit(d))
            & (F.col("day") >= F.lit(d - dt.timedelta(days=2)))
        )
        for r in RU.binned_histogram(sub, ["k"], "v", 0.0, 5.0, 10).collect():
            want.add((r["k"], d, r["bin"], r["cnt"]))
    assert got == want


def test_change_point_finds_planted_shift(spark):
    import datetime as dt

    import pyspark.sql.functions as F  # noqa: F401

    from redshift_etl_spark.operators import rollup as RU

    base = dt.date(2024, 1, 1)
    rows = []
    # key "step": level 10 for 8 days, then 50 for 6 days -> split at 8
    for i in range(14):
        rows.append(("step", base + dt.timedelta(days=i),
                     10.0 if i < 8 else 50.0))
    # key "flat": constant -> objective 0 everywhere, earliest split wins
    for i in range(10):
        rows.append(("flat", base + dt.timedelta(days=i), 7.0))
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {r["k"]: r for r in
           RU.change_point(df, ["k"], "day", "v", scale=100).collect()}
    assert out["step"]["split_pos"] == 8 and out["step"]["n"] == 14
    assert out["step"]["shift_scaled"] < 0  # mean rises after the split
    assert out["flat"]["split_pos"] == 1  # tie -> earliest
    assert out["flat"]["shift_scaled"] == 0


def test_change_point_partitioning_invariant(spark):
    import datetime as dt

    from redshift_etl_spark.operators import rollup as RU

    base = dt.date(2024, 1, 1)
    rows = [("k", base + dt.timedelta(days=i), float((i * 13) % 29))
            for i in range(40)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    a = RU.change_point(df.repartition(1), ["k"], "day", "v").collect()
    b = RU.change_point(df.repartition(16), ["k"], "day", "v").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_topk_rollup_merge_equals_direct(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import rollup as RU

    df = spark.range(2000).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 11).alias("sub"),
        F.col("id").alias("k"),
        (F.pmod(F.xxhash64("id"), F.lit(997)).cast("double")).alias("v"),
    )
    fine = RU.topk_rollup(df, ["g", "sub"], "k", "v", 4)
    merged = RU.merge_topk(fine, ["g"], 4)
    direct = RU.topk_rollup(df, ["g"], "k", "v", 4)
    a = {(r["g"], tuple((e["id"], e["value"]) for e in r["topk"]))
         for r in merged.collect()}
    b = {(r["g"], tuple((e["id"], e["value"]) for e in r["topk"]))
         for r in direct.collect()}
    assert a == b


def test_delta_join_refresh_equals_full_recompute(spark):
    from redshift_etl_spark.operators import rollup as RU

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "av"])
    a_new = spark.createDataFrame([(2, "a3"), (3, "a4")], ["k", "av"])
    b_old = spark.createDataFrame([(1, "b1"), (3, "b2")], ["k", "bv"])
    b_new = spark.createDataFrame([(2, "b3"), (1, "b4")], ["k", "bv"])
    view = a_old.join(b_old, "k")
    got = sorted(
        tuple(r)
        for r in RU.delta_join_refresh(
            view, a_old, a_new, b_old, b_new, "k"
        ).collect()
    )
    full = sorted(
        tuple(r)
        for r in a_old.unionByName(a_new)
        .join(b_old.unionByName(b_new), "k")
        .collect()
    )
    assert got == full and len(got) > len(view.collect())


def test_half_life_scores_exact_halving(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.rollup import half_life_scores

    df = spark.createDataFrame(
        [
            # ages vs 2024-03-01: 0d, 7d, 14d, 15d, future (excluded)
            ("u1", 10.00, "2024-03-01 10:00:00"),
            ("u1", 10.00, "2024-02-23 00:00:00"),
            ("u1", 10.00, "2024-02-16 23:59:59"),
            ("u1", 10.01, "2024-02-15 00:00:00"),
            ("u1", 99.99, "2024-03-02 00:00:00"),
            ("u2", 0.03, "2024-01-01 00:00:00"),
        ],
        "user_id string, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r["user_id"]: r.asDict()
        for r in half_life_scores(
            df, "user_id", "value", "ts", "2024-03-01", 7
        ).collect()
    }
    u1 = out["u1"]
    # k = 0,1,2,2 -> 1000 + 500 + 250 + 1001 div 4 = 1000+500+250+250
    assert u1["n_events"] == 4  # future event excluded
    assert u1["score_cents"] == 1000 + 500 + 250 + 250
    assert u1["last_age_days"] == 0
    # u2: age 60d -> k=8, 3 div 256 = 0
    assert out["u2"]["score_cents"] == 0
    assert out["u2"]["n_events"] == 1


def test_half_life_scores_partition_invariance(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.rollup import half_life_scores

    rows = [
        (f"u{i % 5}", float(i) + 0.25, f"2024-01-{(i % 28) + 1:02d} 12:00:00")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "user_id string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    one = sorted(map(tuple, half_life_scores(
        df.coalesce(1), "user_id", "value", "ts", "2024-02-15", 7
    ).collect()))
    many = sorted(map(tuple, half_life_scores(
        df.repartition(9), "user_id", "value", "ts", "2024-02-15", 7
    ).collect()))
    assert one == many


def test_rolling_distinct_exact_window(spark):
    import datetime as dt

    from redshift_etl_spark.operators.rollup import rolling_distinct

    rows = [
        # u1 active on day 1 and day 10; u2 on days 1,2; u3 on day 3
        ("u1", dt.datetime(2024, 1, 1, 5)),
        ("u1", dt.datetime(2024, 1, 1, 9)),   # same day dupe
        ("u1", dt.datetime(2024, 1, 10, 1)),
        ("u2", dt.datetime(2024, 1, 1, 2)),
        ("u2", dt.datetime(2024, 1, 2, 2)),
        ("u3", dt.datetime(2024, 1, 3, 2)),
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = {
        r["report_day"].isoformat(): r["active"]
        for r in rolling_distinct(df, "ts", "user", 3).collect()
    }
    # day1: u1,u2 ; day2: +u2(d2) -> still {u1,u2} ; day3: windows d1-3
    assert out["2024-01-01"] == 2
    assert out["2024-01-02"] == 2
    assert out["2024-01-03"] == 3
    # day4: d2-4 -> u2(d2), u3(d3)
    assert out["2024-01-04"] == 2
    # day5: d3-5 -> u3 only
    assert out["2024-01-05"] == 1
    # trailing tail past the last active day
    assert out["2024-01-12"] == 1 and "2024-01-13" not in out


def test_rolling_distinct_partition_invariance(spark):
    import datetime as dt

    from redshift_etl_spark.operators.rollup import rolling_distinct

    rows = [
        (f"u{i % 17}", dt.datetime(2024, 1, 1 + (i % 25), i % 24))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    one = sorted(map(tuple, rolling_distinct(df.coalesce(1), "ts", "user").collect()))
    many = sorted(map(tuple, rolling_distinct(df.repartition(9), "ts", "user").collect()))
    assert one == many
