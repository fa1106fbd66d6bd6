"""Bucketed range join: equivalence to the naive non-equi join, left
variant, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redshift_etl_spark import plans as P
from redshift_etl_spark.operators.rangejoin import range_join


def _fixtures(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 99.0), (5, 20.0)],
        "pid long, p double",
    )
    intervals = spark.createDataFrame(
        # widths straddle the bucket size (10): sub-bucket, exact,
        # multi-bucket, empty
        [(100, 0.0, 7.0), (200, 10.0, 20.0), (300, 4.0, 41.0), (400, 50.0, 60.0)],
        "iid long, s double, e double",
    )
    return points, intervals


@pytest.mark.slow
def test_matches_naive_nonequi_join(spark):
    points, intervals = _fixtures(spark)
    got = range_join(points, intervals, "p", "s", "e", bucket_width=10.0)
    naive = points.join(
        intervals, (F.col("p") >= F.col("s")) & (F.col("p") < F.col("e"))
    )
    key = lambda rows: sorted((r.pid, r.iid) for r in rows)  # noqa: E731
    assert key(got.collect()) == key(naive.collect())
    # boundary semantics: half-open — p=10 is in [10,20) not [0,7);
    # p=20 is NOT in [10,20)
    pairs = set(key(got.collect()))
    assert (2, 200) in pairs and (5, 200) not in pairs


def test_no_duplicate_pairs_across_buckets(spark):
    points, intervals = _fixtures(spark)
    got = range_join(points, intervals, "p", "s", "e", bucket_width=10.0)
    pairs = [(r.pid, r.iid) for r in got.collect()]
    assert len(pairs) == len(set(pairs))


def test_left_keeps_unmatched_points(spark):
    points, intervals = _fixtures(spark)
    got = range_join(
        points, intervals, "p", "s", "e", bucket_width=10.0,
        how="left", point_key="pid",
    )
    by_pid = {}
    for r in got.collect():
        by_pid.setdefault(r.pid, []).append(r.iid)
    assert by_pid[4] == [None]  # p=99 matches nothing
    assert None not in by_pid[1]  # matched points get no NULL row


def test_plan_is_equi_join_not_nested_loop(spark):
    points, intervals = _fixtures(spark)
    got = range_join(points, intervals, "p", "s", "e", bucket_width=10.0)
    plan = P.physical_plan(got)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_matches_naive_and_no_cartesian(spark):
    from redshift_etl_spark import plans as P
    from redshift_etl_spark.operators import rangejoin as RJ

    # crafted: touching endpoints (half-open → NOT overlapping),
    # containment, partial overlap, disjoint, and bucket-boundary spans
    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 30.0), (3, 5.0, 105.0)],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, 10.0, 20.0),   # touches 1 (excluded), overlaps 3
         (11, 25.0, 26.0),   # inside 2
         (12, 99.0, 200.0),  # tail of 3
         (13, 300.0, 310.0)],  # disjoint
        ["rid", "rs", "re"],
    )
    got = RJ.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=7.0
    )
    pairs = sorted((r["lid"], r["rid"]) for r in got.collect())
    # naive reference
    lrows = [tuple(r) for r in left.collect()]
    rrows = [tuple(r) for r in right.collect()]
    want = sorted(
        (lid, rid)
        for lid, ls, le in lrows
        for rid, rs, re in rrows
        if ls < re and rs < le
    )
    assert pairs == want == [(2, 11), (3, 10), (3, 11), (3, 12)]
    # each pair exactly once (no dedup shuffle needed), no cross product
    assert len(pairs) == len(set(pairs))
    assert not P.has_cross_product(got)


def test_bucket_width_advisor_recommends_median(spark):
    from redshift_etl_spark.operators import rangejoin as RJ

    iv = spark.createDataFrame(
        [(0.0, 10.0), (0.0, 20.0), (5.0, 35.0), (1.0, 2.0), (0.0, 100.0)],
        ["s", "e"],
    )
    row = RJ.bucket_width_advisor(iv, "s", "e").collect()[0]
    assert row["n_intervals"] == 5
    assert row["min_len"] == 1.0
    assert row["median_len"] == 20.0          # lengths 1,10,20,30,100
    assert row["recommended_width"] == 20.0
    assert row["p90_len"] > row["median_len"]
    # the recommendation actually works: joining with it matches naive
    got = RJ.interval_overlap_join(
        iv.toDF("ls", "le"), iv.toDF("rs", "re"),
        "ls", "le", "rs", "re",
        bucket_width=float(row["recommended_width"]),
    ).count()
    rows = [tuple(r) for r in iv.collect()]
    want = sum(
        1
        for ls, le in rows
        for rs, re in rows
        if ls < re and rs < le
    )
    assert got == want


def test_interval_overlap_join_exact_and_once(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 50.0, 60.0), (3, 95.0, 105.0)],
        "lid long, ls double, le double",
    )
    right = spark.createDataFrame(
        [
            (10, 5.0, 7.0),     # inside 1
            (11, 9.0, 55.0),    # spans 1 and 2, many buckets
            (12, 60.0, 70.0),   # touches 2 only at the open end -> no
            (13, 100.0, 101.0), # inside 3
            (14, 200.0, 300.0), # no partner
        ],
        "rid long, rs double, re double",
    )
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket_width=7.0
    ).select("lid", "rid")
    got = sorted(map(tuple, out.collect()))
    # half-open: [50,60) x [60,70) do NOT overlap
    assert got == [(1, 10), (1, 11), (2, 11), (3, 13)]
    # arithmetic ownership: no pair emitted twice even when the pair
    # shares many buckets (interval 11 spans ~7 buckets of both sides)
    assert out.count() == len(set(got))


def test_interval_overlap_join_width_invariance(spark):
    from redshift_etl_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [(i, float(i * 3), float(i * 3 + 5)) for i in range(40)],
        "lid long, ls double, le double",
    )
    right = spark.createDataFrame(
        [(100 + i, float(i * 4), float(i * 4 + 2)) for i in range(30)],
        "rid long, rs double, re double",
    )
    outs = [
        sorted(
            map(
                tuple,
                interval_overlap_join(
                    left, right, "ls", "le", "rs", "re", w
                ).select("lid", "rid").collect(),
            )
        )
        for w in (1.0, 3.0, 17.0)
    ]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0
