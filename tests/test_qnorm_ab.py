"""quantile_normalize / ab_test_report (wave-8 r10) — hand-checked
semantics: the rank-map formula, identical-distribution fixed point,
and the A/B degenerate cases."""

from __future__ import annotations

import math

from redshift_etl_spark.operators.distsort import quantile_normalize
from redshift_etl_spark.operators.quality import ab_test_report


def test_qnorm_hand_check(spark):
    # group g1 values 1..4, group g2 values 100..103; global ladder has
    # 8 values. g1's rank-2 value (q = 1.5/4) must map to the global
    # value at ceil(0.375*8) = rank 3 -> 3
    rows = [("g1", v, i) for i, v in enumerate([1, 2, 3, 4])] + [
        ("g2", v, 10 + i) for i, v in enumerate([100, 101, 102, 103])
    ]
    df = spark.createDataFrame(rows, "grp: string, v: long, id: long")
    out = {
        (r["grp"], r["v"]): r["norm_value"]
        for r in quantile_normalize(df, "grp", "v", "id").collect()
    }
    ladder = [1, 2, 3, 4, 100, 101, 102, 103]
    for grp, vals in (("g1", [1, 2, 3, 4]), ("g2", [100, 101, 102, 103])):
        for r, v in enumerate(vals, start=1):
            target = math.ceil((2 * r - 1) * 8 / (2 * 4))
            assert out[(grp, v)] == ladder[target - 1], (grp, v)


def test_qnorm_single_group_is_near_identity(spark):
    # one group: the map sends rank r to global rank ceil((2r-1)*n/(2n))
    # = r for every r (mid-rank never crosses the next value) — identity
    rows = [("g", v, v) for v in [5, 7, 7, 9, 12]]
    df = spark.createDataFrame(rows, "grp: string, v: long, id: long")
    got = {
        (r["id"], r["norm_value"])
        for r in quantile_normalize(df, "grp", "v", "id").collect()
    }
    assert got == {(5, 5), (7, 7), (9, 9), (12, 12)}


def _ab(spark, rows):
    df = spark.createDataFrame(rows, "v: string, s: boolean")
    return ab_test_report(df, "v", "s").collect()[0]


def test_ab_hand_check(spark):
    rows = [("A", True)] * 30 + [("A", False)] * 70 + [("B", True)] * 20 + [
        ("B", False)
    ] * 80
    r = _ab(spark, rows)
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 20)
    pool = 50 / 200
    z = (0.3 - 0.2) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r["z"] == z
    assert r["variant_a"] == "A" and r["variant_b"] == "B"


def test_ab_three_variants_and_degenerate_pool_null_z(spark):
    r = _ab(spark, [("A", True), ("B", False), ("C", True)])
    assert r["n_variants"] == 3 and r["z"] is None
    # all successes -> pool = 1 -> NULL z, never a division blowup
    r2 = _ab(spark, [("A", True)] * 5 + [("B", True)] * 5)
    assert r2["z"] is None and r2["p_a"] == 1.0
