"""KS drift contracts: exact agreement with a brute-force Python CDF
scan, zero statistic on identical samples, NULL inputs ignored, and
the multi-column ranked_cumsums ≡ composed single-column calls."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from redshift_etl_spark.operators import distsort as DS


def _df(spark, a_vals, b_vals, nulls=0):
    rows = [(float(v), "a") for v in a_vals] + [(float(v), "b") for v in b_vals]
    rows += [(None, "a")] * nulls
    return spark.createDataFrame(rows, "value double, grp string")


def _brute_ks(a_vals, b_vals):
    pts = sorted(set(a_vals) | set(b_vals))
    na, nb = len(a_vals), len(b_vals)
    best = (-1, None)
    for p in pts:
        ca = sum(1 for v in a_vals if v <= p)
        cb = sum(1 for v in b_vals if v <= p)
        num = abs(ca * nb - cb * na)
        if num > best[0]:
            best = (num, p)
    return best[0], best[1], Fraction(best[0], na * nb)


def test_ks_matches_brute_force(spark):
    a = [1, 1, 2, 3, 5, 8, 13]
    b = [2, 3, 3, 4, 4, 9]
    df = _df(spark, a, b)
    r = DS.ks_drift(df, "value", F.col("grp") == "a", F.col("grp") == "b").collect()[0]
    num, at, frac = _brute_ks(a, b)
    assert r["ks_num"] == num
    assert r["at_value"] == at
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    assert Fraction(r["ks_num"], r["n_a"] * r["n_b"]) == frac


def test_ks_zero_on_identical_samples(spark):
    vals = [1, 2, 2, 7]
    r = DS.ks_drift(
        _df(spark, vals, vals), "value", F.col("grp") == "a", F.col("grp") == "b"
    ).collect()[0]
    assert r["ks_num"] == 0
    assert r["ks"] == 0.0


def test_ks_ignores_nulls(spark):
    a, b = [1, 2, 3], [4, 5, 6]
    with_nulls = DS.ks_drift(
        _df(spark, a, b, nulls=5), "value", F.col("grp") == "a", F.col("grp") == "b"
    ).collect()[0]
    without = DS.ks_drift(
        _df(spark, a, b), "value", F.col("grp") == "a", F.col("grp") == "b"
    ).collect()[0]
    assert tuple(with_nulls) == tuple(without)
    assert with_nulls["ks"] == 1.0  # disjoint supports


def test_ranked_cumsums_matches_composed_single_calls(spark):
    df = spark.createDataFrame(
        [(i, i % 5, (i * 7) % 11) for i in range(200)],
        "k long, x long, y long",
    )
    multi = DS.ranked_cumsums(
        df, [F.col("k")], ["x", "y"], cumsum_names=["cx", "cy"]
    )
    sx = DS.ranked_cumsum(df, [F.col("k")], "x", cumsum_name="cx")
    sy = DS.ranked_cumsum(df, [F.col("k")], "y", cumsum_name="cy")
    got = {r["k"]: (r["rank"], r["cx"], r["cy"]) for r in multi.collect()}
    ex = {r["k"]: (r["rank"], r["cx"]) for r in sx.collect()}
    ey = {r["k"]: (r["rank"], r["cy"]) for r in sy.collect()}
    for k, (rank, cx, cy) in got.items():
        assert ex[k] == (rank, cx)
        assert ey[k] == (rank, cy)
