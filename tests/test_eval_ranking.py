"""Ranking-eval metrics (distsort.reciprocal_rank / ndcg_at_k):
hand-computed values on a tiny fixture, no-relevant-group NULLs,
graded-gain arithmetic, @k cutoff, and partition invariance."""

from __future__ import annotations

import pytest

import math

import pyspark.sql.functions as F

from redshift_etl_spark.operators import distsort as D


def _fixture(spark):
    # group a: ranking (score desc, id asc) = d1(9) d2(7) d3(5) d4(3)
    #          rel grades               =   0     2     0     1
    # group b: d5(8) d6(6) — no relevant items at all
    rows = [
        ("a", "d1", 9, 0),
        ("a", "d2", 7, 2),
        ("a", "d3", 5, 0),
        ("a", "d4", 3, 1),
        ("b", "d5", 8, 0),
        ("b", "d6", 6, 0),
    ]
    return spark.createDataFrame(
        rows, "g string, id string, s long, rel int"
    )


def test_reciprocal_rank_hand_computed(spark):
    df = _fixture(spark).withColumn("y", F.col("rel") > 0)
    out = {
        r["g"]: r.asDict()
        for r in D.reciprocal_rank(df, "g", "s", "id", "y").collect()
    }
    assert out["a"]["n_items"] == 4 and out["a"]["n_rel"] == 2
    assert out["a"]["first_rel_rank"] == 2
    assert abs(out["a"]["rr"] - 0.5) < 1e-15
    # no relevant item -> NULL rank and rr, not 0
    assert out["b"]["first_rel_rank"] is None and out["b"]["rr"] is None


def test_ndcg_hand_computed_and_null_group(spark):
    df = _fixture(spark)
    out = {
        r["g"]: r.asDict()
        for r in D.ndcg_at_k(df, "g", "s", "id", "rel", k=10).collect()
    }
    d = D.ndcg_discounts(10)
    # DCG: rel=2 at rank 2 (gain 3), rel=1 at rank 4 (gain 1)
    dcg = round(3 * d[1] * 1e6) + round(1 * d[3] * 1e6)
    # ideal: rel 2 at rank 1, rel 1 at rank 2
    idcg = round(3 * d[0] * 1e6) + round(1 * d[1] * 1e6)
    assert out["a"]["dcg_micro"] == dcg
    assert out["a"]["idcg_micro"] == idcg
    assert abs(out["a"]["ndcg"] - dcg / idcg) < 1e-15
    assert out["b"]["idcg_micro"] == 0 and out["b"]["ndcg"] is None


def test_ndcg_k_cutoff_drops_deep_hits(spark):
    # the only relevant item sits at rank 3; with k=2 it contributes
    # nothing to DCG but IDCG still counts it (it WOULD fit in top-2
    # of the ideal ordering) -> ndcg = 0
    rows = [("q", f"d{i}", 10 - i, 1 if i == 3 else 0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, id string, s long, rel int")
    r = D.ndcg_at_k(df, "g", "s", "id", "rel", k=2).collect()[0]
    assert r["dcg_micro"] == 0
    assert r["idcg_micro"] == round(1e6 * D.ndcg_discounts(2)[0])
    assert r["ndcg"] == 0.0


def test_perfect_ranking_is_ndcg_one(spark):
    rows = [("q", f"d{i}", 100 - i, max(0, 3 - i)) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, id string, s long, rel int")
    r = D.ndcg_at_k(df, "g", "s", "id", "rel", k=5).collect()[0]
    assert r["dcg_micro"] == r["idcg_micro"] > 0
    assert r["ndcg"] == 1.0


def test_discounts_match_log2(spark):
    d = D.ndcg_discounts(5)
    assert d[0] == 1.0
    assert abs(d[1] - 1 / math.log2(3)) < 1e-15
    assert len(d) == 5


@pytest.mark.slow
def test_partition_invariance(spark):
    df = _fixture(spark)
    one = sorted(
        map(tuple, D.ndcg_at_k(df.coalesce(1), "g", "s", "id", "rel").collect())
    )
    many = sorted(
        map(
            tuple,
            D.ndcg_at_k(df.repartition(5), "g", "s", "id", "rel").collect(),
        )
    )
    assert one == many
    y = F.col("rel") > 0
    one_rr = sorted(
        map(
            tuple,
            D.reciprocal_rank(
                df.coalesce(1).withColumn("y", y), "g", "s", "id", "y"
            ).collect(),
        )
    )
    many_rr = sorted(
        map(
            tuple,
            D.reciprocal_rank(
                df.repartition(5).withColumn("y", y), "g", "s", "id", "y"
            ).collect(),
        )
    )
    assert one_rr == many_rr


def test_spearman_hand_computed_and_brute_force(spark):
    from redshift_etl_spark.operators.distsort import spearman_corr

    # perfect monotone -> 1 ; perfect inverse -> -1
    up = spark.createDataFrame(
        [(i, i * 10 + 3) for i in range(20)], "x long, y long"
    )
    assert abs(spearman_corr(up, "x", "y").collect()[0]["rho"] - 1.0) < 1e-12
    dn = spark.createDataFrame(
        [(i, -i) for i in range(20)], "x long, y long"
    )
    assert abs(spearman_corr(dn, "x", "y").collect()[0]["rho"] + 1.0) < 1e-12
    # tie-aware: compare to scipy-free brute force (midrank Pearson)
    rows = [(i % 5, (i * 7) % 11) for i in range(40)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = spearman_corr(df, "x", "y").collect()[0]["rho"]

    def midranks(vals):
        from collections import Counter

        c = Counter(vals)
        cum, mid = 0, {}
        for v in sorted(c):
            mid[v] = cum + (c[v] + 1) / 2
            cum += c[v]
        return [mid[v] for v in vals]

    rx, ry = midranks([r[0] for r in rows]), midranks([r[1] for r in rows])
    n = len(rows)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert abs(got - want) < 1e-12


@pytest.mark.slow
def test_spearman_constant_column_is_null_and_partition_invariant(spark):
    from redshift_etl_spark.operators.distsort import spearman_corr

    const = spark.createDataFrame(
        [(1, i) for i in range(10)], "x long, y long"
    )
    assert spearman_corr(const, "x", "y").collect()[0]["rho"] is None
    rows = [((i * 13) % 7, (i * 5) % 9) for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    one = spearman_corr(df.coalesce(1), "x", "y").collect()[0]
    many = spearman_corr(df.repartition(9), "x", "y").collect()[0]
    assert one == many
