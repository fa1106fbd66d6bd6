"""DSIR importance-resampling contracts: the selection prefers pool
documents whose token distribution matches the target corpus, the
scores are exact integers (partition- and rerun-invariant), and the
Gumbel table is a faithful literal quantile grid."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from redshift_etl_spark.operators import dsir as DS


def _corpus(spark):
    """Target speaks vocab A; half the pool speaks A, half speaks a
    disjoint vocab Z. DSIR must prefer the A-speaking pool docs."""
    rows = []
    va = "alpha beta gamma delta epsilon"
    vz = "zulu yankee xray whiskey victor"
    for i in range(20):  # target corpus (excluded from selection)
        rows.append((i, va, "target"))
    for i in range(20, 50):  # pool, target-like
        rows.append((i, va, "pool"))
    for i in range(50, 80):  # pool, off-distribution
        rows.append((i, vz, "pool"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_dsir_prefers_target_like_docs(spark):
    df = _corpus(spark)
    sel = DS.dsir_select(
        df, "doc_id", "text", F.col("kind") == "target", k=20
    ).collect()
    assert len(sel) == 20
    picked = {r["doc_id"] for r in sel}
    # noise is bounded (|gumbel| < 7e6) while the vocab gap in the
    # log-weights is much larger, so every pick is target-like
    assert picked <= set(range(20, 50))
    # target rows never appear in the selection
    assert not picked & set(range(20))


def test_dsir_scores_sign_and_exactness(spark):
    df = _corpus(spark)
    scored = DS.dsir_scores(
        df, "doc_id", "text", F.col("kind") == "target"
    ).collect()
    by_id = {r["doc_id"]: r["score_micro"] for r in scored}
    assert set(by_id) == set(range(20, 80))  # pool docs only
    a = {by_id[i] for i in range(20, 50)}
    z = {by_id[i] for i in range(50, 80)}
    assert len(a) == 1 and len(z) == 1  # identical text, identical score
    assert min(a) > max(z)  # target-like strictly outranks


def test_dsir_partition_and_rerun_invariant(spark):
    df = _corpus(spark)
    tgt = F.col("kind") == "target"
    one = DS.dsir_scores(df.coalesce(1), "doc_id", "text", tgt).collect()
    many = DS.dsir_scores(df.repartition(13), "doc_id", "text", tgt).collect()
    assert {(r["doc_id"], r["score_micro"]) for r in one} == {
        (r["doc_id"], r["score_micro"]) for r in many
    }


def test_gumbel_table_is_quantile_grid():
    t = DS.gumbel_micro_table()
    assert len(t) == DS.GUMBEL_RES
    assert t == sorted(t)  # midpoint quantiles are monotone
    # spot-check against the closed form at two interior points
    for b in (1, 200):
        u = (b + 0.5) / DS.GUMBEL_RES
        assert t[b] == round(-math.log(-math.log(u)) * DS.SCALE)
    assert all(isinstance(g, int) for g in t)
