"""`sampling.stratified_exact_split`: exact per-stratum counts at
integer boundaries, md5 within-stratum order, partition invariance."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from redshift_etl_spark.operators.sampling import stratified_exact_split


@pytest.fixture()
def strata(spark):
    # three strata with sizes that do NOT divide evenly: 7, 10, 23
    rows = (
        [(i, "a") for i in range(7)]
        + [(100 + i, "b") for i in range(10)]
        + [(200 + i, "c") for i in range(23)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def _counts(df):
    out = {}
    for r in df.groupBy("source", "split").count().collect():
        out[(r.source, r.split)] = r["count"]
    return out


def test_exact_counts_at_integer_boundaries(spark, strata):
    got = _counts(stratified_exact_split(strata, "source", "doc_id"))
    # n=7: floor(5.6)=5 train, floor(6.3)-5=1 val, 1 test
    # n=10: 8 / 1 / 1         n=23: floor(18.4)=18 / floor(20.7)-18=2 / 3
    assert got == {
        ("a", "train"): 5, ("a", "val"): 1, ("a", "test"): 1,
        ("b", "train"): 8, ("b", "val"): 1, ("b", "test"): 1,
        ("c", "train"): 18, ("c", "val"): 2, ("c", "test"): 3,
    }


def test_custom_weights(spark, strata):
    got = _counts(
        stratified_exact_split(
            strata, "source", "doc_id", weights=(("fit", 1), ("hold", 1))
        )
    )
    assert got[("a", "fit")] == 3 and got[("a", "hold")] == 4
    assert got[("b", "fit")] == 5 and got[("b", "hold")] == 5
    assert got[("c", "fit")] == 11 and got[("c", "hold")] == 12


def test_assignment_is_partitioning_invariant(spark, strata):
    a = stratified_exact_split(strata.repartition(13), "source", "doc_id")
    b = stratified_exact_split(strata.coalesce(1), "source", "doc_id")
    ra = sorted(map(tuple, a.select("doc_id", "split").collect()))
    rb = sorted(map(tuple, b.select("doc_id", "split").collect()))
    assert ra == rb


def test_salt_changes_membership_not_counts(spark, strata):
    a = stratified_exact_split(strata, "source", "doc_id", salt="s1")
    b = stratified_exact_split(strata, "source", "doc_id", salt="s2")
    assert _counts(a) == _counts(b)
    ta = {r.doc_id for r in a.filter(F.col("split") == "train").collect()}
    tb = {r.doc_id for r in b.filter(F.col("split") == "train").collect()}
    assert ta != tb  # different permutation (40 ids; md5 collision ≈ 0)
