"""Deterministic-sampling contracts: run-to-run stability, growth
stability (new data never moves an existing row), and the stratified
cap semantics. These are the invariants training pipelines rely on to
avoid train/test leakage across re-runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators import sampling as SP


def _docs(spark, n=400, groups=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % groups).cast("string").alias("src"),
    )


def test_split_is_deterministic_and_total(spark):
    df = _docs(spark)
    s1 = {r["doc_id"]: r["split"] for r in SP.deterministic_split(df, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"] for r in SP.deterministic_split(df, "doc_id").collect()}
    assert s1 == s2
    assert set(s1.values()) == {"train", "val", "test"}
    assert len(s1) == 400  # every row in exactly one split


def test_split_stable_under_growth(spark):
    small = SP.deterministic_split(_docs(spark, 100), "doc_id")
    big = SP.deterministic_split(_docs(spark, 400), "doc_id")
    small_map = {r["doc_id"]: r["split"] for r in small.collect()}
    big_map = {r["doc_id"]: r["split"] for r in big.collect()}
    # the original 100 rows keep their assignment exactly
    assert all(big_map[k] == v for k, v in small_map.items())


def test_hash_sample_is_subset_monotone(spark):
    df = _docs(spark)
    keep10 = {r["doc_id"] for r in SP.hash_sample(df, "doc_id", 0.1).collect()}
    keep30 = {r["doc_id"] for r in SP.hash_sample(df, "doc_id", 0.3).collect()}
    assert keep10 <= keep30  # growing the rate only ADDS rows


def test_stratified_cap_keeps_small_groups_whole(spark):
    df = _docs(spark, n=120, groups=3)  # 40 rows per group
    # cap far above the group size → edge = 256 → everything kept
    out = SP.stratified_cap_sample(df, key="doc_id", group="src", cap=1000)
    assert out.count() == 120
    # cap below group size → each group shrinks, deterministically
    sampled = SP.stratified_cap_sample(df, key="doc_id", group="src", cap=10)
    again = SP.stratified_cap_sample(df, key="doc_id", group="src", cap=10)
    a = sorted(r["doc_id"] for r in sampled.collect())
    b = sorted(r["doc_id"] for r in again.collect())
    assert a == b and 0 < len(a) < 120
