"""Property tests (hypothesis) for the r10 exact-statistics operators:
random small reliability/ratings data must match the independent
pure-python Krippendorff reference EXACTLY, the Bloom filter must never
drop a member, and HRW movement must obey the minimality law — over
arbitrary inputs, not just the hand-built cases."""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from redshift_etl_spark.operators.bloom import bloom_build, bloom_prefilter
from redshift_etl_spark.operators.export import rendezvous_assign
from redshift_etl_spark.operators.quality import krippendorff_alpha

from .test_reliability import _alpha_local


@settings(max_examples=10, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # item
            st.integers(min_value=0, max_value=4),  # rater
            st.integers(min_value=0, max_value=3),  # category
        ),
        min_size=2,
        max_size=80,
    )
)
@pytest.mark.slow
def test_krippendorff_matches_reference_on_random_data(spark, data):
    # one rating per (item, rater): dedupe keeping the first
    seen = {}
    for item, rater, val in data:
        seen.setdefault((item, rater), val)
    triples = [
        (f"i{i}", f"r{r}", f"v{v}") for (i, r), v in sorted(seen.items())
    ]
    df = spark.createDataFrame(
        triples, "item: string, rater: string, val: string"
    )
    row = krippendorff_alpha(df, "item", "rater", "val").collect()[0]
    items, n, alpha = _alpha_local(triples)
    assert row["n_items"] == items and row["n_values"] == n
    assert row["alpha"] == alpha


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    fpp=st.sampled_from([0.01, 0.05, 0.2]),
)
@pytest.mark.slow
def test_bloom_never_drops_a_member(spark, keys, fpp):
    df = spark.createDataFrame([(k,) for k in keys], "k: long")
    bf = bloom_build(df, "k", expected_items=len(keys), fpp=fpp)
    assert bloom_prefilter(df, "k", bf).count() == len(keys)


@settings(max_examples=6, deadline=None)
@given(
    n=st.integers(min_value=20, max_value=300),
    k=st.integers(min_value=2, max_value=12),
)
def test_hrw_minimality_on_random_topologies(spark, n, k):
    from pyspark.sql import functions as F

    keys = spark.range(n).select(F.col("id").alias("key"))
    a = {r["key"]: r["shard"] for r in rendezvous_assign(keys, "key", k).collect()}
    b = {
        r["key"]: r["shard"]
        for r in rendezvous_assign(keys, "key", k + 1).collect()
    }
    assert set(a) == set(b) and all(0 <= s < k for s in a.values())
    for key, old in a.items():
        if b[key] != old:
            assert b[key] == k  # a move only ever lands in the NEW shard
