"""Bloom runtime pre-filter (`operators/bloom.py`): the contract is
(a) ZERO false negatives — every true join key survives the prefilter,
at every SF; (b) bounded false positives — non-member keys pass at
≈ fpp, never unboundedly; (c) the distributed build produces EXACTLY
the bitmap a local single-threaded build over the same hash positions
produces (bit-for-bit — partitioning can't change a bit_or); (d) the
probe is a map-side Arrow stage, not a join/shuffle of its own."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from redshift_etl_spark import plans as P
from redshift_etl_spark.operators import bloom as B
from redshift_etl_spark.queries.tables import load

from .conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def urgent_bf(spark):
    urgent = (
        load(spark, SF_ORACLE, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return B.bloom_build(urgent, "o_orderkey", fpp=0.01), urgent


def test_parameters_shape():
    m, k = B.bloom_parameters(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1%
    assert 1 <= k <= 10
    # degenerate inputs stay usable / loud
    assert B.bloom_parameters(0, 0.01) == (64, 1)
    with pytest.raises(ValueError):
        B.bloom_parameters(1000, 1.5)
    # cap: an oversized ask degrades (smaller m), never exceeds max_bits
    m_capped, _ = B.bloom_parameters(10**9, 0.01, max_bits=1 << 20)
    assert m_capped == 1 << 20


def test_no_false_negatives(spark, urgent_bf):
    bf, urgent = urgent_bf
    kept = B.bloom_prefilter(urgent, "o_orderkey", bf)
    assert kept.count() == urgent.count()


def test_false_positive_rate_bounded(spark, urgent_bf):
    bf, _ = urgent_bf
    non_members = (
        load(spark, SF_ORACLE, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey")
    )
    total = non_members.count()
    passed = B.bloom_prefilter(non_members, "o_orderkey", bf).count()
    # 1% target; generous 4x slack keeps the assert jitter-free while
    # still catching a broken hash (which passes ~100%)
    assert passed / total < 0.04, f"fp rate {passed}/{total}"


def test_distributed_build_matches_local_bitwise(spark):
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    bf = B.bloom_build(keys.repartition(13), "k", expected_items=5000, fpp=0.01)
    # local single-threaded build over the SAME JVM-computed positions
    pos_rows = keys.select(
        B._positions(F.col("k"), bf.m_bits, bf.k).alias("pos")
    ).collect()
    local = np.zeros(bf.m_bits // 64, dtype=np.int64)
    for r in pos_rows:
        for p in r["pos"]:
            local[p >> 6] |= np.int64(1) << np.int64(p & 63)
    assert np.array_equal(local, bf.words)


def test_probe_matches_local_decision(spark, urgent_bf):
    bf, _ = urgent_bf
    probe = load(spark, SF_SMOKE, "orders").select("o_orderkey")
    kept_spark = {
        r["o_orderkey"]
        for r in B.bloom_prefilter(probe, "o_orderkey", bf).collect()
    }
    pos = probe.select(
        "o_orderkey",
        B._positions(F.col("o_orderkey"), bf.m_bits, bf.k).alias("pos"),
    ).collect()
    kept_local = {
        r["o_orderkey"]
        for r in pos
        if bf.might_contain_local(np.array([r["pos"]], dtype=np.int64))[0]
    }
    assert kept_spark == kept_local


def test_null_keys_dropped(spark, urgent_bf):
    bf, _ = urgent_bf
    df = spark.createDataFrame([(1,), (None,)], "k: long")
    kept = B.bloom_prefilter(df, "k", bf).collect()
    assert all(r["k"] is not None for r in kept)


def test_probe_is_mapside_no_shuffle(spark, urgent_bf):
    """The prefilter itself adds NO exchange: scan → project (positions)
    → ArrowEval (bit test) → filter. The shuffle budget stays with the
    exact join that follows."""
    bf, _ = urgent_bf
    fact = load(spark, SF_SMOKE, "lineitem").select("l_orderkey")
    pre = B.bloom_prefilter(fact, "l_orderkey", bf)
    plan = P.physical_plan(pre)
    assert "ArrowEvalPython" in plan
    assert P.count_shuffles(pre) == 0
