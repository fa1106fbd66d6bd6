"""Feature-engineering + inequality scalars: m-estimate target
encoding (table + leave-one-out forms) and the exact Gini
coefficient."""

from __future__ import annotations

import pyspark.sql.functions as F

from redshift_etl_spark.operators.distsort import gini_coefficient
from redshift_etl_spark.operators.features import m_estimate_encode


def test_m_estimate_table_hand_computed(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("b", 0)] * 1,
        "cat string, y int",
    )
    out = {
        r["cat"]: r.asDict()
        for r in m_estimate_encode(df, "cat", "y", m=4).collect()
    }
    # prior = 9/12 = 0.75
    assert out["a"]["n"] == 10 and out["a"]["pos"] == 8
    assert abs(out["a"]["enc"] - (8 + 4 * 0.75) / 14) < 1e-15
    # small category shrinks toward the prior
    assert abs(out["b"]["enc"] - (1 + 4 * 0.75) / 6) < 1e-15
    raw_b, prior = 0.5, 0.75
    assert raw_b < out["b"]["enc"] < prior


def test_m_estimate_loo_excludes_own_label(spark):
    df = spark.createDataFrame(
        [(i, "a", 1 if i < 3 else 0) for i in range(5)],
        "id long, cat string, y int",
    )
    out = {
        r["id"]: r["enc"]
        for r in m_estimate_encode(df, "cat", "y", m=2, loo=True).collect()
    }
    prior = 3 / 5
    # positive rows see (3-1 + 2*prior)/(4+2); negative rows (3 + ...)
    assert abs(out[0] - (2 + 2 * prior) / 6) < 1e-15
    assert abs(out[4] - (3 + 2 * prior) / 6) < 1e-15
    assert out[4] > out[0]  # removing a positive lowers the estimate


def test_gini_hand_computed_and_extremes(spark):
    # perfectly equal -> 0
    eq = spark.createDataFrame([(5.0,)] * 4, "v double")
    r = gini_coefficient(eq, "v").collect()[0]
    assert r["gini"] == 0.0 and r["n"] == 4
    # one holder owns everything: G = (n-1)/n
    mono = spark.createDataFrame(
        [(0.0,), (0.0,), (0.0,), (100.0,)], "v double"
    )
    r2 = gini_coefficient(mono, "v").collect()[0]
    assert abs(r2["gini"] - 3 / 4) < 1e-15
    # textbook small case: values 1,2,3,4 -> G = 0.25
    small = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    r3 = gini_coefficient(small, "v").collect()[0]
    assert abs(r3["gini"] - 0.25) < 1e-15


def test_gini_tie_and_partition_invariance(spark):
    rows = [(float((i * 7) % 13),) for i in range(400)]  # heavy ties
    df = spark.createDataFrame(rows, "v double")
    one = gini_coefficient(df.coalesce(1), "v").collect()[0]
    many = gini_coefficient(df.repartition(11), "v").collect()[0]
    assert one == many
    # degenerate: all zero -> NULL
    z = spark.createDataFrame([(0.0,)] * 3, "v double")
    assert gini_coefficient(z, "v").collect()[0]["gini"] is None
