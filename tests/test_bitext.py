"""Margin-based bitext mining contracts: the ratio margin demotes hub
vectors that raw cosine would over-align, mutual-best output is a
partial matching (each id appears at most once), and results are
partition-invariant."""

from __future__ import annotations

from redshift_etl_spark.operators.similarity import margin_mined_pairs


def _sides(spark):
    """Side B contains a hub (b=99) moderately close to EVERY a-vector;
    each a_i also has a true partner b_i slightly closer in its own
    direction. Raw best-cosine may flock to the hub; the margin
    discounts it because the hub's top-k denominator is high."""
    import math

    dims = 8
    a_rows, b_rows = [], []
    for i in range(4):
        va = [0.0] * dims
        va[i] = 1.0
        va[4 + i] = 0.2
        a_rows.append((i, va))
        vb = [0.0] * dims
        vb[i] = 1.0
        vb[4 + i] = 0.18
        b_rows.append((10 + i, vb))
    hub = [1.0 / math.sqrt(4)] * 4 + [0.05] * 4
    b_rows.append((99, hub))
    schema = "vec_id long, embedding array<double>"
    return (
        spark.createDataFrame(a_rows, schema),
        spark.createDataFrame(b_rows, schema),
    )


def test_margin_aligns_true_partners_not_hub(spark):
    a, b = _sides(spark)
    out = margin_mined_pairs(a, b, k=2).collect()
    got = {(r["a_id"], r["b_id"]) for r in out}
    assert got == {(i, 10 + i) for i in range(4)}  # hub 99 never wins
    for r in out:
        assert r["margin"] > 1.0  # true partners beat their hub-heavy baseline


def test_mutual_best_is_a_matching(spark):
    a, b = _sides(spark)
    out = margin_mined_pairs(a, b, k=2).collect()
    a_ids = [r["a_id"] for r in out]
    b_ids = [r["b_id"] for r in out]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))


def test_margin_partition_invariant(spark):
    a, b = _sides(spark)
    one = sorted(map(tuple, margin_mined_pairs(a.coalesce(1), b.coalesce(1), k=2).collect()))
    many = sorted(map(tuple, margin_mined_pairs(a.repartition(5), b.repartition(3), k=2).collect()))
    assert one == many
