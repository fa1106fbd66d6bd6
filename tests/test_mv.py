"""Incremental MV maintenance: fold ≡ full recompute at every step,
new/untouched groups, and the exactness contract on integer sums."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators import mv as MV

SPEC = dict(keys=["g"], sum_cols=["v"], min_cols=["t"], max_cols=["t"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintain_equals_full_recompute_stepwise(spark):
    data = [
        (i, f"g{i % 5}", (i * 13) % 100, (i * 7) % 50) for i in range(400)
    ]
    df = spark.createDataFrame(data, ["id", "g", "v", "t"])
    base = df.filter(F.col("id") % 3 == 0)
    d1 = df.filter(F.col("id") % 3 == 1)
    d2 = df.filter(F.col("id") % 3 == 2)

    view = MV.agg_mv(base, **SPEC)
    view = MV.maintain_agg_mv(view, d1, **SPEC)
    # step invariant: equals full recompute over base ∪ d1
    assert _rows(view) == _rows(MV.agg_mv(base.unionByName(d1), **SPEC))
    view = MV.maintain_agg_mv(view, d2, **SPEC)
    assert _rows(view) == _rows(MV.agg_mv(df, **SPEC))


def test_maintain_new_and_untouched_groups(spark):
    base = spark.createDataFrame(
        [(1, "a", 10, 5), (2, "b", 20, 6)], ["id", "g", "v", "t"]
    )
    delta = spark.createDataFrame(
        [(3, "b", 5, 1), (4, "c", 7, 9)], ["id", "g", "v", "t"]
    )
    view = MV.maintain_agg_mv(MV.agg_mv(base, **SPEC), delta, **SPEC)
    got = {r["g"]: (r["n_rows"], r["sum_v"], r["min_t"], r["max_t"]) for r in view.collect()}
    assert got == {
        "a": (1, 10, 5, 5),      # untouched passes through unchanged
        "b": (2, 25, 1, 6),      # merged: counts/sums add, min/max widen
        "c": (1, 7, 9, 9),       # new group appears
    }


def test_maintain_empty_delta_is_identity(spark):
    base = spark.createDataFrame(
        [(1, "a", 10, 5), (2, "b", 20, 6)], ["id", "g", "v", "t"]
    )
    empty = spark.createDataFrame([], "id long, g string, v long, t long")
    view = MV.agg_mv(base, **SPEC)
    assert _rows(MV.maintain_agg_mv(view, empty, **SPEC)) == _rows(view)
