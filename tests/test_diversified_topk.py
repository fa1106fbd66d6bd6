"""`distsort.diversified_topk` quota semantics: the per-group cap
binds before the global cut (quota form — a capped item never
displaces an uncapped one), ranks are contiguous, and results are
partitioning-invariant."""

from __future__ import annotations

import pyspark.sql.functions as F

from redshift_etl_spark.operators.distsort import diversified_topk


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, score long")


def _run(df, k, per_group):
    return diversified_topk(
        df, "grp", [F.col("score").desc(), F.col("id").asc()], k, per_group
    )


def test_cap_binds_before_the_global_cut(spark):
    # group A holds the 3 best scores but may place only 2; B's lower
    # scores fill the remaining slots
    rows = [
        (1, "a", 100), (2, "a", 99), (3, "a", 98),
        (4, "b", 50), (5, "b", 40),
    ]
    got = _run(_df(spark, rows), k=4, per_group=2).collect()
    assert [(r.id, r.rank) for r in sorted(got, key=lambda r: r.rank)] == [
        (1, 1), (2, 2), (4, 3), (5, 4)
    ]  # id 3 (score 98) is capped out even though it beats 50 and 40


def test_no_group_exceeds_quota_and_ranks_contiguous(spark):
    rows = [(i, f"g{i % 3}", 1000 - i) for i in range(30)]
    got = _run(_df(spark, rows), k=9, per_group=3).collect()
    assert sorted(r.rank for r in got) == list(range(1, 10))
    per = {}
    for r in got:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert all(v <= 3 for v in per.values())


def test_fewer_survivors_than_k(spark):
    rows = [(1, "a", 5), (2, "a", 4), (3, "b", 3)]
    got = _run(_df(spark, rows), k=10, per_group=1).collect()
    assert sorted((r.id, r.rank) for r in got) == [(1, 1), (3, 2)]


def test_partitioning_invariance(spark):
    rows = [(i, f"g{(i * 7) % 5}", (i * 13) % 97) for i in range(80)]
    a = _run(_df(spark, rows).repartition(11), 12, 3).collect()
    b = _run(_df(spark, rows).coalesce(1), 12, 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
