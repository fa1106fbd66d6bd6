"""rendezvous_assign — the HRW contract: scale-out moves ONLY keys
won by the new shard (never a lateral move between old shards), the
moved fraction concentrates near 1/(k+1), and assignment is
deterministic and in-range."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators.export import rendezvous_assign


def _keys(spark, n=1000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_moves_only_into_the_new_shard(spark):
    keys = _keys(spark)
    a8 = rendezvous_assign(keys, "k", 8)
    a9 = rendezvous_assign(keys, "k", 9).withColumnRenamed("shard", "s9")
    j = a8.join(a9, "k").collect()
    moved = [(r["shard"], r["s9"]) for r in j if r["shard"] != r["s9"]]
    assert moved, "no movement at all is statistically impossible here"
    assert all(new == 8 for _, new in moved)  # the HRW minimality law
    frac = len(moved) / len(j)
    assert 0.05 < frac < 0.18  # ~1/9, generous band for n=1000


def test_in_range_and_deterministic(spark):
    keys = _keys(spark, 500)
    a = sorted(map(tuple, rendezvous_assign(keys, "k", 8).collect()))
    b = sorted(
        map(tuple, rendezvous_assign(keys.repartition(13), "k", 8).collect())
    )
    assert a == b
    assert all(0 <= s < 8 for _, s in a)
    assert len(a) == 500  # one shard per key, no dupes
