"""Runtime bloom-filter join pruning — the 100 TB selective-dim path.

When a dim table is too big to broadcast but its filter is selective,
Spark can build a bloom filter over the dim join keys at runtime and
push a `might_contain` probe into the fact scan side — rows that can't
join are dropped before the shuffle. This is the engine-native version
of the hand-built "ship a key set to prune the fact" pattern, and on a
100 TB fact it removes most of the shuffle volume. The test asserts
(a) the filter is actually injected into the plan, and (b) pruning is
semantics-free: results with and without it are identical (a bloom's
false positives are re-checked by the real join).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _bloom_confs(spark, enabled: bool):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": str(enabled).lower(),
        # test-scale thresholds: the guards are sized for real tables
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        # no broadcast escape hatch — the point is the non-broadcast case
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _tables(spark, tmp_path):
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(200_000).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("pay"),
    ).write.mode("overwrite").parquet(fact_p)
    spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("attr")
    ).write.mode("overwrite").parquet(dim_p)
    return spark.read.parquet(fact_p), spark.read.parquet(dim_p)


def test_bloom_filter_injected_and_semantics_free(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    selective = dim.filter("attr = 3")

    with _bloom_confs(spark, enabled=True):
        j = fact.join(selective, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        with_bloom = {tuple(r) for r in j.collect()}

    with _bloom_confs(spark, enabled=False):
        j2 = fact.join(selective, "k")
        plan2 = j2._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan2
        without = {tuple(r) for r in j2.collect()}

    assert with_bloom == without
    assert len(with_bloom) == 1_000  # attr=3 → 1000 dim keys, all matching
