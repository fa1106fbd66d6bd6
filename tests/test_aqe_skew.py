"""AQE skew-join handling — the runtime answer to LSH hot buckets.

Boilerplate-heavy corpora hash near-identical documents into the same
MinHash band bucket, so the per-band candidate equi-join
(`operators/dedup.lsh_candidate_pairs`) develops a hot key: one bucket
with millions of rows while the rest are tiny. The static plan can't
know which bucket is hot; AQE's skew-join rewrite splits the oversized
shuffle partition into sub-partitions at runtime and replicates the
matching side. This test builds exactly that join shape with a
deliberately hot bucket and asserts Spark's runtime actually applied
the split (`skew=true` on the join in the final adaptive plan).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _skew_confs(spark):
    """Force the skew machinery to engage at test scale: thresholds are
    production-tuned (256 MB) and would never trip on kilobytes."""
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # no broadcast escape hatch: the hot side must go through the
        # shuffle join the skew rewrite targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
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


def test_aqe_splits_hot_lsh_bucket(spark):
    with _skew_confs(spark):
        # candidate-join shape: (bucket, doc) vs (bucket, doc) — bucket 0
        # is boilerplate-hot (~50% of all rows), the rest uniform
        docs = spark.range(120_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.col("id"), 997) + 1)
            .alias("bucket"),
            F.col("id").alias("doc_id"),
            # payload inflates shuffle bytes so the hot bucket crosses
            # the (lowered) skew threshold — and it must SURVIVE column
            # pruning by feeding the post-join aggregate, or the join
            # input shrinks to bare longs and nothing looks skewed
            F.repeat(F.md5(F.col("id").cast("string")), 8).alias("payload"),
        )
        probe = spark.range(2_000).select(
            F.pmod(F.col("id"), 998).alias("bucket"),
            F.col("id").alias("probe_id"),
        )
        joined = (
            docs.join(probe, "bucket")
            .groupBy("probe_id")
            .agg(F.sum(F.length("payload")).alias("payload_bytes"))
        )
        joined.collect()  # AQE finalizes the plan only on execution
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, (
            "AQE did not mark the hot bucket's join as skewed:\n"
            + final_plan[:2000]
        )


def test_skew_confs_restore(spark):
    """The conf guard must leave the shared session untouched."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with _skew_confs(spark):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
