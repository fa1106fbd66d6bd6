"""Shard export (operators/export.py): deterministic assignment,
manifest/readback agreement, and partition-pruned shard reads."""

from __future__ import annotations

import pyspark.sql.functions as F

from redshift_etl_spark.operators import export as EX


def _docs(spark):
    return spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_assignment_deterministic_and_bounded(spark):
    a = EX.assign_shards(_docs(spark), "doc_id", 8)
    b = EX.assign_shards(_docs(spark).repartition(13), "doc_id", 8)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    mx = a.agg(F.max("shard"), F.min("shard")).collect()[0]
    assert 0 <= mx[1] and mx[0] <= 7


def test_export_roundtrip_and_manifest(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    manifest = EX.export_shards(docs, path, "doc_id", "text", 8)
    back = spark.read.parquet(path)
    assert back.count() == 400
    # reader recomputes the manifest from the written files and gets
    # the identical contract
    recomputed = (
        back.withColumn("__h", EX.content_hash48("text"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.octet_length("text")).cast("long").alias("total_bytes"),
            F.expr("bit_xor(__h)").alias("checksum"),
        )
    )
    assert {tuple(r) for r in manifest.collect()} == {
        tuple(r) for r in recomputed.collect()
    }


def test_shard_read_prunes_partitions(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards2")
    EX.export_shards(docs, path, "doc_id", "text", 8)
    one = spark.read.parquet(path).filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the shard predicate must land in PartitionFilters (directory
    # pruning), NOT as a post-scan data filter
    pf = next(
        (ln for ln in plan.splitlines() if "PartitionFilters:" in ln), ""
    )
    assert "shard" in pf.split("PartitionFilters:")[-1]
    total = spark.read.parquet(path).count()
    assert one.count() < total
