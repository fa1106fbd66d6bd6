"""End-to-end corpus pipeline composition — the 'switch from the
reference' proof: raw documents → exact dedup → quality filter →
deterministic split → shard export with verifiable manifest, every
stage a real engine operator, with conservation invariants asserted
at each boundary."""

from __future__ import annotations

import pyspark.sql.functions as F

from redshift_etl_spark.operators import dedup as D
from redshift_etl_spark.operators import export as EX
from redshift_etl_spark.operators import sampling as SP
from redshift_etl_spark.operators import text as TX
from redshift_etl_spark.queries.tables import load

SF = "/root/testdata/sf0.01"


def test_full_corpus_pipeline(spark, tmp_path):
    docs = load(spark, SF, "documents")
    n_raw = docs.count()

    # 1. exact dedup — representatives only
    deduped = D.drop_exact_duplicates(docs, "doc_id", "text")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_raw
    assert (
        deduped.select(F.md5("text")).distinct().count() == n_dedup
    )  # one row per distinct content

    # 2. quality filter (the engine's composite signal)
    kept = deduped.filter(TX.quality_score("text") == 1)
    n_kept = kept.count()
    assert 0 < n_kept <= n_dedup

    # 3. deterministic train/val/test split — disjoint, exhaustive,
    # stable in the key
    split = SP.deterministic_split(kept, "doc_id")
    by = {r["split"]: r["n"] for r in
          split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by.values()) == n_kept
    assert set(by) <= {"train", "val", "test"} and by["train"] > 0

    # 4. shard export + manifest: written rows == manifest == input
    train = split.filter(F.col("split") == "train").drop("split")
    path = str(tmp_path / "shards")
    manifest = EX.export_shards(train, path, "doc_id", "text", 8)
    m_rows = manifest.agg(F.sum("n_rows")).collect()[0][0]
    back = spark.read.parquet(path)
    assert m_rows == back.count() == by["train"]
    # reader-side checksum agreement on one shard
    s0 = back.filter(F.col("shard") == manifest.first()["shard"])
    ck = s0.withColumn("__h", EX.content_hash48("text")).agg(
        F.expr("bit_xor(__h)")
    ).collect()[0][0]
    assert ck == manifest.first()["checksum"]
