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


def test_jsonl_shards_round_trip(spark, tmp_path):
    import json as _json
    import glob
    import os

    from redshift_etl_spark.operators import export as E

    path = str(tmp_path / "jsonl")
    df = spark.createDataFrame(
        [(i, f"doc {i} text", float(i) / 2) for i in range(40)],
        ["doc_id", "text", "score"],
    )
    E.export_jsonl_shards(df, path, "doc_id", n_shards=4)

    # layout: shard=N dirs, real JSON lines inside
    dirs = sorted(os.listdir(path))
    assert [d for d in dirs if d.startswith("shard=")] == [
        f"shard={i}" for i in range(4)
    ]
    a_file = glob.glob(f"{path}/shard=0/*.json")[0]
    with open(a_file) as f:
        rec = _json.loads(f.readline())
    assert set(rec) == {"doc_id", "text", "score"}

    # full round trip: Spark reads the same rows back
    back = spark.read.json(path)
    assert back.count() == 40
    got = sorted(
        (r["doc_id"], r["text"], r["score"]) for r in back.collect()
    )
    want = sorted((i, f"doc {i} text", i / 2) for i in range(40))
    assert got == want
    # shard assignment is the same deterministic md5-mod as parquet
    ids_in_0 = {
        r["doc_id"]
        for r in back.filter(F.col("shard") == 0).collect()
    }
    sharded = E.assign_shards(df, "doc_id", 4)
    want_0 = {
        r["doc_id"] for r in sharded.filter(F.col("shard") == 0).collect()
    }
    assert ids_in_0 == want_0


def test_webdataset_shards_round_trip(spark, tmp_path):
    import json
    import tarfile

    from redshift_etl_spark.operators import export as EX2

    docs = spark.createDataFrame(
        [(f"doc{i:03d}", f"text number {i}", f"src{i % 3}") for i in range(40)],
        "doc_id string, text string, source string",
    )
    out = str(tmp_path / "wds")
    paths = EX2.export_webdataset_shards(
        docs, out, "doc_id", n_shards=4, meta_cols=["source"]
    )
    assert len(paths) == 4
    seen = {}
    for p in paths:
        with tarfile.open(p) as tar:
            names = tar.getnames()
            # members of one sample are adjacent: key.txt then key.json
            assert all(
                names[i][:-4] == names[i + 1][:-5]
                for i in range(0, len(names), 2)
            )
            for i in range(0, len(names), 2):
                base = names[i][:-4]
                txt = tar.extractfile(names[i]).read().decode()
                meta = json.loads(tar.extractfile(names[i + 1]).read())
                seen[base] = (txt, meta["source"])
    want = {
        f"doc{i:03d}": (f"text number {i}", f"src{i % 3}") for i in range(40)
    }
    assert seen == want
    # deterministic bytes: re-export is binary identical (mtime pinned)
    before = {p: open(p, "rb").read() for p in paths}
    paths2 = EX2.export_webdataset_shards(
        docs.repartition(7), out, "doc_id", n_shards=4, meta_cols=["source"]
    )
    assert paths2 == paths
    assert all(open(p, "rb").read() == before[p] for p in paths)


def test_webdataset_shards_column_key(spark, tmp_path):
    """A Column key must behave exactly like the equivalent string key
    (the advertised `key: Column | str` contract — previously the
    Column path selected a column assign_shards never created)."""
    import os
    import tarfile

    from redshift_etl_spark.operators import export as EX2

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    out_col = str(tmp_path / "wds_col")
    paths = EX2.export_webdataset_shards(
        docs, out_col, F.concat(F.lit("k"), F.col("doc_id")), n_shards=3
    )
    out_str = str(tmp_path / "wds_str")
    paths_str = EX2.export_webdataset_shards(
        docs.withColumn("k", F.concat(F.lit("k"), F.col("doc_id"))),
        out_str,
        "k",
        n_shards=3,
    )
    assert [os.path.basename(p) for p in paths] == [
        os.path.basename(p) for p in paths_str
    ]
    for p, q in zip(paths, paths_str):
        with tarfile.open(p) as ta, tarfile.open(q) as tb:
            assert ta.getnames() == tb.getnames()
