"""Streaming heavy hitters (streaming/heavy.py): MG candidate
completeness across micro-batches, bounded state, and lower-bound
count semantics."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from redshift_etl_spark.streaming.heavy import heavy_hitters_stream

SCHEMA = StructType([StructField("item", StringType())])


def _write_batch(indir, name, items):
    with open(indir / name, "w") as f:
        for it in items:
            f.write(json.dumps({"item": it}) + "\n")


def _pin_mtimes(indir, names):
    now = time.time()
    for i, name in enumerate(names):
        t = now - 100 * (len(names) - i)
        os.utime(indir / name, (t, t))


@pytest.mark.slow
def test_stream_heavy_hitters_across_batches(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    # "hot" accumulates across batches: 30 in b1, 40 in b2 = 70 of 220
    # total (>220/4); per-batch light items churn through the summary
    b1 = ["hot"] * 30 + [f"light{i}" for i in range(70)]
    b2 = ["hot"] * 40 + [f"noise{i}" for i in range(80)]
    _write_batch(indir, "b1.json", b1)
    _write_batch(indir, "b2.json", b2)
    _pin_mtimes(indir, ("b1.json", "b2.json"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    d = 4
    q = (
        heavy_hitters_stream(stream, "item", d, buckets=8)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT * FROM hh_out ORDER BY bucket, item"
    ).collect()
    # the LAST emission of hot's bucket must contain it (guarantee is
    # over the whole stream so far)
    hot = [r for r in rows if r["item"] == "hot"]
    assert hot, "global heavy hitter missing from candidates"
    last = max(hot, key=lambda r: r["bucket_seen"])
    n_b = last["bucket_seen"]
    # MG lower bound: min_count >= true_freq - n_b/d, and never above
    assert last["min_count"] <= 70
    assert last["min_count"] >= 70 - n_b / d
    # bounded state: every emission carries at most d-1 candidates per
    # bucket
    from collections import Counter

    per_emit = Counter((r["bucket"], r["bucket_seen"]) for r in rows)
    assert max(per_emit.values()) <= d - 1


def test_stream_heavy_validates_d(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        heavy_hitters_stream(df, "value", 1)
