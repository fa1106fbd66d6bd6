"""Streaming trending terms: closed tumbling windows emit exactly once
with correct token counts; watermark-late data is dropped; per-window
top-k ranks deterministically."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from redshift_etl_spark.streaming import trending as TR


def _write(path, rows, mtime):
    path.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(path, (mtime, mtime))


def test_trending_terms_closed_windows_and_topk(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    now = time.time()
    # window 1: 10:00-10:10 — spark x3, merge x2, scan x1
    _write(
        indir / "b1.json",
        [
            {"ts": "2024-01-01 10:01:00", "text": "spark merge spark"},
            {"ts": "2024-01-01 10:05:00", "text": "spark merge scan"},
        ],
        now - 30,
    )
    # window 2 opens AND its progress pushes the watermark past
    # window 1's end (10:10 + 5 min watermark < 10:31), closing it
    _write(
        indir / "b2.json",
        [{"ts": "2024-01-01 10:31:00", "text": "table table"}],
        now - 20,
    )
    # a straggler behind the watermark: window 1's state is evicted at
    # the END of the batch that advanced the watermark past its end, so
    # this batch still merges into live state (Spark's documented
    # best-effort lateness) — and the window then emits ONCE, closed
    _write(
        indir / "b3.json",
        [{"ts": "2024-01-01 10:02:00", "text": "spark spark spark"}],
        now - 10,
    )

    stream = (
        spark.readStream.schema("ts string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
        .select(F.col("ts").cast("timestamp").alias("ts"), "text")
    )
    counts = TR.trending_terms_stream(
        stream, "ts", "text", window="10 minutes", watermark="5 minutes"
    )
    q = (
        counts.writeStream.outputMode("append")
        .format("memory")
        .queryName("trend_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.sql("SELECT * FROM trend_out")
    w1 = {
        r["token"]: r["n"]
        for r in out.filter(
            F.col("window_start") == "2024-01-01 10:00:00"
        ).collect()
    }
    # b1 + the still-live-state straggler b3; emitted exactly once per
    # token (append mode) with the merged totals
    assert w1 == {"spark": 6, "merge": 2, "scan": 1}
    per_token = (
        out.filter(F.col("window_start") == "2024-01-01 10:00:00")
        .groupBy("token").count().collect()
    )
    assert all(r["count"] == 1 for r in per_token)  # append-once

    top = TR.topk_terms(out, k=2).filter(
        F.col("window_start") == "2024-01-01 10:00:00"
    ).collect()
    assert [(r["token"], r["n"], r["rank"]) for r in top] == [
        ("spark", 6, 1),
        ("merge", 2, 2),
    ]
