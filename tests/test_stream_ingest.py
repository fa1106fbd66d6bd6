"""Streaming dedup ingest: within-batch + cross-batch dedup against the
stored corpus, crash-replay idempotence, and end-to-end via a real file
stream (mtimes pinned — file source orders by mtime)."""

from __future__ import annotations

import json
import os
import time

from redshift_etl_spark.streaming import ingest as I


def _write_batch(path, rows, mtime):
    path.write_text("\n".join(json.dumps(r) for r in rows))
    os.utime(path, (mtime, mtime))


def test_dedup_ingest_batch_semantics_and_replay(spark, tmp_path):
    corpus = str(tmp_path / "corpus")

    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")],  # 3 dups 1 in-batch
        ["doc_id", "text"],
    )
    I.dedup_ingest_batch(b1, corpus)
    got = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(corpus).collect()
    }
    assert got == {1: "alpha", 2: "beta"}  # min-id kept, dup dropped

    # crash replay: the SAME batch again must append nothing
    I.dedup_ingest_batch(b1, corpus)
    assert spark.read.parquet(corpus).count() == 2

    # next batch: cross-batch dup dropped, new doc survives
    b2 = spark.createDataFrame(
        [(10, "beta"), (11, "gamma")], ["doc_id", "text"]
    )
    I.dedup_ingest_batch(b2, corpus)
    got = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(corpus).collect()
    }
    assert got == {1: "alpha", 2: "beta", 11: "gamma"}
    # every fingerprint exactly once
    fps = [r["fingerprint"] for r in spark.read.parquet(corpus).collect()]
    assert len(fps) == len(set(fps)) == 3


def test_dedup_ingest_reused_doc_id_pairs_exactly(spark, tmp_path):
    """A batch that reuses one doc_id for two DIFFERENT texts must
    store each distinct text once, paired with its own fingerprint —
    the r4 join-back-on-id formulation multiplied the match and wrote
    mismatched (fingerprint, text) rows."""
    import pyspark.sql.functions as F

    corpus = str(tmp_path / "corpus")
    b = spark.createDataFrame(
        [(1, "alpha"), (1, "delta"), (2, "alpha")], ["doc_id", "text"]
    )
    I.dedup_ingest_batch(b, corpus)
    rows = spark.read.parquet(corpus).collect()
    # two distinct texts -> exactly two rows, no cross-pairing
    assert sorted(r["text"] for r in rows) == ["alpha", "delta"]
    for r in rows:
        # fingerprint matches ITS text
        [expect] = (
            spark.range(1)
            .select(F.md5(F.lit(r["text"])))
            .collect()[0]
        )
        assert r["fingerprint"] == expect
        assert r["doc_id"] == 1  # min id per fingerprint group
    # replay appends nothing
    I.dedup_ingest_batch(b, corpus)
    assert spark.read.parquet(corpus).count() == 2


def test_dedup_ingest_stream_end_to_end(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    now = time.time()
    _write_batch(
        indir / "b1.json",
        [
            {"doc_id": 1, "text": "alpha"},
            {"doc_id": 2, "text": "beta"},
            {"doc_id": 3, "text": "alpha"},
        ],
        now - 20,
    )
    _write_batch(
        indir / "b2.json",
        [
            {"doc_id": 10, "text": "beta"},
            {"doc_id": 11, "text": "gamma"},
        ],
        now - 10,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = I.start_dedup_ingest_sink(stream, corpus, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["doc_id"]: r["text"] for r in spark.read.parquet(corpus).collect()
    }
    assert got == {1: "alpha", 2: "beta", 11: "gamma"}
