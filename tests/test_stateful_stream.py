"""Continuous new-or-newer CDC (applyInPandasWithState): per-key state
across micro-batches — newer versions re-emit, stale/duplicate/NULL
versions are dropped."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from redshift_etl_spark.streaming.stateful import changed_or_new_stream

SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("lastmodifieddate", TimestampType()),
        StructField("payload", StringType()),
    ]
)


def _write_batch(indir, name, rows):
    with open(indir / name, "w") as f:
        for rid, lmd, payload in rows:
            f.write(
                json.dumps(
                    {"id": rid, "lastmodifieddate": lmd, "payload": payload}
                )
                + "\n"
            )


@pytest.mark.slow
def test_new_or_newer_across_microbatches(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    # b1: K1 twice (in-batch: only the newest emits), K2 once
    _write_batch(
        indir,
        "b1.json",
        [
            ("K1", "2024-01-01 10:00:00", "v1"),
            ("K1", "2024-01-01 11:00:00", "v2"),
            ("K2", "2024-01-01 09:00:00", "u1"),
        ],
    )
    # b2: duplicate version (drop), stale version (drop), newer (emit),
    # NULL recency (drop)
    _write_batch(
        indir,
        "b2.json",
        [
            ("K1", "2024-01-01 11:00:00", "v2-dup"),
            ("K1", "2024-01-01 08:00:00", "v0-stale"),
            ("K2", "2024-01-01 12:00:00", "u2"),
            ("K3", None, "null-recency"),
        ],
    )
    _pin_mtimes(indir, ("b1.json", "b2.json"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = (
        changed_or_new_stream(stream, "id", "lastmodifieddate")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["id"], r["payload"])
        for r in spark.sql("SELECT * FROM cdc_out").collect()
    }
    assert got == {("K1", "v2"), ("K2", "u1"), ("K2", "u2")}


def _pin_mtimes(indir, names):
    """File-source processing order follows modification time;
    same-second mtimes tie-break arbitrarily, so pin strictly
    increasing mtimes to make batch order deterministic."""
    import os
    import time

    now = time.time()
    for i, name in enumerate(names):
        t = now - 100 * (len(names) - i)
        os.utime(indir / name, (t, t))


@pytest.mark.slow
def test_new_or_newer_with_ttl_smoke(spark, tmp_path):
    """The ProcessingTimeTimeout TTL path: state timeouts are armed per
    batch without disturbing the CDC semantics (no timeout can fire
    within the test window, so output matches the no-TTL case; the
    timed-out branch clears state — exercised here only for arming)."""
    indir = tmp_path / "in"
    indir.mkdir()
    _write_batch(indir, "b1.json", [("K1", "2024-01-01 10:00:00", "v1")])
    _write_batch(indir, "b2.json", [("K1", "2024-01-01 12:00:00", "v2"),
                                    ("K1", "2024-01-01 09:00:00", "stale")])
    _pin_mtimes(indir, ("b1.json", "b2.json"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = (
        changed_or_new_stream(stream, "id", "lastmodifieddate", ttl_minutes=30)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cdc_ttl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # NOTE: never processAllAvailable() here — with processing-time
        # timeouts armed the engine keeps scheduling timeout-evaluation
        # batches and "all available" never settles; poll the sink.
        import time

        expected = {("K1", "v1"), ("K1", "v2")}
        deadline = time.time() + 120
        got: set = set()
        while time.time() < deadline:
            got = {
                (r["id"], r["payload"])
                for r in spark.sql("SELECT * FROM cdc_ttl_out").collect()
            }
            if got >= expected:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    spark.catalog.dropTempView("cdc_ttl_out")
    assert got == expected
