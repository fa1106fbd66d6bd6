"""Exactly-once incremental-MV sink: fold ≡ batch aggregate of all
epochs, crash replay no-ops via the atomic epoch ledger."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from redshift_etl_spark.operators import mv as MV
from redshift_etl_spark.streaming import mv as SMV

SPEC = dict(keys=["g"], sum_cols=["v"])


def _rows(df):
    return sorted(tuple(r) for r in df.select("g", "n_rows", "sum_v").collect())


def test_fold_epochs_and_replay_idempotence(spark, tmp_path):
    view = str(tmp_path / "view")
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 5)], ["id", "g", "v"])
    b1 = spark.createDataFrame([(3, "a", 7), (4, "c", 1)], ["id", "g", "v"])

    assert SMV.fold_epoch(b0, 0, view, **SPEC) is True
    assert SMV.fold_epoch(b1, 1, view, **SPEC) is True
    want = _rows(MV.agg_mv(b0.unionByName(b1), **SPEC))
    assert _rows(spark.read.parquet(view)) == want

    # crash replay: both epochs re-delivered -> ledger no-ops, no
    # double counting
    assert SMV.fold_epoch(b0, 0, view, **SPEC) is False
    assert SMV.fold_epoch(b1, 1, view, **SPEC) is False
    assert _rows(spark.read.parquet(view)) == want
    assert SMV.last_applied_epoch(view) == 1


def test_mv_sink_stream_end_to_end(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    now = time.time()
    for i, rows in enumerate(
        [
            [{"g": "a", "v": 10}, {"g": "b", "v": 5}],
            [{"g": "a", "v": 7}, {"g": "c", "v": 1}],
        ]
    ):
        p = indir / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (now - 20 + i * 5, now - 20 + i * 5))

    stream = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = SMV.start_mv_sink(stream, view, ckpt, **SPEC)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["g"]: (r["n_rows"], r["sum_v"]) for r in spark.read.parquet(view).collect()}
    assert got == {"a": (2, 17), "b": (1, 5), "c": (1, 1)}
    # restart from the checkpoint: nothing new -> view unchanged
    stream2 = (
        spark.readStream.schema("g string, v long")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q2 = SMV.start_mv_sink(stream2, view, ckpt, **SPEC)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got2 = {r["g"]: (r["n_rows"], r["sum_v"]) for r in spark.read.parquet(view).collect()}
    assert got2 == got


def test_fold_epoch_recovers_both_crash_windows(spark, tmp_path):
    import shutil

    view = str(tmp_path / "view")
    old = view + ".__old__"
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 5)], ["id", "g", "v"])
    b1 = spark.createDataFrame([(3, "a", 7), (4, "c", 1)], ["id", "g", "v"])
    assert SMV.fold_epoch(b0, 0, view, **SPEC) is True

    # crash window 1: between the two renames — the view dir is gone,
    # the complete previous view sits at .__old__. Recovery must
    # restore it BEFORE the ledger check, so the interrupted epoch
    # replays and folds exactly once.
    os.rename(view, old)
    assert SMV.last_applied_epoch(view) == -1  # the hazard the advice named
    assert SMV.fold_epoch(b1, 1, view, **SPEC) is True
    want = _rows(MV.agg_mv(b0.unionByName(b1), **SPEC))
    assert _rows(spark.read.parquet(view)) == want
    assert not os.path.exists(old)

    # crash window 2: after the second rename, before the cleanup — a
    # stale populated .__old__ next to a valid view. Without recovery
    # the next swap's os.rename(view, old) raises ENOTEMPTY.
    shutil.copytree(view, old)
    b2 = spark.createDataFrame([(5, "b", 2)], ["id", "g", "v"])
    assert SMV.fold_epoch(b2, 2, view, **SPEC) is True
    want2 = _rows(
        MV.agg_mv(b0.unionByName(b1).unionByName(b2), **SPEC)
    )
    assert _rows(spark.read.parquet(view)) == want2
    assert not os.path.exists(old)
    # replay of the recovered epochs still no-ops
    assert SMV.fold_epoch(b1, 1, view, **SPEC) is False
    assert _rows(spark.read.parquet(view)) == want2
