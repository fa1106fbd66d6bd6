"""Streaming ANN index maintenance (`streaming/annindex`): per-batch
cell assignment against a FIXED codebook, id-keyed crash-replay
idempotence, cell-partitioned store layout, probe correctness over
the maintained store, and end-to-end via a real file stream (mtimes
pinned — file source orders by mtime)."""

from __future__ import annotations

import pytest

import hashlib
import json
import os
import time

import pyspark.sql.functions as F

from redshift_etl_spark.streaming import annindex as AX

DIMS = 8


def _vec(seed: int) -> list[float]:
    out = []
    for d in range(DIMS):
        h = hashlib.md5(f"{seed}:{d}".encode()).digest()
        out.append((int.from_bytes(h[:4], "big") % 2001 - 1000) / 1000.0)
    return out


def _centroids(spark):
    # 4 fixed cells — the committed-codebook posture
    return spark.createDataFrame(
        [(100 + i, _vec(900 + i * 7)) for i in range(4)],
        "vec_id long, embedding array<double>",
    )


def _emb_df(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


@pytest.mark.slow
def test_batch_ingest_and_replay_idempotence(spark, tmp_path):
    store = str(tmp_path / "store")
    cents = _centroids(spark)
    b1 = _emb_df(spark, [1, 2, 3])
    AX.index_ingest_batch(b1, store, cents)
    assert spark.read.parquet(store).count() == 3
    # crash replay: the SAME batch appends nothing
    AX.index_ingest_batch(b1, store, cents)
    assert spark.read.parquet(store).count() == 3
    # overlapping next batch: only the new id lands
    AX.index_ingest_batch(_emb_df(spark, [3, 4]), store, cents)
    got = sorted(
        r.vec_id for r in spark.read.parquet(store).collect()
    )
    assert got == [1, 2, 3, 4]


def test_mutated_embedding_same_id_is_out_of_contract(spark, tmp_path):
    # ADVICE r09: the anti-join keys on (cluster, id) to stay
    # partition-to-partition, so idempotence holds under the module's
    # IMMUTABLE-EMBEDDING precondition — replays carry identical bytes
    # and land in the same cell. This test pins BOTH sides of that
    # contract: (a) a same-id row whose embedding re-assigns to the
    # SAME cell is still deduped; (b) a same-id row whose new embedding
    # moves cells appends a second row — the documented upsert
    # exclusion, which needs the versioned-sink machinery instead.
    store = str(tmp_path / "store")
    cents = _centroids(spark)
    AX.index_ingest_batch(_emb_df(spark, [1]), store, cents)
    cell0 = [r.cluster for r in spark.read.parquet(store).collect()]
    # (a) same cell, slightly different bytes: still exactly-once on id
    base = _vec(1)
    nudged = [v * 0.999 for v in base]  # same direction ⇒ same cell
    AX.index_ingest_batch(
        spark.createDataFrame(
            [(1, nudged)], "vec_id long, embedding array<double>"
        ),
        store,
        cents,
    )
    assert spark.read.parquet(store).count() == 1
    # (b) cell-moving embeddings under the same id: one duplicate row
    # per NEW cell, as documented. Each centroid's own vector assigns
    # to its own cell (self-cosine is maximal), so ingesting all four
    # under id=1 leaves exactly one id-1 row in every cell — three
    # duplicates beyond the original (cell0 is one of the four).
    for i in range(4):
        AX.index_ingest_batch(
            spark.createDataFrame(
                [(1, _vec(900 + i * 7))],
                "vec_id long, embedding array<double>",
            ),
            store,
            cents,
        )
    rows = spark.read.parquet(store).collect()
    assert [r.vec_id for r in rows] == [1, 1, 1, 1]
    assert len({r.cluster for r in rows}) == 4
    assert cell0[0] in {r.cluster for r in rows}


def test_store_is_cell_partitioned_and_assignment_is_fixed(spark, tmp_path):
    store = str(tmp_path / "store")
    cents = _centroids(spark)
    AX.index_ingest_batch(_emb_df(spark, range(20)), store, cents)
    # hive layout: cluster=<cell> partition dirs
    parts = sorted(
        d for d in os.listdir(store) if d.startswith("cluster=")
    )
    assert parts and all(p.startswith("cluster=") for p in parts)
    # stored assignment ≡ assigning the same vectors today (codebook
    # is fixed, so the store never goes stale)
    from redshift_etl_spark.operators.similarity import assign_clusters

    fresh = {
        r.vec_id: r.cluster
        for r in assign_clusters(
            _emb_df(spark, range(20)), cents, "vec_id", "embedding"
        ).collect()
    }
    stored = {
        r.vec_id: r.cluster for r in spark.read.parquet(store).collect()
    }
    assert stored == fresh


def test_probe_finds_planted_neighbor_in_its_cell(spark, tmp_path):
    store = str(tmp_path / "store")
    cents = _centroids(spark)
    AX.index_ingest_batch(_emb_df(spark, range(10)), store, cents)
    # plant a near-copy of vector 7 (same direction, scaled) — lands
    # in 7's cell and has cosine 1.0 to it
    planted = spark.createDataFrame(
        [(99, [x * 0.5 for x in _vec(7)])],
        "vec_id long, embedding array<double>",
    )
    AX.index_ingest_batch(planted, store, cents)
    q = _emb_df(spark, [7])
    res = AX.probe_index(
        spark.read.parquet(store), q, cents, k=1
    ).collect()
    assert len(res) == 1
    assert res[0].query_id == 7
    assert res[0].neighbor_id == 99
    assert res[0].cosine == 1.0
    assert res[0].rank == 1


def test_store_scan_prunes_to_the_probed_cell(spark, tmp_path):
    # the cell partition column must reach the scan as a partition
    # filter — a store read that lists every cell defeats the index
    store = str(tmp_path / "store")
    cents = _centroids(spark)
    AX.index_ingest_batch(_emb_df(spark, range(30)), store, cents)
    one_cell = (
        spark.read.parquet(store).filter(F.col("cluster") == 101)
    )
    plan = one_cell._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1][:120]


def test_stream_end_to_end(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    cents = _centroids(spark)

    now = time.time()
    for i, ids in enumerate([[1, 2, 3], [3, 4]]):
        p = indir / f"b{i}.json"
        p.write_text(
            "\n".join(
                json.dumps({"vec_id": j, "embedding": _vec(j)})
                for j in ids
            )
        )
        os.utime(p, (now - 20 + i * 10, now - 20 + i * 10))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    q = AX.start_ann_index_sink(stream, store, ckpt, cents)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.vec_id for r in spark.read.parquet(store).collect())
    assert got == [1, 2, 3, 4]
    # the maintained store is immediately probeable
    res = AX.probe_index(
        spark.read.parquet(store), _emb_df(spark, [2]), cents, k=2
    )
    assert res.count() >= 1
    assert res.filter(F.col("neighbor_id") == 2).count() == 0
