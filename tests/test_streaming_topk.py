"""Continuous top-k similarity (streaming/topk.py): incremental merge
across micro-batches ≡ batch top-k over everything seen; bounded
state; redelivery-safe dedup by neighbor id."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from redshift_etl_spark.streaming.topk import topk_similarity_stream

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _vec(i, dim=8):
    # deterministic synthetic direction per id
    return [float((i * 31 + d * 7) % 17 - 8) for d in range(dim)]


def _write_batch(indir, name, ids):
    with open(indir / name, "w") as f:
        for i in ids:
            f.write(
                json.dumps({"vec_id": i, "embedding": _vec(i)}) + "\n"
            )


@pytest.mark.slow
def test_incremental_topk_equals_batch_recompute(spark, tmp_path):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from redshift_etl_spark.operators.similarity import cosine

    indir = tmp_path / "in"
    indir.mkdir()
    b1, b2 = list(range(100, 140)), list(range(140, 180))
    _write_batch(indir, "b1.json", b1)
    _write_batch(indir, "b2.json", b2)
    now = time.time()
    for i, n in enumerate(("b1.json", "b2.json")):
        t = now - 100 * (2 - i)
        os.utime(indir / n, (t, t))

    queries = spark.createDataFrame(
        [(1, _vec(1)), (2, _vec(2)), (3, _vec(3))], SCHEMA
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    k = 4
    q = (
        topk_similarity_stream(stream, queries, "vec_id", "embedding", k)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("topk_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM topk_out").collect()
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    # batch recompute over everything seen
    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in b1 + b2], SCHEMA
    )
    qdf = queries.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    want_rows = (
        corpus.select(
            F.col("vec_id").alias("nid"), F.col("embedding").alias("nv")
        )
        .join(F.broadcast(qdf))
        .select("qid", "nid", F.round(cosine("nv", "qv"), 6).alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    )
    want: dict = {}
    for r in want_rows:
        want.setdefault(r["qid"], []).append(
            (r["nid"], r["cos"], r["rk"])
        )
    for qid in (1, 2, 3):
        got_last = {
            (r["neighbor_id"], r["cosine"], r["rank"])
            for r in per_q[qid]
            if r["rank"] <= k
        }
        # the final state's top-k must be present among emissions and
        # equal the batch recompute
        assert set(want[qid]) <= got_last
        # and state is bounded: no emission ever exceeds k ranks
        assert max(r["rank"] for r in per_q[qid]) <= k
