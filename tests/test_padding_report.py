"""`sampling.batch_padding_report` edge semantics: hand-computed slot
accounting, partial tail batches padding to their own occupancy, the
uniform-length zero-waste case, and partition invariance."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from redshift_etl_spark.operators.sampling import batch_padding_report


def _rows(spark, lens):
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lens)], "doc_id long, n long"
    )
    out = batch_padding_report(df, "doc_id", F.col("n"), 2)
    return {r.strategy: r.asDict() for r in out.collect()}


def test_hand_computed_batches_of_two(spark):
    # arrival order (by id): [10, 2], [8, 4] -> slots 20+16, pad 8+4
    # length-sorted: [2, 4], [8, 10] -> slots 8+20, pad 2+2
    got = _rows(spark, [10, 2, 8, 4])
    a = got["arrival"]
    assert (a["n_batches"], a["total_tokens"], a["padded_slots"]) == (
        2, 24, 12,
    )
    assert a["pad_ratio"] == 12 / 36
    s = got["length_sorted"]
    assert (s["n_batches"], s["padded_slots"]) == (2, 4)
    assert s["pad_ratio"] == 4 / 28


def test_partial_tail_batch_pads_to_own_occupancy(spark):
    # 3 rows, batch 2: tail batch has ONE row -> zero pad for it
    got = _rows(spark, [5, 1, 9])
    a = got["arrival"]  # [5,1] pad 4; [9] pad 0
    assert a["padded_slots"] == 4 and a["n_batches"] == 2


def test_uniform_lengths_waste_nothing_either_way(spark):
    got = _rows(spark, [7] * 10)
    for strat in ("arrival", "length_sorted"):
        assert got[strat]["padded_slots"] == 0
        assert got[strat]["pad_ratio"] == 0.0


@pytest.mark.slow
def test_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 90 + 10) for i in range(101)],
        "doc_id long, n long",
    )
    a = batch_padding_report(
        df.repartition(13), "doc_id", F.col("n"), 8
    ).collect()
    b = batch_padding_report(
        df.coalesce(1), "doc_id", F.col("n"), 8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # length-sorted can never waste more than arrival order
    d = {r.strategy: r.padded_slots for r in a}
    assert d["length_sorted"] <= d["arrival"]
