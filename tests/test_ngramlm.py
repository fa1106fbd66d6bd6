"""Hashed bigram perplexity contracts: reference-style documents
score strictly lower NLL than off-distribution ones, the model grid
is dense and smoothed, bigram formation is exact and shuffle-free,
and the integer scores are partition- and rerun-invariant."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from redshift_etl_spark.operators import ngramlm as NG


def _corpus(spark):
    """Reference corpus repeats one fixed sentence; half the pool
    repeats it too, half is token salad from a disjoint vocabulary
    (bigrams the model has never seen)."""
    rows = []
    ref = "the cat sat on the mat"
    odd = "zulu quartz vex jumbo wick glyph"
    for i in range(10):
        rows.append((i, ref, "ref"))
    for i in range(10, 25):
        rows.append((i, ref, "pool"))
    for i in range(25, 40):
        rows.append((i, odd, "pool"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_bigram_stream_pairs_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["w1"], r["w2"])
        for r in NG.bigram_stream(df, "doc_id", "text").collect()
    }
    # only doc 1 has >= 2 tokens; pairs are consecutive and ordered
    assert got == {(1, "a", "b"), (1, "b", "c")}


def test_model_grid_dense_and_smoothed(spark):
    bg = NG.bigram_stream(
        _corpus(spark).filter(F.col("kind") == "ref"), "doc_id", "text"
    )
    rows = NG.nll_table(bg, 8, 8).collect()
    assert len(rows) == 64  # dense C x W grid, even for tiny corpora
    # every cell is a positive NLL; unseen contexts get uniform -ln(1/W)
    uniform = round(-math.log(1.0 / 8) * NG.SCALE)
    nlls = {(r["bc"], r["bw"]): r["nll_micro"] for r in rows}
    assert all(v > 0 for v in nlls.values())
    seen_ctx = {
        r["bc"]
        for r in bg.withColumn("bc", NG.token_bucket("w1", 8))
        .select("bc")
        .distinct()
        .collect()
    }
    for (bc, _), v in nlls.items():
        if bc not in seen_ctx:
            assert v == uniform


def test_reference_like_scores_strictly_lower(spark):
    df = _corpus(spark)
    scored = NG.perplexity_scores(
        df, "doc_id", "text", F.col("kind") == "ref"
    ).collect()
    by_id = {r["doc_id"]: (r["nll_micro"], r["n_bigrams"]) for r in scored}
    assert set(by_id) == set(range(10, 40))  # pool docs only, ref excluded
    ref_scores = {by_id[i][0] for i in range(10, 25)}
    odd_scores = {by_id[i][0] for i in range(25, 40)}
    assert len(ref_scores) == 1 and len(odd_scores) == 1
    assert max(ref_scores) < min(odd_scores)
    assert by_id[10][1] == 5  # six tokens -> five bigrams


def test_scores_partition_and_rerun_invariant(spark):
    df = _corpus(spark)
    ref = F.col("kind") == "ref"
    one = sorted(
        (r["doc_id"], r["nll_micro"])
        for r in NG.perplexity_scores(df.coalesce(1), "doc_id", "text", ref).collect()
    )
    many = sorted(
        (r["doc_id"], r["nll_micro"])
        for r in NG.perplexity_scores(
            df.repartition(7, "doc_id"), "doc_id", "text", ref
        ).collect()
    )
    assert one == many
    again = sorted(
        (r["doc_id"], r["nll_micro"])
        for r in NG.perplexity_scores(df, "doc_id", "text", ref).collect()
    )
    assert one == again


def test_nll_is_exact_integer_replay(spark):
    """Replay the doc score in Python from the model table: the Spark
    sum must equal the integer sum of cell values exactly."""
    df = _corpus(spark)
    ref = F.col("kind") == "ref"
    bg = NG.bigram_stream(df.filter(ref), "doc_id", "text")
    model = {
        (r["bc"], r["bw"]): r["nll_micro"]
        for r in NG.nll_table(bg).collect()
    }
    pool_bg = NG.bigram_stream(
        df.filter(~ref & (F.col("doc_id") == 25)), "doc_id", "text"
    )
    cells = [
        model[(r["bc"], r["bw"])]
        for r in pool_bg.withColumn("bc", NG.token_bucket("w1"))
        .withColumn("bw", NG.token_bucket("w2"))
        .collect()
    ]
    got = (
        NG.perplexity_scores(df, "doc_id", "text", ref)
        .filter(F.col("doc_id") == 25)
        .collect()[0]
    )
    assert got["nll_micro"] == sum(cells)
    assert got["n_bigrams"] == len(cells)
