"""Exact heavy hitters (operators/heavy.py): MG candidate completeness,
partitioning independence, candidate-volume bound, and the broadcast
plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from redshift_etl_spark.operators import heavy as H


def _skewed(spark, n_parts):
    # zipf-ish: item i appears ~ 3000/i times; plenty of light tail
    rows = []
    for i in range(1, 40):
        rows += [(f"hot{i}",)] * (3000 // i)
    rows += [(f"tail{j}",) for j in range(5000)]
    return spark.createDataFrame(rows, "item string").repartition(n_parts)


def _exact(df, d):
    n = df.count()
    return {
        (r["item"], r["freq"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * d > F.lit(n))
        .collect()
    }


@pytest.mark.parametrize("d", [10, 50, 200])
def test_heavy_hitters_exact(spark, d):
    df = _skewed(spark, 8)
    got = {
        (r["item"], r["freq"])
        for r in H.heavy_hitters(df, "item", d).collect()
    }
    assert got == _exact(df, d)


@pytest.mark.slow
def test_partitioning_independent(spark):
    a = _skewed(spark, 2)
    b = _skewed(spark, 17)
    ra = {tuple(r) for r in H.heavy_hitters(a, "item", 40).collect()}
    rb = {tuple(r) for r in H.heavy_hitters(b, "item", 40).collect()}
    assert ra == rb and ra


@pytest.mark.slow
def test_candidate_bound_and_completeness(spark):
    df = _skewed(spark, 6)
    d = 25
    cands = H.mg_candidates(df, "item", d)
    n_parts = df.rdd.getNumPartitions()
    assert cands.count() <= (d - 1) * n_parts
    heavy_items = {i for i, _ in _exact(df, d)}
    got = {r["item"] for r in cands.collect()}
    assert heavy_items <= got  # provable superset


def test_nulls_ignored_and_small_d(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), (None,), ("b",)], "item string"
    )
    out = H.heavy_hitters(df, "item", 2).collect()  # n=4, need freq>2
    assert [(r["item"], r["freq"]) for r in out] == [("a", 3)]
    with pytest.raises(ValueError):
        H.mg_candidates(df, "item", 1)


def test_plan_broadcasts_candidates_only(spark):
    df = _skewed(spark, 4)
    plan = H.heavy_hitters(df, "item", 30)._jdf.queryExecution().toString()
    # recount filters via a broadcast semi join; the stream itself is
    # never exchanged before that filter
    assert "LeftSemi" in plan and "Broadcast" in plan


# --- property: exactness on arbitrary multisets ----------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    items=st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=300
    ),
    d=st.integers(min_value=2, max_value=12),
    parts=st.integers(min_value=1, max_value=5),
)
@pytest.mark.slow
def test_heavy_hitters_property(spark, items, d, parts):
    df = spark.createDataFrame(
        [(str(i),) for i in items], "item string"
    ).repartition(parts)
    got = {
        (r["item"], r["freq"])
        for r in H.heavy_hitters(df, "item", d).collect()
    }
    n = len(items)
    from collections import Counter

    want = {(k, c) for k, c in Counter(str(i) for i in items).items()
            if c * d > n}
    assert got == want


# --- vocab/encode (operators/text.py additions) ----------------------------

def test_vocab_and_encode_roundtrip(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b zz a"), (3, "c a b")],
        "doc_id long, text string",
    )
    vocab = TX.build_vocab(df, "text", 3)
    v = {r["token"]: (r["token_id"], r["freq"]) for r in vocab.collect()}
    # freq: a=4, b=4, c=2, zz=1 -> top3: a(1), b(2), c(3) (tie a<b)
    assert v == {"a": (1, 4), "b": (2, 4), "c": (3, 2)}
    enc = {
        r["doc_id"]: list(r["ids"])
        for r in TX.encode_ids(df, "doc_id", "text", vocab).collect()
    }
    assert enc == {1: [1, 2, 1, 3], 2: [2, 2, 0, 1], 3: [3, 1, 2]}


@pytest.mark.slow
def test_heavy_hitters_10m_rows_headroom(spark):
    """Scale headroom: 10M synthetic rows with a zipf-ish head; the MG
    candidate pass streams partition-locally and the recount shuffles
    only candidates — wall-bounded sanity plus exactness vs groupBy."""
    import time

    import pyspark.sql.functions as F

    df = spark.range(10_000_000).select(
        F.concat(
            F.lit("k"),
            F.when(F.col("id") % 100 < 60, F.col("id") % 7)  # hot head
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000))),
        ).alias("item")
    )
    d = 20
    t0 = time.time()
    got = {
        (r["item"], r["freq"])
        for r in H.heavy_hitters(df, "item", d).collect()
    }
    wall = time.time() - t0
    n = 10_000_000
    want = {
        (r["item"], r["freq"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * d > F.lit(n))
        .collect()
    }
    assert got == want and len(got) == 7
    assert wall < 120, f"10M-row heavy hitters took {wall:.0f}s"


# --- KMV set sketches (operators/dedup.py) ---------------------------------

def test_kmv_estimate_and_exact_merge(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import dedup as D

    # three sources with controlled overlaps
    rows = []
    for i in range(3000):
        rows.append(("A", f"t{i}"))
    for i in range(1500, 4500):            # J(A,B) = 1500/4500 = 1/3
        rows.append(("B", f"t{i}"))
    for i in range(9000, 12000):           # disjoint from both
        rows.append(("C", f"t{i}"))
    df = spark.createDataFrame(rows, "src string, item string")
    k = 256
    sk = D.kmv_sketches(df, "src", "item", k)
    est = {
        (r["grp_a"], r["grp_b"]): r["jaccard_est"]
        for r in D.kmv_overlap(sk, k).collect()
    }
    assert abs(est[("A", "B")] - 1 / 3) < 0.12
    assert est[("A", "C")] < 0.05 and est[("B", "C")] < 0.05
    # exact mergeability: merge of sketches == sketch of union
    kmv = {r["grp"]: list(r["kmv"]) for r in sk.collect()}
    union_df = df.filter(F.col("src").isin("A", "B")).withColumn(
        "src", F.lit("AB")
    )
    direct = D.kmv_sketches(union_df, "src", "item", k).collect()[0]["kmv"]
    import pyspark.sql.functions as FF  # noqa: F401

    merged = sorted(set(kmv["A"]) | set(kmv["B"]))[:k]
    assert list(direct) == merged


def test_novelty_scores_flag_duplicated_content(spark):
    from redshift_etl_spark.operators.text import novelty_scores

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, shared),                                # exact clone
            (3, "completely different words forming unique trigrams here"),
            (4, shared + " with an extra unique ending clause appended"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           novelty_scores(docs, "doc_id", "text").collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0
    assert 0.0 < out[4]["novelty"] < 1.0
    assert out[3]["n_unique"] == out[3]["n_shingles"]
