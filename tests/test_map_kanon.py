"""map_at_k and k_anonymity (wave-3 r10) — hand-checked semantics."""

from __future__ import annotations

from redshift_etl_spark.operators.distsort import map_at_k
from redshift_etl_spark.operators.quality import k_anonymity


def test_map_hand_check(spark):
    # group g: ranked by score desc -> ids 1..5, rel at ranks 1, 3, 5
    # AP@10 = (1/1 + 2/3 + 3/5) / 3
    rows = [
        ("g", 5.0, 1, True),
        ("g", 4.0, 2, False),
        ("g", 3.0, 3, True),
        ("g", 2.0, 4, False),
        ("g", 1.0, 5, True),
    ]
    df = spark.createDataFrame(rows, "grp: string, s: double, id: long, y: boolean")
    r = map_at_k(df, "grp", "s", "id", "y", k=10).collect()[0]
    expected_micro = (
        round(1 / 1 * 1e6) + round(2 / 3 * 1e6) + round(3 / 5 * 1e6)
    )
    assert r["n_rel"] == 3 and r["ap_micro"] == expected_micro
    assert r["ap"] == expected_micro / (3 * 1e6)


def test_map_k_cut_and_trec_normalizer(spark):
    # 15 relevant items ranked 1..15; k=10 -> only first 10 terms count,
    # normalizer is min(R, k) = 10, so AP = 1.0 (perfect top-k)
    rows = [("g", float(100 - i), i, True) for i in range(15)]
    df = spark.createDataFrame(rows, "grp: string, s: double, id: long, y: boolean")
    r = map_at_k(df, "grp", "s", "id", "y", k=10).collect()[0]
    assert r["ap"] == 1.0 and r["n_rel"] == 15


def test_map_no_relevant_is_null(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1, False), ("g", 2.0, 2, False)],
        "grp: string, s: double, id: long, y: boolean",
    )
    r = map_at_k(df, "grp", "s", "id", "y").collect()[0]
    assert r["ap"] is None and r["ap_micro"] == 0


def test_k_anonymity_hand_check(spark):
    # groups: (a,x) n=12 l=2; (a,y) n=3 l=1; (b,x) n=5 l=3
    rows = (
        [("a", "x", i % 2) for i in range(12)]
        + [("a", "y", 7)] * 3
        + [("b", "x", s) for s in (1, 2, 3, 1, 2)]
    )
    df = spark.createDataFrame(rows, "q1: string, q2: string, sens: int")
    r = k_anonymity(df, ["q1", "q2"], "sens", k=10).collect()[0]
    assert r["n_rows"] == 20 and r["n_groups"] == 3
    assert r["min_group_size"] == 3
    assert r["n_small_groups"] == 2 and r["n_rows_at_risk"] == 8
    assert r["min_l_diversity"] == 1
    assert r["n_singleton_sensitive_groups"] == 1
