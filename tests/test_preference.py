"""Preference-pair assembly contracts: deterministic tie-breaks,
singleton-group exclusion, exact cents margins, and the one-shuffle
plan (window and pivot aggregate share the group partitioning)."""

from __future__ import annotations

from redshift_etl_spark import plans as P
from redshift_etl_spark.operators.preference import preference_pairs


def _pool(spark):
    rows = [
        # prompt g1: clear winner, loser picked by id tie-break (2<5)
        ("g1", 1, 3.00),
        ("g1", 2, 1.50),
        ("g1", 5, 1.50),
        # prompt g2: reward tie at the top -> chosen is smaller id
        ("g2", 7, 2.00),
        ("g2", 3, 2.00),
        # prompt g3: singleton -> no pair
        ("g3", 9, 4.00),
    ]
    return spark.createDataFrame(rows, "g string, id long, reward double")


def test_pairs_semantics_and_tiebreaks(spark):
    out = {
        r["g"]: r
        for r in preference_pairs(_pool(spark), ["g"], "id", "reward").collect()
    }
    assert set(out) == {"g1", "g2"}  # singleton g3 excluded
    g1 = out["g1"]
    assert (g1["chosen_id"], g1["rejected_id"]) == (1, 2)
    assert (g1["chosen_cents"], g1["rejected_cents"]) == (300, 150)
    assert g1["margin_cents"] == 150
    g2 = out["g2"]
    assert (g2["chosen_id"], g2["rejected_id"]) == (3, 7)
    assert g2["margin_cents"] == 0


def test_pairs_partition_invariant(spark):
    df = _pool(spark)
    a = sorted(map(tuple, preference_pairs(df.coalesce(1), ["g"], "id", "reward").collect()))
    b = sorted(map(tuple, preference_pairs(df.repartition(7), ["g"], "id", "reward").collect()))
    assert a == b


def test_pairs_single_shuffle(spark):
    df = preference_pairs(_pool(spark), ["g"], "id", "reward")
    assert (
        P.tree_count(df, "Exchange") - P.tree_count(df, "BroadcastExchange")
        <= 1
    )
