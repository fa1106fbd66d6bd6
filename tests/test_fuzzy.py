"""Fuzzy string join (operators/fuzzy.py) — partition-lemma exactness."""

from __future__ import annotations

import pytest

from redshift_etl_spark.operators import fuzzy as FZ


def _pairs(spark, strings):
    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )
    return {
        (r["id_a"], r["id_b"], r["lev"])
        for r in FZ.fuzzy_join_lev1(df, "id", "s").collect()
    }


def test_each_edit_kind_found(spark):
    # substitution, deletion, insertion — in prefix AND suffix halves
    got = _pairs(
        spark,
        [
            "kettle",    # 0
            "kattle",    # 1: substitution in prefix half
            "kettke",    # 2: substitution in suffix half
            "kettl",     # 3: deletion at end
            "ettle",     # 4: deletion at start
            "xkettle",   # 5: insertion at start
            "kettlex",   # 6: insertion at end
            "distant",   # 7: unrelated
        ],
    )
    found = {(a, b) for a, b, _ in got}
    for other in (1, 2, 3, 4, 5, 6):
        assert (0, other) in found, f"missed pair (0, {other})"
    assert not any(7 in (a, b) for a, b in found)


def test_identical_strings_collapse_to_one_value(spark):
    # value-level contract: exact duplicates are dedup_exact's job —
    # a fuzzy join over one distinct value has no pairs at all
    assert _pairs(spark, ["same", "same", "same"]) == set()


def test_duplicates_use_min_id_representative(spark):
    got = _pairs(spark, ["kettle", "kettle", "kettlex", "kettlex"])
    assert got == {(0, 2, 1)}


def test_matches_bruteforce_on_random_fixture(spark):
    """Lossless vs an in-python brute force on adversarial short
    strings (the tight-length cases where off-by-one alignment bugs
    live)."""
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    strings = ["ab", "a", "b", "abc", "abd", "acb", "ba", "aab",
               "x", "", "xy", "ax"]  # all distinct → ids are the reps
    expect = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(strings), 2)
        if lev(a, b) <= 1
    }
    assert _pairs(spark, strings) == expect


def test_no_cross_product_plan(spark):
    from redshift_etl_spark import plans as P

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "id long, s string"
    )
    out = FZ.fuzzy_join_lev1(df, "id", "s")
    assert not P.has_cross_product(out)


def test_empty_strings_participate(spark):
    # empty halves produce empty-fragment keys; "" is lev-1 from "a"
    got = _pairs(spark, ["", "", "a"])
    assert got == {(0, 2, 1)}
