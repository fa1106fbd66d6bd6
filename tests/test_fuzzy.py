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


def test_incremental_index_equals_full_lsh_cross_pairs(spark):
    """index-probe(increment) must find exactly the cross-slice subset
    of the batch LSH pairs, and appending the increment's index rows
    then probing a second increment keeps the ledger consistent."""
    from redshift_etl_spark.operators import dedup as D2

    texts = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "completely different text about spark and parquet files"),
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "another unrelated document mentioning warehouses only"),
        (6, "completely different text about spark and parquet files"),
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    stored = docs.filter("doc_id <= 3")
    inc1 = docs.filter("doc_id IN (4, 5)")
    inc2 = docs.filter("doc_id = 6")

    idx = D2.minhash_index(stored, "doc_id", "text")
    pairs1, rows1 = D2.incremental_near_dups(idx, inc1, "doc_id", "text")
    got1 = sorted((r["doc_a"], r["doc_b"]) for r in pairs1.collect())
    # full-batch reference: banded pairs across the whole corpus,
    # restricted to stored x inc1
    full = D2.lsh_candidate_pairs(docs, "doc_id", "text")
    want1 = sorted(
        (r["doc_a"], r["doc_b"])
        for r in full.collect()
        if r["doc_a"] <= 3 and r["doc_b"] in (4, 5)
    )
    assert got1 == want1 and (1, 4) in got1  # exact dup found via index
    # est_jaccard for the exact duplicate is 1.0
    ej = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs1.collect()}
    assert ej[(1, 4)] == 1.0

    # append the increment's rows -> next day's index
    idx2 = idx.unionByName(rows1)
    pairs2, _ = D2.incremental_near_dups(idx2, inc2, "doc_id", "text")
    got2 = sorted((r["doc_a"], r["doc_b"]) for r in pairs2.collect())
    want2 = sorted(
        (r["doc_a"], r["doc_b"])
        for r in full.collect()
        if r["doc_b"] == 6
    )
    assert got2 == want2 and (3, 6) in got2
