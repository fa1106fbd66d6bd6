"""`text.phrase_match_counts`: positional adjacency semantics —
overlapping matches, repeated-word phrases, longer phrases, and the
0-based first_pos contract."""

from __future__ import annotations

from redshift_etl_spark.operators.text import phrase_match_counts


def _res(spark, rows, phrase):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_match_counts(df, "doc_id", "text", phrase)
    return {r.doc_id: (r.n_matches, r.first_pos) for r in out.collect()}


def test_basic_adjacency_and_position(spark):
    got = _res(
        spark,
        [(1, "x spark merge y"), (2, "spark y merge"), (3, "merge spark")],
        ("spark", "merge"),
    )
    # doc 2 has both words but not adjacent; doc 3 has them reversed
    assert got == {1: (1, 1)}


def test_overlapping_repeated_word_phrase(spark):
    # "a a a" contains "a a" at starts 0 AND 1 — overlaps both count
    got = _res(spark, [(1, "a a a")], ("a", "a"))
    assert got == {1: (2, 0)}


def test_three_token_phrase(spark):
    got = _res(
        spark,
        [(1, "u v w z u v w"), (2, "u v z w")],
        ("u", "v", "w"),
    )
    assert got == {1: (2, 0)}


def test_multiple_disjoint_matches_counted(spark):
    got = _res(spark, [(1, "p q x p q y p q")], ("p", "q"))
    assert got == {1: (3, 0)}
