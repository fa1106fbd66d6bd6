"""Gopher/C4 quality-rule contracts: each published screen flips on the
documents it was designed to catch, thresholds are exact-integer (no
float boundary), and the whole report stays a zero-shuffle projection.
The synthetic documents table is single-line punctuation-free text, so
the line/symbol/C4 rules are exercised here on adversarial fixtures
(the oracle twin proves cross-engine parity of the full expressions).
"""

from __future__ import annotations

from redshift_etl_spark import plans as P
from redshift_etl_spark import queries as Q
from redshift_etl_spark.operators.text import gopher_rules

from .conftest import SF_ORACLE

GOOD = ["the", "and"] + ["solid"] * 58  # 60 words, mean len ~4.9


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df, "doc_id", "text").collect()}


def test_each_rule_flips_on_its_target(spark):
    out = _run(
        spark,
        [
            (1, " ".join(GOOD)),
            (2, " ".join(GOOD[:10])),                      # too short
            (3, "\n".join("- aa bb cc" for _ in range(10))),   # all bullets
            (4, "\n".join(
                ("x ends here..." if i < 4 else "x ends here")
                for i in range(10)
            )),                                             # 40% ellipsis lines
            (5, " ".join(GOOD) + " Lorem Ipsum dolor"),     # C4 lorem (case-folded)
            (6, " ".join(GOOD) + " function() { return }"),  # C4 brace
            (7, " ".join(["aaa"] * 18 + ["#"] * 3)),        # symbol ratio 3/21
            (8, " ".join(["abcdefghijklmno"] * 60)),        # mean word len 15
            (9, " ".join(["solid"] * 60)),                  # no required stopwords
            (10, " ".join(["the", "and"] + ["word"] * 38 + ["123"] * 20)),  # 33% non-alpha
        ],
    )
    assert out[1]["keep"] == 1
    assert all(v == 1 for k, v in out[1].items() if k.startswith("r_"))
    assert out[2]["r_word_count"] == 0 and out[2]["keep"] == 0
    assert out[3]["r_bullet_lines"] == 0
    assert out[4]["r_ellipsis_lines"] == 0
    assert out[5]["r_no_lorem"] == 0
    assert out[6]["r_no_brace"] == 0
    assert out[7]["r_symbol_ratio"] == 0
    assert out[8]["r_mean_word_len"] == 0
    assert out[9]["r_stopwords"] == 0
    assert out[10]["r_alpha_words"] == 0


def test_exact_integer_boundaries(spark):
    # 30% ellipsis lines is KEEP (<=), 10% symbols is KEEP (<=),
    # exactly 80% alpha is KEEP (>=), exactly 2 stopwords is KEEP (>=)
    out = _run(
        spark,
        [
            (1, "\n".join(
                ("x y..." if i < 3 else "x y") for i in range(10)
            )),
            (2, " ".join(["aaa"] * 9 + ["#"])),     # 1 symbol / 10 words
            (3, " ".join(["word"] * 48 + ["123"] * 12)),  # 48/60 = 80%
            (4, " ".join(["the", "and"] + ["solid"] * 58)),
        ],
    )
    assert out[1]["r_ellipsis_lines"] == 1
    assert out[2]["r_symbol_ratio"] == 1
    assert out[3]["r_alpha_words"] == 1
    assert out[4]["r_stopwords"] == 1


def test_unicode_ellipsis_glyph(spark):
    # '…' counts both as a symbol glyph and as a line-ending ellipsis
    out = _run(spark, [(1, "aa bb…\ncc dd…")])
    assert out[1]["r_ellipsis_lines"] == 0  # 2/2 lines end with …
    assert out[1]["r_symbol_ratio"] == 0    # 2 glyphs / 4 words > 0.1


def test_gopher_report_pure_projection(spark):
    df = Q.all_queries()["gopher_quality_rules"](spark, SF_ORACLE)
    assert P.count_shuffles(df) == 0
    scans = P.scanned_columns(df)
    assert scans and all(set(s) <= {"doc_id", "text"} for s in scans)
