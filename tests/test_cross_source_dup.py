"""Cross-source duplication matrix: near-identical docs in different
sources land in that (source, source) cell with high agreement, the
source pair key is order-normalized, and agreement sums are exact
integers (est_jaccard is k/8 by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators.dedup import lsh_candidate_pairs


def _matrix(spark, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    pairs = lsh_candidate_pairs(docs, "doc_id", "text", 8, 2, 3)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(src.alias("a"), pairs["doc_a"] == F.col("a.doc_id"))
        .join(src.alias("b"), pairs["doc_b"] == F.col("b.doc_id"))
        .select(
            F.least(F.col("a.source"), F.col("b.source")).alias("src_lo"),
            F.greatest(F.col("a.source"), F.col("b.source")).alias("src_hi"),
            (F.col("est_jaccard") * 8).cast("long").alias("agree"),
        )
        .collect()
    )


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_cross_source_near_dup_lands_in_cell(spark):
    out = _matrix(
        spark,
        [
            (1, BASE, "web"),
            (2, BASE + " extra", "mirror"),  # near-dup of 1, other source
            (3, "completely different words about spark shuffles", "web"),
        ],
    )
    cells = {(r["src_lo"], r["src_hi"]) for r in out}
    assert ("mirror", "web") in cells  # order-normalized: lo < hi
    hit = [r for r in out if (r["src_lo"], r["src_hi"]) == ("mirror", "web")]
    assert all(0 <= r["agree"] <= 8 for r in hit)
    assert any(r["agree"] >= 6 for r in hit)  # near-dup agrees on most rows


def test_agreement_is_exact_integer(spark):
    # identical text ⇒ identical signatures ⇒ agree == 8 exactly
    out = _matrix(spark, [(1, BASE, "s1"), (2, BASE, "s2")])
    assert [r["agree"] for r in out] == [8]
