"""dedup.cosine_pairs_prefix: lossless t^2-overlap prefix bound vs the
brute-force all-shingle join, and the size-ratio tolerance that
motivates cosine over Jaccard."""

from __future__ import annotations

import itertools
import math

from redshift_etl_spark.operators.dedup import (
    cosine_pairs_prefix,
    exploded_shingles,
)


def _brute(spark, df, t):
    sh = {
        r["doc_id"]: set()
        for r in df.select("doc_id").collect()
    }
    for r in exploded_shingles(df, "doc_id", "text", 3).collect():
        sh[r["doc_id"]].add(r["shingle"])
    out = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        if not sh[a] or not sh[b]:
            continue
        c = len(sh[a] & sh[b]) / math.sqrt(len(sh[a]) * len(sh[b]))
        if c >= t:
            out[(a, b)] = round(c, 9)
    return out


def test_prefix_is_lossless_vs_brute_force(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base + " plus a tail of new words here"),   # embedded copy
        (3, base),                                       # exact dup
        (4, "totally different content with no overlap at all kept"),
        (5, "the quick brown fox jumps over something else entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): round(r["cosine"], 9)
        for r in cosine_pairs_prefix(df, "doc_id", "text", 0.6).collect()
    }
    assert got == _brute(spark, df, 0.6)
    assert (1, 3) in got and got[(1, 3)] == 1.0  # exact dup at cos 1


def test_cosine_tolerates_size_ratio_where_jaccard_halves(spark):
    from redshift_etl_spark.operators.dedup import jaccard_pairs

    base = " ".join(f"w{i}" for i in range(20))
    doubled = base + " " + " ".join(f"x{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, base), (2, doubled)], "doc_id long, text string"
    )
    cos = cosine_pairs_prefix(df, "doc_id", "text", 0.6).collect()
    jac = jaccard_pairs(df, "doc_id", "text", threshold=0.6).collect()
    # 18 shared shingles of 18 vs 38: cos = 18/sqrt(18*38) ~ 0.688,
    # jaccard = 18/38 ~ 0.47 — cosine keeps the pair, jaccard drops it
    assert len(cos) == 1 and len(jac) == 0
