"""Fuzzy string join — edit-distance ≤ 1 pairs WITHOUT a cross
product.

The partition lemma (PassJoin/Ed-Join family): split any string a into
a prefix x of length ⌈|a|/2⌉ and the remaining suffix y. A single edit
falls entirely in x or in y, so any b with ed(a,b) ≤ 1 shares EITHER
a's exact prefix x (aligned at the start) OR a's exact suffix y
(aligned at the end). Candidate generation is therefore a pure
equi-join on half-fragments — provably LOSSLESS for the threshold (the
all-pairs oracle equality is the proof), with no O(n²) anywhere.

Each string emits ≤ 6 keys: (prefix, h) and (suffix, g) for the three
possible partner lengths |b| ∈ {|a|−1, |a|, |a|+1} (h = ⌈(|b|)/2⌉
candidates, g = ⌊(|b|)/2⌋ candidates). Shared fragments hash-join;
survivors verify with one exact levenshtein per DISTINCT pair.

Scale: fragment buckets are the only fan-out; popular half-strings
(catalog boilerplate names) are hot keys — exactly the shape AQE
skew-split handles (see test_aqe_skew). Verification cost is bounded by
candidates, not n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _half_keys(str_col: str) -> F.Column:
    """The ≤6 candidate keys per string, as an array of structs."""
    keys = []
    for d in (-1, 0, 1):
        # aligned prefix for a partner of length L+d: h = ceil((L+d)/2)
        h = f"(length({str_col}) + {d} + 1) div 2"
        keys.append(
            F.struct(
                F.lit("P").alias("kind"),
                F.expr(h).cast("int").alias("n"),
                F.expr(f"substring({str_col}, 1, {h})").alias("frag"),
            )
        )
        # aligned suffix: g = floor((L+d)/2)
        g = f"(length({str_col}) + {d}) div 2"
        keys.append(
            F.struct(
                F.lit("S").alias("kind"),
                F.expr(g).cast("int").alias("n"),
                F.expr(f"right({str_col}, {g})").alias("frag"),
            )
        )
    return F.array_distinct(F.array(*keys))


def fuzzy_join_lev1(
    df: DataFrame, id_col: str, str_col: str
) -> DataFrame:
    """(id_a, id_b, lev) pairs over the DISTINCT values of ``str_col``
    with levenshtein ≤ 1, each value represented by its minimum id,
    id_a < id_b. Exact — candidate generation loses nothing
    (partition lemma).

    Distinct-first is load-bearing, not a shortcut: real name/title
    columns are duplicate-heavy (the sf0.1 part table holds 20k rows
    over 64 distinct names), and row-level pair semantics square BOTH
    the candidate buckets and the output itself (3.9M pairs there, 91 s
    even brute-forced). Value-level pairs are the useful answer —
    "which name variants are near-misses" — and expanding to row pairs
    is a cheap join-back on the string for callers that truly want the
    cross product. Exact-duplicate rows (lev 0) are `dedup_exact`'s
    job, not a fuzzy join's."""
    reps = df.groupBy(str_col).agg(F.min(id_col).alias("__rep"))
    tagged = reps.select(
        F.col("__rep").alias("id"),
        F.col(str_col).alias("s"),
        F.explode(_half_keys(str_col)).alias("k"),
    )
    a = tagged.select(
        F.col("id").alias("id_a"), F.col("s").alias("s_a"), "k"
    )
    b = tagged.select(
        F.col("id").alias("id_b"), F.col("s").alias("s_b"), "k"
    )
    cand = (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", F.levenshtein("s_a", "s_b").alias("lev")
    ).filter(F.col("lev") <= 1)
