"""Bucketed range join — point-in-interval joins at scale.

The reference has no range joins (SURVEY §2.3: "theta/range/as-of/
interval joins: not present"); this is a north-star operator a
training-data pipeline needs (e.g. events within incident windows,
records within validity periods).

Why not a plain non-equi join: Spark plans `p.ts BETWEEN i.start AND
i.end` with no equi-key as BroadcastNestedLoopJoin (OK only when one
side broadcasts) or CartesianProduct — O(|P|·|I|) at 100 TB.

The scale path quantizes the domain into fixed-width buckets:

- each point lands in exactly ONE bucket: ``floor(p / w)``
- each interval explodes into EVERY bucket it overlaps:
  ``sequence(floor(start/w), floor(end/w))``
- equi-join on the bucket (ordinary shuffle hash/sort-merge join,
  AQE-skew-splittable), then the exact predicate
  ``start <= p < end`` filters false candidates.

Each qualifying (point, interval) pair meets in exactly one bucket —
the point's — so no post-join dedup is needed. Pick ``bucket_width``
near the typical interval length: the interval side then explodes into
O(1) rows each, and the candidate join degenerates to ~one bucket of
points per interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: Column | str,
    start_on: Column | str,
    end_on: Column | str,
    bucket_width: float,
    how: str = "inner",
    point_key: str | None = None,
) -> DataFrame:
    """Join each point row to every interval row whose half-open range
    ``[start, end)`` contains it.

    ``point_on`` / ``start_on`` / ``end_on`` are NUMERIC expressions
    over ``points`` resp. ``intervals`` (timestamps: pass epoch
    seconds — truncation is safe because the exact predicate runs on
    the original expressions). Output columns = points ⧺ intervals;
    names must not collide (select/alias beforehand).

    ``how``: ``inner``, or ``left`` (keeps unmatched points with NULL
    interval columns; requires ``point_key``, a unique non-null column
    of ``points``, for the NULL-safe re-attach anti-join).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    if how == "left" and not point_key:
        raise ValueError("how='left' requires point_key")
    p_val, s_val, e_val = _c(point_on), _c(start_on), _c(end_on)

    pb = points.withColumn(_BUCKET, F.floor(p_val / F.lit(bucket_width)))
    ib = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(s_val / F.lit(bucket_width)),
                F.floor(e_val / F.lit(bucket_width)),
            )
        ),
    )
    contained = (p_val >= s_val) & (p_val < e_val)
    if how == "inner":
        return pb.join(ib, [_BUCKET], "inner").where(contained).drop(_BUCKET)
    # left: bucket-join candidates, exact-filter, then re-attach misses.
    # (A direct left join on [bucket AND contained] would duplicate a
    # point once per overlapped-but-unmatched bucket; this two-step
    # keeps exactly one NULL row per unmatched point.)
    hits = pb.join(ib, [_BUCKET], "inner").where(contained).drop(_BUCKET)
    misses = points.join(hits.select(point_key), [point_key], "left_anti")
    return hits.unionByName(misses, allowMissingColumns=True)


def bucket_width_advisor(
    intervals: DataFrame,
    start_on: Column | str,
    end_on: Column | str,
) -> DataFrame:
    """Pre-flight advisor for `range_join`/`interval_overlap_join`'s
    one tuning knob: recommends ``bucket_width`` ≈ the MEDIAN interval
    length (the docstrings' "near the typical interval length" rule,
    measured instead of guessed). Too-small widths explode the interval
    side into many buckets; too-large widths pack many false candidates
    per bucket — the median balances the two for unimodal length
    distributions; for heavy-tailed ones the p90 row here says so
    (choose nearer p90 when p90 ≫ median and the long intervals
    dominate the join's cost).

    One aggregate over the intervals frame. Returns a 1-row frame:
    (n_intervals, min_len, median_len, p90_len, recommended_width)."""
    s, e = _c(start_on), _c(end_on)
    length = (e - s).cast("double")
    return intervals.agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.min(length).alias("min_len"),
        F.percentile(length, F.lit(0.5)).alias("median_len"),
        F.percentile(length, F.lit(0.9)).alias("p90_len"),
        F.greatest(
            F.lit(1.0), F.percentile(length, F.lit(0.5))
        ).alias("recommended_width"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: Column | str,
    l_end: Column | str,
    r_start: Column | str,
    r_end: Column | str,
    bucket_width: float,
) -> DataFrame:
    """Join every left interval to every right interval it OVERLAPS —
    half-open semantics: ``l_start < r_end AND r_start < l_end`` (the
    sessions × incidents / campaigns × outages shape `range_join`'s
    point-in-interval form can't express).

    Scale shape: both sides explode to the buckets their span covers
    (fan-out = span/width + 1 per row, bounded by the caller's width
    choice), then one shuffle equi-join on the bucket key. Every
    overlapping pair shares the bucket of ``max(l_start, r_start)`` —
    the later start lies inside both intervals, so both sides cover
    that bucket — and the pair is emitted ONLY from it: deduplication
    by arithmetic ownership, no dropDuplicates shuffle, no pair ever
    built twice. Output columns = left ⧺ right; names must not
    collide (select/alias beforehand)."""
    ls, le = _c(l_start), _c(l_end)
    rs, re_ = _c(r_start), _c(r_end)
    lb = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(ls / F.lit(bucket_width)),
                F.floor(le / F.lit(bucket_width)),
            )
        ),
    )
    rb = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(rs / F.lit(bucket_width)),
                F.floor(re_ / F.lit(bucket_width)),
            )
        ),
    )
    overlap = (ls < re_) & (rs < le)
    owner = F.floor(F.greatest(ls, rs) / F.lit(bucket_width)) == F.col(
        _BUCKET
    )
    return lb.join(rb, [_BUCKET], "inner").where(overlap & owner).drop(
        _BUCKET
    )
