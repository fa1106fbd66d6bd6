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
