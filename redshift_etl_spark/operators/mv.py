"""Incremental materialized-view maintenance.

A 100 TB fact table's aggregate dashboard cannot be refreshed by
re-scanning the world; the warehouse answer is an incrementally
maintained MV: keep the aggregate table keyed by group, and fold each
append-only delta batch in by merging PARTIAL aggregates — cost
proportional to the delta, not the base (the reference's pipelines
rebuild aggregates per run; this is the scale replacement).

Only self-mergeable aggregates qualify without retraction support:
COUNT and SUM add, MIN/MAX combine via least/greatest. AVG is stored
as (sum, count) and derived on read — never maintained directly
(averages don't merge). The invariant the oracle checks:

    maintain(mv(base), delta) ≡ mv(base ∪ delta)   (hash-exact)

so an MV maintained over any sequence of appends equals the full
recompute at every step, on any engine. HASH-exact requires the
summed columns to be exact types (BIGINT/DECIMAL — e.g. the repo's
round-to-cents-then-BIGINT policy): integer addition is associative,
so partial-merge order cannot matter. A raw DOUBLE sum folds in a
different association order than a full recompute and drifts by ulps
— pre-scale to integers before feeding a column into ``sum_cols``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_mv", "maintain_agg_mv"]


def _agg_exprs(
    count_name: str,
    sum_cols: Sequence[str],
    min_cols: Sequence[str],
    max_cols: Sequence[str],
):
    exprs = [F.count(F.lit(1)).cast("long").alias(count_name)]
    exprs += [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    exprs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    exprs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    return exprs


def agg_mv(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_name: str = "n_rows",
) -> DataFrame:
    """Build the MV from scratch: one hash aggregate. Column layout is
    the maintenance contract — `maintain_agg_mv` merges exactly these
    columns."""
    return df.groupBy(*keys).agg(
        *_agg_exprs(count_name, sum_cols, min_cols, max_cols)
    )


def maintain_agg_mv(
    mv: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    count_name: str = "n_rows",
) -> DataFrame:
    """Fold an append-only ``delta`` batch into an existing MV:
    aggregate the delta (cost ∝ |delta|), then merge partials with the
    stored MV by group — a union + one hash aggregate over
    |mv| + |delta groups| rows, never touching the base table. SUM/
    COUNT add; MIN/MAX combine (correct because appends only narrow
    upward — deletes would need retraction counts, deliberately out of
    contract). New groups appear automatically; untouched groups pass
    through the merge unchanged."""
    delta_mv = agg_mv(
        delta, keys, sum_cols, min_cols, max_cols, count_name
    )
    merged = mv.unionByName(delta_mv)
    return merged.groupBy(*keys).agg(
        F.sum(count_name).cast("long").alias(count_name),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        *[F.min(f"min_{c}").alias(f"min_{c}") for c in min_cols],
        *[F.max(f"max_{c}").alias(f"max_{c}") for c in max_cols],
    )
