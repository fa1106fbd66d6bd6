"""Preference-pair assembly for RLHF / DPO training data.

Given a pool of candidate responses grouped by prompt (any grouping
key) with a scalar reward, emit one (chosen, rejected) pair per
group: the two top-reward candidates, higher reward chosen, with a
deterministic id tie-break so reruns and engines agree row-for-row.

Rewards are compared as raw doubles (IEEE comparison is exact and
engine-portable) but EMITTED in integer cents — the repo's policy of
never shipping an unrounded double through an aggregate boundary.

Scale posture: ONE hash shuffle on the group key. The top-2 rank
window and the pivot-to-pair aggregate share the same partitioning
(`partitionBy(group) == groupBy(group)`), so Catalyst reuses the
exchange — the window's sort is per-group within partitions, never
global. Groups of any size stream through; state per group is the
rank window's sort run, bounded by the largest prompt's candidate
count (candidates-per-prompt is small by construction in RLHF
pipelines — this is not the place a 10 TB group appears).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def preference_pairs(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    reward_col: str,
    cents_scale: int = 100,
) -> DataFrame:
    """One (chosen, rejected) pair per group holding ≥ 2 candidates.

    Selection order is (reward DESC, id ASC): rank 1 is chosen, rank 2
    rejected. Ties on reward fall to the smaller id — fully
    deterministic. Returns the group columns plus chosen_id,
    rejected_id, chosen_cents, rejected_cents, margin_cents (rewards
    ×cents_scale, rounded once, as BIGINT)."""
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(
        F.col(reward_col).desc(), F.col(id_col)
    )
    cents = F.round(F.col(reward_col) * cents_scale, 0).cast("long")
    ranked = df.select(
        *gcols,
        F.col(id_col),
        cents.alias("__cents"),
        F.row_number().over(w).alias("__rn"),
    ).filter(F.col("__rn") <= 2)
    top2 = lambda rn, c: F.max(F.when(F.col("__rn") == rn, F.col(c)))  # noqa: E731
    return (
        ranked.groupBy(*gcols)
        .agg(
            top2(1, id_col).alias("chosen_id"),
            top2(2, id_col).alias("rejected_id"),
            top2(1, "__cents").alias("chosen_cents"),
            top2(2, "__cents").alias("rejected_cents"),
        )
        .filter(F.col("rejected_id").isNotNull())
        .withColumn(
            "margin_cents", F.col("chosen_cents") - F.col("rejected_cents")
        )
    )
