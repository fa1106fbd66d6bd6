"""Funnel analysis — ordered step completion per entity.

The product-analytics staple: given a step sequence (view → click →
purchase), how far did each user get, honoring EVENT-TIME order with
arbitrary other events interleaved? Subsequence matching, not set
membership — a purchase before the first view does not count.

Shape: one hash aggregate collects each user's type sequence (sorted
in-row by (ts, tiebreak) — array_sort on structs, no window, no global
sort), then a higher-order fold walks it against the step list. One
shuffle total, state bounded by events-per-user; at 100 TB partition-
prune the time window first and the shuffle carries (user, type-seq)
only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_depth(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """(user, n_events, funnel_depth): the longest prefix of ``steps``
    completed as an in-order subsequence of the user's event stream.
    Same-timestamp events order deterministically by ``tiebreak_cols``
    (pass a unique id column).

    The fold is exact integer arithmetic — engine-portable by value
    even though SQL engines without typed folds express it as chained
    substring positions instead."""
    ordered = events.groupBy(user_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(ts_col, *tiebreak_cols, type_col)
                )
            ),
            lambda s: s.getField(type_col),
        ).alias("__seq")
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    depth = F.aggregate(
        "__seq",
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.lit(len(steps)))
            & (e == F.element_at(steps_lit, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return ordered.select(
        F.col(user_col),
        F.size("__seq").cast("long").alias("n_events"),
        depth.cast("int").alias("funnel_depth"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-activity week;
    for every (cohort_week, weeks_since_first) cell, how many of the
    cohort were active, and what fraction of the cohort that is.

    Shape: per-user MIN (hash agg) + a distinct user-week activity set,
    joined on the user key — both sides already reduced to user grain
    before the join, so the raw event stream shuffles exactly once
    (into the per-user aggregates). Retention fraction is exact-int
    division in double — engine-portable."""
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    activity = events.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).alias("active_week"),
    ).distinct()
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    cells = (
        activity.join(cohorts, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_n"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_n",
        "n_active",
        (F.col("n_active").cast("double") / F.col("n_cohort")).alias(
            "retention"
        ),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: counts and probabilities of each consecutive (from → to)
    event-type pair. The empirical behavior model behind next-action
    prediction and anomaly scoring on clickstreams.

    One lead window per user (the only shuffle of raw events) + two
    tiny aggregates; probability is exact-int division in double."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("__to", F.lead(type_col).over(w))
        .filter(F.col("__to").isNotNull())
        .select(F.col(type_col).alias("from_type"), F.col("__to").alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("__tot")).alias("p"),
    )


def windowed_funnel(
    events: DataFrame,
    user_col: str,
    ts_col,
    type_col: str,
    steps: Sequence[str],
    window_s: float,
) -> DataFrame:
    """Time-constrained funnel: step k counts only if it happens within
    ``window_s`` seconds AFTER the user's step k−1 (the analytics-tool
    "conversion window"). Semantics are the standard greedy
    earliest-attempt funnel — each step binds to the EARLIEST
    qualifying event after the previous greedy step — which makes the
    result a pure function of the data (no ambiguity about which
    attempt counts) and lets any SQL engine replay it as chained
    min-within-window joins.

    Shape: one (user, step) min-aggregate of the step-filtered events,
    then |steps|−1 user-grain joins over frames that only shrink.
    ``ts_col`` must be a NUMERIC expression (epoch seconds).

    Returns (user, funnel_depth): depth k = completed steps 1..k."""
    u, t = F.col(user_col), ts_col if not isinstance(ts_col, str) else F.col(ts_col)
    ev = events.select(
        u.alias("__u"), t.alias("__t"), F.col(type_col).alias("__ty")
    )
    cur = (
        ev.filter(F.col("__ty") == steps[0])
        .groupBy("__u")
        .agg(F.min("__t").alias("__prev"))
    )
    depth = cur.select("__u", F.lit(1).cast("long").alias("funnel_depth"))
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("__ty") == step)
            .join(cur, "__u")
            .filter(
                (F.col("__t") > F.col("__prev"))
                & (F.col("__t") <= F.col("__prev") + window_s)
            )
            .groupBy("__u")
            .agg(F.min("__t").alias("__prev"))
        )
        depth = depth.join(
            nxt.select("__u", F.lit(k).cast("long").alias("__d")),
            "__u",
            "left",
        ).select(
            "__u",
            F.coalesce("__d", "funnel_depth").alias("funnel_depth"),
        )
        cur = nxt
    return depth.select(
        F.col("__u").alias(user_col), "funnel_depth"
    )
