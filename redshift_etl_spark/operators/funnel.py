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


def kaplan_meier(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_pred: Column,
    censor_ts: str,
) -> DataFrame:
    """Kaplan–Meier time-to-event curve with right censoring — the
    survival statistic behind "how long until a user converts/churns"
    that a naive conversion rate gets wrong when the observation
    window truncates (censored users are AT RISK until they leave,
    not failures):

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    Per user: entry = first observation, event time = first row
    matching ``event_pred`` (else censored at ``censor_ts``); duration
    in whole days. Every user leaves the risk set exactly once, so
    n_at_risk(t) is a SUFFIX sum over the day frame.

    Exactness: all counts are exact BIGINTs; the survival curve is
    reported as ``ln_s_micro`` — the cumulative sum of per-day
    micro-rounded ln(1 − d/n) terms, an EXACT integer (each ln is one
    libm call per DAY CELL, the ngramlm policy; the cumulative sum is
    integer). exp() is left to the consumer: cross-libm exp of a
    double is not guaranteed bit-identical, an integer log-scale curve
    is. Days where d = n (risk set empties through events) report
    NULL from there on (S = 0, ln undefined).

    Scale shape: one user hash agg, then everything lives on the
    ≤(study-window-days) day frame — the two unpartitioned windows
    (suffix risk sum, prefix ln sum) are bounded by that calendar
    constant, never by the data. Returns
    (day, n_at_risk, n_events, n_censored, ln_s_micro) ordered."""
    from pyspark.sql import Window

    per_user = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.col(ts_col)).alias("__entry"),
        F.min(F.when(event_pred, F.col(ts_col))).alias("__ev"),
    )
    end = F.coalesce(F.col("__ev"), F.lit(censor_ts).cast("timestamp"))
    durations = per_user.select(
        F.datediff(F.to_date(end), F.to_date(F.col("__entry"))).alias("day"),
        F.col("__ev").isNotNull().cast("long").alias("__e"),
    )
    days = durations.groupBy("day").agg(
        F.sum("__e").cast("long").alias("n_events"),
        F.sum(1 - F.col("__e")).cast("long").alias("n_censored"),
    )
    w_suffix = Window.orderBy(F.col("day").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prefix = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = days.withColumn(
        "n_at_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_suffix).cast("long"),
    )
    term = F.when(
        F.col("n_at_risk") > F.col("n_events"),
        F.round(
            F.log(
                (F.col("n_at_risk") - F.col("n_events")).cast("double")
                / F.col("n_at_risk").cast("double")
            )
            * 1e6
        ).cast("long"),
    )
    # a window SUM skips NULLs, which would silently carry the curve
    # past an S = 0 day — gate on any prior NULL term explicitly
    dead = F.sum(F.when(term.isNull(), 1).otherwise(0)).over(w_prefix)
    return (
        at_risk.withColumn("__t", term)
        .withColumn(
            "ln_s_micro",
            F.when(dead == 0, F.sum("__t").over(w_prefix)).cast("long"),
        )
        .select("day", "n_at_risk", "n_events", "n_censored", "ln_s_micro")
        .orderBy("day")
    )
