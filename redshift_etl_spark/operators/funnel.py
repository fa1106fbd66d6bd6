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


def log_rank_test(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_pred: Column,
    censor_ts: str,
    group_col: Column,
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966) — "do these two cohorts
    convert/churn at the same rate?" asked properly: the standard
    significance test for comparing the survival curves
    :func:`kaplan_meier` draws, correct under right censoring where a
    two-proportion z-test (``ab_test_report``) silently isn't (a user
    censored early is neither a success nor a failure).

    Per pooled event day t: with n_g at risk and d_g events in group g,
    group 1's expected events are e_1t = d_t·n_1t/n_t and the
    hypergeometric variance is
    v_t = d_t·(n_1t/n_t)·(n_2t/n_t)·(n_t−d_t)/(n_t−1);
    Z = (O_1 − E_1)/√V with O_1 = Σd_1t, E_1 = Σe_1t, V = Σv_t, and
    chi² = Z².

    ``group_col`` must evaluate to 0 or 1 per input row and be constant
    per user (the cohort assignment); the per-user value is taken with
    MIN. Entry/event/censor semantics match :func:`kaplan_meier`
    exactly, so the test and the curves it compares share one clock.

    Exactness (the KM discipline): d, c, n per day are exact BIGINTs
    from suffix sums on the calendar-bounded day frame; each day's
    e_1t and v_t are nano-rounded to integers (ONE fixed IEEE
    expression of exact BIGINTs each — the psi/benford chi-square
    policy) and summed as integers, so O−E and V are engine- and
    partitioning-exact; Z and chi² are one final IEEE expression.
    Days with n_t ≤ 1 carry no variance (standard convention).
    Returns ONE row: (n_g1, n_g2, events_g1, events_g2, o_minus_e,
    var_sum, z, chi2); z/chi2 are NULL when V = 0 (no comparable
    event days — e.g. a group is empty)."""
    from pyspark.sql import Window

    per_user = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.col(ts_col)).alias("__entry"),
        F.min(F.when(event_pred, F.col(ts_col))).alias("__ev"),
        F.min(group_col.cast("long")).alias("__g"),
    )
    end = F.coalesce(F.col("__ev"), F.lit(censor_ts).cast("timestamp"))
    dur = per_user.select(
        F.datediff(F.to_date(end), F.to_date(F.col("__entry"))).alias("day"),
        F.col("__ev").isNotNull().cast("long").alias("__e"),
        "__g",
    )
    g1 = F.col("__g") == 1
    cells = dur.groupBy("day").agg(
        F.sum(F.when(g1, F.col("__e")).otherwise(0)).cast("long").alias("d1"),
        F.sum(F.when(~g1, F.col("__e")).otherwise(0)).cast("long").alias("d2"),
        F.sum(F.when(g1, 1 - F.col("__e")).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(~g1, 1 - F.col("__e")).otherwise(0)).cast("long").alias("c2"),
    )
    w_suffix = Window.orderBy(F.col("day").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ar = cells.select(
        "day", "d1", "d2",
        F.sum(F.col("d1") + F.col("c1")).over(w_suffix).cast("long").alias("n1"),
        F.sum(F.col("d2") + F.col("c2")).over(w_suffix).cast("long").alias("n2"),
    )
    d = (F.col("d1") + F.col("d2")).cast("double")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    e1_nano = F.when(
        (F.col("d1") + F.col("d2")) > 0,
        F.round(d * n1 / n * 1e9).cast("long"),
    ).otherwise(F.lit(0))
    v_nano = F.when(
        ((F.col("d1") + F.col("d2")) > 0) & ((F.col("n1") + F.col("n2")) > 1),
        F.round(
            d * n1 * n2 * (n - d) / (n * n * (n - 1.0)) * 1e9
        ).cast("long"),
    ).otherwise(F.lit(0))
    sums = ar.agg(
        F.sum("d1").cast("long").alias("__o1"),
        F.sum(e1_nano).cast("long").alias("__e1n"),
        F.sum(v_nano).cast("long").alias("__vn"),
    )
    totals = dur.agg(
        F.sum(F.when(g1, 1).otherwise(0)).cast("long").alias("n_g1"),
        F.sum(F.when(~g1, 1).otherwise(0)).cast("long").alias("n_g2"),
        F.sum(F.when(g1, F.col("__e")).otherwise(0)).cast("long")
        .alias("events_g1"),
        F.sum(F.when(~g1, F.col("__e")).otherwise(0)).cast("long")
        .alias("events_g2"),
    )
    ome = (F.col("__o1").cast("double") * 1e9 - F.col("__e1n")) / 1e9
    var = F.col("__vn").cast("double") / 1e9
    z = F.when(F.col("__vn") > 0, ome / F.sqrt(var))
    return totals.crossJoin(F.broadcast(sums)).select(
        "n_g1", "n_g2", "events_g1", "events_g2",
        ome.alias("o_minus_e"),
        var.alias("var_sum"),
        z.alias("z"),
        (z * z).alias("chi2"),
    )
