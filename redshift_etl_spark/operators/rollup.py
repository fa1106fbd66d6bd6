"""Hypertable-style multi-resolution rollup cascade.

The continuous-aggregate pattern (TimescaleDB hypertables, Druid
rollups): raw events reduce once to the finest bucket, and every
coarser resolution aggregates the PREVIOUS rollup — sum-of-sums,
min-of-mins, count-of-counts — never rescanning raw. At 100 TB that is
the difference between one full scan + two tiny aggs and three full
scans; it is also the incremental-maintenance shape (a late event
touches one minute bucket, and the hour/day levels refresh from the
minute table alone).

Determinism contract: the re-aggregated measures are all associative-
exact — COUNT and integer-cent SUMs (``ROUND(value·100)`` as BIGINT,
order-independent unlike a double SUM), MIN/MAX. Deriv­ed doubles
(sum_value, avg_value) are computed once per output row from those
exact ints, so the cascade is bit-identical to direct aggregation at
every level — which is exactly what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LEVELS = ("minute", "hour", "day")


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
    levels: Sequence[str] = LEVELS,
    reuse: bool = True,
) -> DataFrame:
    """Cascaded rollups at each resolution in ``levels`` (finest
    first), unioned with a ``resolution`` tag. Raw data is scanned and
    shuffled exactly once (the finest level); coarser levels shuffle
    only the already-reduced rollup rows.

    ``reuse=True`` persists each intermediate level: Catalyst does NOT
    share the finest aggregate between its own output branch and the
    next level's input on its own (no exchange reuse across the union
    branches — verified empirically), so without pinning, a 3-level
    cascade plans THREE raw scans and the hypertable win evaporates.
    Each persisted level is exactly the "continuous aggregate" a real
    deployment materializes as a table; callers streaming level-by-
    level to storage can pass reuse=False and checkpoint themselves.
    Unpersist happens at the usual cache lifecycle (clearCache or GC)."""
    keys = list(key_cols)
    finest = finest_rollup(df, ts_col, keys, value_col, scale, levels[0])

    def coarsen(prev: DataFrame, res: str) -> DataFrame:
        return prev.groupBy(
            *keys, F.date_trunc(res, F.col("bucket_ts")).alias("bucket_ts")
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("__cents").alias("__cents"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )

    rollups = [finest]
    for res in levels[1:]:
        if reuse:
            # coalesce before pinning: a rollup is a reduction, but the
            # cache inherits the full shuffle partition count (AQE may
            # not re-partition cached plans), and hundreds of near-empty
            # cached partitions cost a task each at every reuse;
            # defaultParallelism keeps the cache exactly core-wide
            par = df.sparkSession.sparkContext.defaultParallelism
            rollups[-1] = rollups[-1].coalesce(par).persist()
        rollups.append(coarsen(rollups[-1], res))

    def finish(level_df: DataFrame, res: str) -> DataFrame:
        return level_df.select(
            F.lit(res).alias("resolution"),
            *keys,
            "bucket_ts",
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("__cents").cast("double") / scale).alias("sum_value"),
            "min_value",
            "max_value",
            (
                F.col("__cents").cast("double")
                / (F.lit(float(scale)) * F.col("n_events"))
            ).alias("avg_value"),
        )

    out = finish(rollups[0], levels[0])
    for res, level_df in zip(levels[1:], rollups[1:]):
        out = out.unionByName(finish(level_df, res))
    return out


def apply_delta(
    rollup: DataFrame,
    delta: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
    level: str = "minute",
) -> DataFrame:
    """Incremental rollup maintenance — the late-data refresh path: a
    delta batch of raw events updates an EXISTING finest-level rollup
    without touching untouched buckets or rescanning history.

    The delta aggregates to the rollup grain (delta-sized shuffle),
    then FULL OUTER joins the base rollup on (keys, bucket): counts and
    integer-cent sums add, min/least and max/greatest combine — all
    associative+commutative, so the result is bit-identical to
    re-aggregating base+delta raw from scratch (which is what the
    oracle does). Cost is O(|delta| + touched buckets), the whole point
    of keeping a continuous aggregate.

    Input ``rollup`` must carry the internal measure columns produced
    by ``rollup_cascade``'s finest level (n_events, __cents, min/max) —
    i.e. maintain the stored rollup in measure space and derive
    sum/avg at read time (`finish_rollup`)."""
    keys = list(key_cols)
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    d = delta.groupBy(
        *keys, F.date_trunc(level, F.col(ts_col)).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("__d_n"),
        F.sum(cents).alias("__d_cents"),
        F.min(value_col).alias("__d_min"),
        F.max(value_col).alias("__d_max"),
    )
    on = keys + ["bucket_ts"]
    merged = rollup.join(d, on, "full_outer")
    z = F.lit(0).cast("long")
    return merged.select(
        *on,
        (F.coalesce("n_events", z) + F.coalesce("__d_n", z)).alias("n_events"),
        (F.coalesce("__cents", z) + F.coalesce("__d_cents", z)).alias("__cents"),
        F.least("min_value", "__d_min").alias("min_value"),
        F.greatest("max_value", "__d_max").alias("max_value"),
    )


def finest_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    scale: int = 100,
    level: str = "minute",
) -> DataFrame:
    """The stored (measure-space) finest-level rollup: what a deployment
    materializes and maintains with `apply_delta`."""
    keys = list(key_cols)
    cents = F.round(F.col(value_col) * scale, 0).cast("long")
    return df.groupBy(
        *keys, F.date_trunc(level, F.col(ts_col)).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("__cents"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def finish_rollup(rollup: DataFrame, scale: int = 100) -> DataFrame:
    """Measure space → read schema (derive sum/avg from exact ints)."""
    return rollup.select(
        *[c for c in rollup.columns if not c.startswith("__")],
        (F.col("__cents").cast("double") / scale).alias("sum_value"),
        (
            F.col("__cents").cast("double")
            / (F.lit(float(scale)) * F.col("n_events"))
        ).alias("avg_value"),
    ).drop("__cents")


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Per-key time-weighted average: each observation holds its value
    until the next one, so the mean weights values by interval length —
    the correct aggregate for sampled gauges (billing, monitoring),
    where a plain AVG over-counts bursts of samples. The last
    observation per key carries no interval and drops out.

    Exactness: weights are integer products — ROUND(value·scale) cents
    × interval milliseconds (micros ÷ 1000, truncating identically on
    any engine) — summed as BIGINT, so the result is partition-order-
    exact and oracle-portable. Overflow headroom: cents·ms per interval
    must stay under 2⁶³/rows-per-key (≈9·10¹⁸) — at `scale`=100 that
    allows value·interval products up to ~10¹⁴ value-seconds per key.

    One window (lead) + one hash agg, both on the same key partitioning
    — Catalyst reuses the single shuffle."""
    from pyspark.sql import Window

    keys = list(key_cols)
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    stepped = (
        df.withColumn("__next_ts", F.lead(ts_col).over(w))
        .filter(F.col("__next_ts").isNotNull())
        .select(
            *keys,
            (
                (F.unix_micros("__next_ts") - F.unix_micros(F.col(ts_col)))
                / 1000
            ).cast("long").alias("__dur_ms"),
            F.round(F.col(value_col) * scale, 0).cast("long").alias("__cents"),
        )
    )
    return stepped.groupBy(*keys).agg(
        (
            F.sum(F.col("__cents") * F.col("__dur_ms")).cast("double")
            / (F.lit(float(scale)) * F.sum("__dur_ms"))
        ).alias("time_weighted_avg"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def peak_concurrency(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Maximum number of simultaneously-open intervals per key — the
    call-center staple (peak concurrent calls) and the capacity-planning
    aggregate for any session table.

    Sweep-line as relational algebra: every interval contributes a
    (+1 at start, −1 at end) delta point; a running sum over the
    time-ordered points is the live concurrency, and its max is the
    peak. Boundary rule: an end sorts BEFORE a coincident start
    (delta ascending), so back-to-back intervals never double-count.
    All integer arithmetic — exact on any engine. One range-sort window
    per key over 2·|intervals| delta points; report also the earliest
    time the peak was reached (deterministic tie-break)."""
    from pyspark.sql import Window

    keys = list(key_cols)
    starts = df.select(
        *keys, F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = df.select(
        *keys, F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    points = starts.unionByName(ends)
    w = (
        Window.partitionBy(*keys)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy(*keys)
    live = points.withColumn("live", F.sum("delta").over(w)).withColumn(
        "__peak", F.max("live").over(wk)
    )
    return live.groupBy(*keys).agg(
        F.max("live").cast("int").alias("peak_concurrency"),
        F.min(
            F.when(F.col("live") == F.col("__peak"), F.col("t"))
        ).alias("peak_at"),
    )


def interval_coverage(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Total time covered by the UNION of intervals per key — overlaps
    merged, gaps excluded (billing/SLA: "hours with at least one active
    session"). Same sweep-line as `peak_concurrency`: between two
    consecutive delta points the live count is constant, so covered
    time = Σ segment lengths where live > 0. Exact integer microsecond
    arithmetic; one window per key."""
    from pyspark.sql import Window

    keys = list(key_cols)
    starts = df.select(
        *keys, F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = df.select(
        *keys, F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    points = starts.unionByName(ends)
    w = Window.partitionBy(*keys).orderBy("t", "delta")
    run = Window.partitionBy(*keys).orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    live = points.withColumn("live", F.sum("delta").over(run)).withColumn(
        "__next_t", F.lead("t").over(w)
    )
    seg_us = F.unix_micros("__next_t") - F.unix_micros(F.col("t"))
    # the last point has no next segment but must still bound the span
    return live.groupBy(*keys).agg(
        F.sum(
            F.when(
                F.col("__next_t").isNotNull() & (F.col("live") > 0), seg_us
            ).otherwise(F.lit(0))
        ).alias("covered_us"),
        (
            F.max(F.unix_micros(F.col("t")))
            - F.min(F.unix_micros(F.col("t")))
        ).alias("span_us"),
    )


def linear_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Per-key least-squares trend of value over time: slope (value
    units per minute), intercept (value at each key's first minute),
    and R² — drift detection over metric streams.

    Exact distributed OLS: the moment sums (Σx, Σy, Σx², Σxy, Σy²) are
    BIGINT sums of integer products — x = minutes since the KEY'S OWN
    first event (window-min over the key partitioning), y =
    ROUND(value·scale). The shift keeps x small enough that x²·rows
    stays under 2⁶³ at realistic scale (raw epoch seconds would
    overflow), and slope is shift-invariant. Only the final closed-form
    arithmetic runs in double — a fixed expression over exact integers,
    so results are bit-identical on any engine and partitioning.
    Degenerate keys (all events in one minute) yield NULL slope/R².

    Scale note: one hash shuffle on the keys feeds BOTH the window-min
    and the moment aggregation (same partitioning, no exchange between
    them). The earlier formulation broadcast a per-key min frame — with
    millions of keys that forced broadcast OOMs the driver; the window
    is safe at any key cardinality."""
    keys = list(key_cols)
    w_key = Window.partitionBy(*keys)
    pts = df.withColumn(
        "__t0_us", F.min(F.unix_micros(F.col(ts_col))).over(w_key)
    ).select(
        *keys,
        (
            (F.unix_micros(F.col(ts_col)) - F.col("__t0_us")) / 60_000_000
        ).cast("long").alias("__x"),
        F.round(F.col(value_col) * scale, 0).cast("long").alias("__y"),
    )
    m = pts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxy = F.col("__sxy").cast("double")
    syy = F.col("__syy").cast("double")
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when(varx > 0, cov / varx / scale)
    return m.select(
        *keys,
        F.col("__n").alias("n_points"),
        slope.alias("slope_per_min"),
        F.when(varx > 0, (sy - (cov / varx) * sx) / (n * scale)).alias(
            "intercept"
        ),
        F.when(
            (varx > 0) & (vary > 0), (cov * cov) / (varx * vary)
        ).alias("r2"),
    )


def sketch_distinct_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    distinct_col: str,
    level: str = "day",
    lg_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count rollup: per (key, time-bucket) an
    Apache DataSketches HLL sketch of ``distinct_col`` plus its
    estimate. The sketch column is the point — unlike an exact
    COUNT(DISTINCT), stored sketches UNION losslessly, so coarser
    windows, late-data refreshes, and cross-partition totals come from
    `merge_distinct_sketches` over the stored rollup without ever
    rescanning raw data. This is the only practical distinct-counting
    shape at 100 TB (exact distinct at the day level cannot be
    re-aggregated to months: distinct doesn't sum).

    One hash aggregate; estimates carry the usual HLL error
    (~1.04/√2^lg_k ≈ 1.6% at the default lg_k=12, bounded in tests).
    No SQL oracle twin by design — no external engine reproduces the
    sketch bytes; value coverage is the error-bound and
    sketch-of-union ≡ union-of-sketches pytests."""
    keys = list(key_cols)
    bucket = F.date_trunc(level, F.col(ts_col)).alias("bucket")
    return df.groupBy(*keys, bucket).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k))
        ).alias("approx_distinct"),
    )


def merge_distinct_sketches(
    rollup: DataFrame,
    key_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate a stored sketch rollup to coarser keys: HLL union
    is associative/commutative/idempotent, so the merged estimate is
    EXACTLY what sketching the raw union would produce — the property
    that makes the rollup incrementally maintainable (tested)."""
    keys = list(key_cols)
    return rollup.groupBy(*keys).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col))
        ).alias("approx_distinct"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile rollup — fixed-bin histograms
# ---------------------------------------------------------------------------

def binned_histogram(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    lo: float,
    width: float,
    bins: int,
) -> DataFrame:
    """Mergeable quantile sketch as a fixed-bin histogram: per key the
    count of values in each of ``bins`` equal-width bins starting at
    ``lo`` (out-of-range values clamp into the edge bins, NULLs drop).

    This is the quantile analog of `sketch_distinct_rollup`: exact
    percentiles don't re-aggregate (a p99-of-p99s is meaningless), but
    bin counts SUM — so stored histograms roll up to coarser keys /
    windows losslessly and late data is an increment, never a rescan.
    Unlike HLL (or t-digest/KLL) the sketch is DETERMINISTIC: binning
    is a per-row expression, counts are integers, so the whole pipeline
    is engine- and partitioning-exact and a plain SQL twin can
    oracle-check it. Accuracy is a hard guarantee, not probabilistic:
    any quantile estimate is within one bin width of the true value.

    One hash aggregate; output is long-form (keys…, bin, cnt) — the
    shuffle carries at most ``bins`` rows per key."""
    keys = list(key_cols)
    bin_c = (
        F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast(
                    "long"
                ),
            ),
        )
        .cast("long")
        .alias("bin")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bin_c)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_binned(hist: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Re-aggregate stored histograms to coarser keys — integer count
    sums, so merge-of-histograms ≡ histogram-of-union exactly."""
    keys = list(key_cols)
    return hist.groupBy(*keys, "bin").agg(F.sum("cnt").alias("cnt"))


def binned_quantiles(
    hist: DataFrame,
    key_cols: Sequence[str],
    qs: Sequence[tuple[int, int]],
    lo: float,
    width: float,
) -> DataFrame:
    """Quantile estimates (bin midpoints) from a long-form histogram.
    For q = num/den the estimate is the midpoint of the first bin whose
    cumulative count reaches ⌈q·n⌉ — integer threshold compare
    (cum·den ≥ n·num), so bin selection is exact; only the final
    midpoint expression touches doubles (per-row, deterministic).

    One window pass over ≤ bins rows per key + one aggregate."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy("bin")
    wall = Window.partitionBy(*keys)
    c = hist.select(
        *keys,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_rows")]
    for num, den in qs:
        sel = F.min(
            F.when(F.col("cum") * den >= F.col("n") * num, F.col("bin"))
        )
        aggs.append(
            (F.lit(lo) + (sel + F.lit(0.5)) * F.lit(width)).alias(
                f"p{100 * num // den}"
            )
        )
    return c.groupBy(*keys).agg(*aggs)


def rolling_binned_histogram(
    hist: DataFrame,
    key_cols: Sequence[str],
    day_col: str,
    window_days: int,
) -> DataFrame:
    """Trailing-window histograms from stored daily histograms: the
    histogram for day D = Σ of days (D−w+1 … D) — computed by
    REPLICATION, not a sort: each daily (key, bin, cnt) row contributes
    to the ``window_days`` target days it falls inside (explode of w
    offsets + one hash aggregate). No per-window re-sort, no
    range-window over raw rows — the moving-percentile shape that stays
    cheap when windows are long and days are wide. Emits every target
    day (callers semi-join their observed-day frame to drop days with
    no data, keeping partial leading windows — deterministic on both
    engines)."""
    keys = list(key_cols)
    offsets = F.explode(
        F.array(*[F.lit(i) for i in range(window_days)])
    ).alias("__o")
    return (
        hist.select(*keys, day_col, "bin", "cnt", offsets)
        .select(
            *keys,
            F.date_add(F.col(day_col), F.col("__o")).alias(day_col),
            "bin",
            "cnt",
        )
        .groupBy(*keys, day_col, "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def change_point(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """Single change-point detection per key by the classic CUSUM
    statistic: the split position (by ``order_col``) maximizing
    |pre_sum·(n−i) − post_sum·i|, which equals n·|Σ_{j≤i}(x_j − x̄)| —
    the cumulative-sum deviation from the global mean, i.e. the
    i·(n−i)-weighted mean shift. The weighting favors central splits
    over noisy edge splits (a two-point prefix with an extreme mean
    difference does NOT beat a sustained level change — by design;
    callers wanting the unweighted |prefix_mean − suffix_mean| argmax
    divide the objective by i·(n−i) and accept float comparison). The
    step-shift detector a pipeline owner runs over daily metrics before
    trusting a trend.

    Engine-exact by the usual discipline: values quantize to
    ``scale``-ed longs, prefix sums are integer window sums, and the
    objective is pure integer arithmetic — no division, no floats
    (overflow headroom: |v|≤10⁷ · scale 100 · n² ≤ 9·10¹⁸ holds to
    n ≈ 3·10⁴ rows/key at that magnitude; reduce to daily aggregates
    first — which is the intended use — and n is tiny). Ties break on
    the earlier split. One window pass over each key's ordered rows +
    one argmax aggregate; returns (keys…, split_pos, n, shift_scaled)
    where shift_scaled = pre_sum·(n−i) − post_sum·i at the argmax
    (sign = direction: negative means the level RISES after the
    split)."""
    keys = list(key_cols)
    q = df.select(
        *keys,
        F.col(order_col).alias("__ord"),
        F.round(F.col(value_col) * scale, 0).cast("long").alias("__v"),
    )
    w = Window.partitionBy(*keys).orderBy("__ord")
    wall = Window.partitionBy(*keys)
    c = q.select(
        *keys,
        "__ord",
        F.row_number().over(w).alias("__i"),
        F.sum("__v").over(w).alias("__pre"),
        F.sum("__v").over(wall).alias("__tot"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    ).filter(F.col("__i") < F.col("__n"))
    obj = (
        F.col("__pre") * (F.col("__n") - F.col("__i"))
        - (F.col("__tot") - F.col("__pre")) * F.col("__i")
    )
    scored = c.select(
        *keys,
        "__i",
        "__n",
        obj.alias("__obj"),
        F.abs(obj).alias("__absobj"),
    )
    return scored.groupBy(*keys).agg(
        F.max_by(
            F.col("__i"), F.struct(F.col("__absobj"), (-F.col("__i")).alias("n"))
        ).cast("long").alias("split_pos"),
        F.max("__n").cast("long").alias("n"),
        F.max_by(
            F.col("__obj"),
            F.struct(F.col("__absobj"), (-F.col("__i")).alias("n")),
        ).cast("long").alias("shift_scaled"),
    )


def topk_rollup(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
    value_col: str,
    k: int,
) -> DataFrame:
    """Mergeable top-k summary per key: the k largest (value, id) pairs
    as sorted arrays — (value DESC, id ASC) total order, so contents
    are deterministic. Like the histogram/HLL rollups, top-k MERGES:
    topk(union) ≡ topk(merge of stored top-ks), because any entry of
    the union's top-k is in its own group's top-k. One window pass per
    build; stored rollups re-aggregate with `merge_topk` without
    rescanning raw data."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.desc(value_col), F.asc(id_col)
    )
    return (
        df.select(*keys, id_col, value_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__rk", id_col, value_col))
                ),
                lambda s: F.struct(
                    s.getField(id_col).alias("id"),
                    s.getField(value_col).alias("value"),
                ),
            ).alias("topk")
        )
    )


def merge_topk(
    rollup: DataFrame, key_cols: Sequence[str], k: int
) -> DataFrame:
    """Re-aggregate stored top-k summaries to coarser keys: explode,
    re-rank, cut — touches only k rows per stored group, never raw
    data."""
    keys = list(key_cols)
    flat = rollup.select(
        *keys, F.explode("topk").alias("e")
    ).select(*keys, F.col("e.id").alias("id"), F.col("e.value").alias("value"))
    w = Window.partitionBy(*keys).orderBy(F.desc("value"), F.asc("id"))
    return (
        flat.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__rk", "id", "value"))),
                lambda s: F.struct(
                    s.getField("id").alias("id"),
                    s.getField("value").alias("value"),
                ),
            ).alias("topk")
        )
    )


def delta_join_refresh(
    view: DataFrame,
    left_old: DataFrame,
    left_delta: DataFrame,
    right_old: DataFrame,
    right_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental INNER-join view maintenance for APPEND-ONLY inputs:
    with A' = A ∪ ΔA and B' = B ∪ ΔB,

        A'⋈B' = (A⋈B) ∪ (ΔA⋈B) ∪ (A⋈ΔB) ∪ (ΔA⋈ΔB)

    so the stored view is refreshed by three delta-sized joins and a
    union — never by rescanning A'⋈B'. The classic IVM trade: the
    old-side frames are touched once per refresh with the DELTA as the
    other input (AQE broadcasts the delta when it is small, which is
    the whole point of incremental refresh); cost scales with |Δ|, not
    |A|·|B|. Insert-only by contract — updates/deletes need
    multiplicity accounting (see `apply_delta` for the aggregate
    analog); append-only fact streams are the case this serves.

    Column layout of every input must match ``view`` (same join, same
    projection)."""
    dj = (
        left_delta.join(right_old, on)
        .unionByName(left_old.join(right_delta, on))
        .unionByName(left_delta.join(right_delta, on))
    )
    return view.unionByName(dj.select(*view.columns))


def half_life_scores(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    asof_date: str,
    half_life_days: int,
    scale: int = 100,
) -> DataFrame:
    """Recency-weighted engagement score per key with EXACT
    halving-bucket decay — the "exponential decay" every
    activity/recommendation scorer wants, made engine-exact: instead
    of ``value·2^(−age/λ)`` (a libm pow whose last ulp differs across
    runtimes), age quantizes to whole half-lives and the value's
    integer cents halve by bit-shift:

        k        = age_days div half_life_days        (integer)
        decayed  = cents div 2^k                      (exact BIGINT)
        score    = Σ decayed                          (associative)

    Same decay curve sampled at half-life boundaries; every number is
    an exact integer, so the score is identical in any engine and
    under any partitioning. Events after ``asof_date`` are excluded
    (a score "as of" a date cannot see the future); k caps at 62
    (past ~62 half-lives a cent is 0 anyway). Values must be
    non-negative (truncating vs flooring integer division diverges on
    negatives across engines — the cents contract rejects them).

    Returns (key, n_events, last_age_days, score_cents): one
    projection + one key hash agg — scan-speed at corpus scale.
    """
    age = F.datediff(
        F.lit(asof_date).cast("date"), F.col(ts_col).cast("date")
    )
    staged = (
        df.filter(F.col(ts_col).cast("date") <= F.lit(asof_date).cast("date"))
        .select(
            F.col(key_col),
            F.round(F.col(value_col) * scale, 0).cast("long").alias("__c"),
            F.least(
                F.expr(
                    f"CAST(datediff(DATE'{asof_date}', "
                    f"CAST({ts_col} AS DATE)) div {int(half_life_days)} "
                    f"AS INT)"
                ),
                F.lit(62),
            ).alias("__k"),
            age.cast("long").alias("__age"),
        )
    )
    decayed = F.expr("__c div shiftleft(CAST(1 AS BIGINT), __k)")
    return staged.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("__age").cast("long").alias("last_age_days"),
        F.sum(decayed).cast("long").alias("score_cents"),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Exact daily ``window_days``-day TRAILING distinct count (rolling
    active users — the retention dashboard's headline number).

    ``COUNT(DISTINCT) OVER (RANGE N DAYS)`` exists in no engine worth
    running at scale, because distinct is not decomposable: a sliding
    window cannot merge partial distinct states. The exact distributed
    form is the contribution fan-out: dedupe to (entity, active-day)
    grain first (the only corpus-sized shuffle), then each active day
    contributes to exactly ``window_days`` report days (a bounded
    explode — fan-out is the parameter, not the data), and one per-day
    COUNT(DISTINCT entity) closes it. Report days run through the
    trailing tail past the last active day (the window emptying out) —
    callers slice the range they publish.

    Two shuffles total: the (entity, day) dedupe and the per-day
    distinct aggregate (Spark plans the latter as the standard
    two-phase distinct Expand). Skew-free: report-day keys are
    calendar-uniform."""
    ud = df.select(
        F.col(id_col).alias("__e"),
        F.col(ts_col).cast("date").alias("__d"),
    ).distinct()
    fan = ud.select(
        "__e",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(window_days) - 1))
        ).alias("__o"),
        "__d",
    ).select("__e", F.date_add(F.col("__d"), F.col("__o")).alias("report_day"))
    return (
        fan.groupBy("report_day")
        .agg(F.count_distinct("__e").cast("long").alias("active"))
        .orderBy("report_day")
    )
