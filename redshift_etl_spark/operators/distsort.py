"""Distributed global ordering primitives — rank / row_number /
running sum over a TOTAL order without ever funneling the frame
through a single-partition window.

`SUM(x) OVER (ORDER BY ...)` and friends are the canonical warehouse
idiom for Pareto/Lorenz/CDF reports, and the canonical Spark scale
trap: with no PARTITION BY, every row serializes through one window
task. The two-pass partition-offset design here keeps the exact
semantics at cluster scale:

  1. range-exchange on the order columns (`repartitionByRange`) — the
     SAME shuffle a global sort would perform, so no extra data
     movement vs `orderBy`;
  2. per-partition window (PARTITION BY spark_partition_id ORDER BY
     order cols) for the LOCAL rank and running sum — each window
     instance spans one partition's rows only;
  3. a partition-totals frame (one row per shuffle partition: row
     count + value sum) cumulated with a window over that tiny frame
     — bounded by the shuffle-partition count, a cluster config, not
     by the data — then broadcast back and added as offsets.

Because the offsets are exact integer/IEEE sums over a deterministic
total order, the result is bit-identical to the single-window
formulation whenever `order_cols` is a total order (callers must
include a tiebreak key — same contract as deterministic NTILE).

The per-partition-id window is correct because repartitionByRange
guarantees every row in partition i sorts before every row in
partition i+1; spark_partition_id() is evaluated AFTER the exchange so
it names the range bucket. Range boundaries come from Spark's
reservoir sampling — they may place ties on either side of a boundary,
but with a total order the (rank, cumsum) VALUE of each row is
independent of where boundaries fall, so sampling nondeterminism never
reaches the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    rank_name: str = "rank",
    cumsum_name: str = "cum_value",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Single-value-column form of :func:`ranked_cumsums` (the
    original API; see it for the full contract)."""
    return ranked_cumsums(
        df,
        order_by,
        [value_col],
        rank_name=rank_name,
        cumsum_names=[cumsum_name],
        num_partitions=num_partitions,
        reliable=reliable,
    )


def ranked_cumsums(
    df: DataFrame,
    order_by: list[Column],
    value_cols: list[str],
    rank_name: str = "rank",
    cumsum_names: list[str] | None = None,
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Append global ``rank_name`` (row_number over the total order)
    and one running sum per entry of ``value_cols`` (current row
    inclusive, named by ``cumsum_names``, default ``cum_<col>``) to
    ``df`` — the distributed equivalent of, per value column,

        row_number() OVER (ORDER BY ...)            AS rank,
        sum(v) OVER (ORDER BY ... ROWS UNBOUNDED
                     PRECEDING)                     AS cum_value

    ``order_by`` must be a TOTAL order (include a tiebreak column).

    Durability (``reliable``): the default pins the staged frame with
    ``localCheckpoint`` — executor-LOCAL, non-replicated blocks with
    truncated lineage, which is exactly right on a single node but
    means that on a real cluster, losing an executor AFTER
    materialization fails every downstream job over the staged frame
    unrecoverably (no lineage left to recompute from). For cluster
    deployments where that matters, pass ``reliable=True`` to use a
    reliable checkpoint instead (replicated, fault-tolerant storage;
    the caller must have set ``spark.sparkContext.setCheckpointDir``
    first — same correctness pinning, survives executor loss, at the
    cost of a write to the checkpoint filesystem).

    Multiple value columns share ONE range exchange, one staged
    checkpoint, and one offsets broadcast — the marginal cost of an
    extra running sum is one more window expression over the same
    frame (vs a full second pass if the caller composed two
    single-column calls).
    """
    if cumsum_names is None:
        cumsum_names = [f"cum_{c}" for c in value_cols]
    if len(cumsum_names) != len(value_cols):
        raise ValueError("cumsum_names must match value_cols")
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    pid = F.spark_partition_id().alias("__pid")
    # Materialize the staged frame ONCE: both consumers below (the
    # local window and the per-partition totals agg) must observe the
    # SAME physical range partitioning. repartitionByRange samples
    # boundaries with an RDD-id-seeded RNG, so if the two subtrees
    # were planned as independent exchanges (exchange reuse disabled,
    # or column pruning differentiating them), rows could land in
    # different __pid buckets per consumer and the offsets join would
    # silently mis-rank. Checkpointing pins one concrete RDD that
    # both branches read — correctness no longer depends on
    # ReuseExchange firing.
    staged = ranged.select("*", pid)
    staged = (
        staged.checkpoint(eager=False)
        if reliable
        else staged.localCheckpoint(eager=False)
    )

    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.select(
        "*",
        F.count(F.lit(1)).over(local_w).alias("__local_rn"),
        *[
            F.sum(c).over(local_w).alias(f"__local_sum_{i}")
            for i, c in enumerate(value_cols)
        ],
    )

    # Offsets: one row per shuffle partition — bounded by
    # spark.sql.shuffle.partitions (cluster config), NOT by the data,
    # so the unpartitioned window over it is a bounded frame (guard-
    # test allowlist).
    totals = staged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{i}") for i, c in enumerate(value_cols)],
    )
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "__pid",
        (F.sum("__n").over(off_w) - F.col("__n")).alias("__rn_off"),
        *[
            (F.sum(f"__s_{i}").over(off_w) - F.col(f"__s_{i}")).alias(
                f"__sum_off_{i}"
            )
            for i in range(len(value_cols))
        ],
    )

    out = local.join(F.broadcast(offsets), "__pid").select(
        *[c for c in df.columns],
        (F.col("__local_rn") + F.col("__rn_off"))
        .cast("long")
        .alias(rank_name),
        *[
            (F.col(f"__local_sum_{i}") + F.col(f"__sum_off_{i}")).alias(
                cumsum_names[i]
            )
            for i in range(len(value_cols))
        ],
    )
    return out


def percentile_disc_edges(
    df: DataFrame,
    value_col: str,
    percents: list[float],
    prefix: str = "p",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Exact ``percentile_disc(p) WITHIN GROUP (ORDER BY value_col)``
    for each p in ``percents``, as a ONE-ROW frame with columns
    ``{prefix}{round(p*100)}`` — computed fully distributed.

    ``percentile_disc(p)`` is by definition the smallest value v whose
    cumulative row count satisfies cum(v) >= p * N. Spark's (and
    DuckDB's) built-in aggregate realizes that with an OpenHashMap
    keyed by DISTINCT VALUE merged onto one final task — for a
    high-cardinality continuous measure (distinct values ~ rows) that
    is a single-task funnel. Here instead:

      1. groupBy(value) -> per-distinct-value counts (ordinary
         map-side-combined agg, shuffles |distinct| rows);
      2. :func:`ranked_cumsum` over the counts ordered by value —
         range exchange + per-partition windows, no global funnel;
      3. the threshold test ``cum * denom >= num * N`` in EXACT
         integer arithmetic (p parsed as a Fraction, so 0.2 is 1/5 —
         no float-boundary misrounding at any N), reduced with
         ``min(when(...))`` — a plain partial-aggregable MIN.

    Bit-identical to the built-in aggregate (property-tested in
    tests/test_distsort.py), but the largest single-task state is one
    row per shuffle partition. NULL inputs are ignored, matching the
    built-in (an aggregate skips NULLs): they are filtered before the
    counts so they inflate neither N nor any cumulative threshold.
    """
    from fractions import Fraction

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cum = ranked_cumsum(
        counts,
        [F.col(value_col)],
        "__cnt",
        rank_name="__rk",
        cumsum_name="__cum",
        num_partitions=num_partitions,
        reliable=reliable,
    )
    n_total = counts.agg(F.sum("__cnt").alias("__N"))
    aggs = []
    for p in percents:
        fr = Fraction(str(p))
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * F.lit(fr.denominator)
                    >= F.lit(fr.numerator) * F.col("__N"),
                    F.col(value_col),
                )
            ).alias(f"{prefix}{round(p * 100)}")
        )
    return cum.crossJoin(F.broadcast(n_total)).agg(*aggs)


def weighted_percentile_disc_edges(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    percents: list[float],
    prefix: str = "p",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Weight-mass percentile edges: for each p, the smallest value v
    such that the cumulative WEIGHT of rows with value ≤ v reaches
    p·W_total — e.g. "the document length below which half the
    corpus's TOKENS sit", the packing/budgeting diagnostic that plain
    row-count percentiles misstate whenever length and weight
    correlate (they always do for documents).

    Same machinery and exactness contract as
    :func:`percentile_disc_edges` — per-distinct-value INTEGER weight
    sums ride one range-exchange cumsum, thresholds are Fraction-exact
    bigint cross-multiplications, NULL values and NULL/zero weights
    drop out before counting. ``weight_col`` must be integral (token
    counts, byte sizes): exactness comes from bigint sums."""
    from fractions import Fraction

    counts = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
        )
        .groupBy(value_col)
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__w"))
    )
    cum = ranked_cumsum(
        counts,
        [F.col(value_col)],
        "__w",
        rank_name="__rk",
        cumsum_name="__cum",
        num_partitions=num_partitions,
        reliable=reliable,
    )
    w_total = counts.agg(F.sum("__w").alias("__wtot"))
    aggs = []
    for p in percents:
        fr = Fraction(str(p))
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * F.lit(fr.denominator)
                    >= F.lit(fr.numerator) * F.col("__wtot"),
                    F.col(value_col),
                )
            ).alias(f"{prefix}{round(p * 100)}")
        )
    return cum.crossJoin(F.broadcast(w_total)).agg(*aggs)


def grouped_percentile_disc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percents: list[float],
    prefix: str = "p",
    num_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Exact per-GROUP ``percentile_disc(p) WITHIN GROUP (ORDER BY
    value_col)`` — one output row per group — computed with NO
    per-group funnel.

    This is the FEW-GIANT-GROUPS shape (a bounded catalog of event
    types / sources, each holding a huge share of rows). There the
    built-in aggregate's per-group distinct-value hashmap ≈ the group
    itself on one task, and a per-group sort window is a group-sized
    single-task sort. Here instead the distinct-value counts ride ONE
    global range exchange ordered by (group, value) — the same
    :func:`ranked_cumsum` machinery as the ungrouped edges — and each
    group's cumulative count is recovered by subtracting the group's
    exclusive offset ``Σ n_{g'} for g' < group`` (an aggregated
    |groups|-row frame theta-joined to itself: |groups|² work, trivial
    under this shape's contract). With MANY small groups, prefer the
    built-in aggregate: map-side combine keeps its per-group state
    bounded, and this operator's offsets join would not.

    Threshold test is the same exact-integer Fraction arithmetic as
    :func:`percentile_disc_edges`; NULL values are filtered before
    counting, matching aggregate semantics per group (property-tested
    ≡ the built-in grouped aggregate)."""
    from fractions import Fraction

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cum = ranked_cumsum(
        counts,
        [F.col(group_col), F.col(value_col)],
        "__cnt",
        rank_name="__rk",
        cumsum_name="__cum",
        num_partitions=num_partitions,
        reliable=reliable,
    )
    totals = counts.groupBy(group_col).agg(
        F.sum("__cnt").cast("long").alias("__n_g")
    )
    earlier = totals.select(
        F.col(group_col).alias("__g2"), F.col("__n_g").alias("__n2")
    )
    offsets = (
        totals.join(earlier, F.col("__g2") < F.col(group_col), "left")
        .groupBy(group_col, "__n_g")
        .agg(F.coalesce(F.sum("__n2"), F.lit(0)).cast("long").alias("__off"))
    )
    j = cum.join(offsets, group_col)
    aggs = []
    for p in percents:
        fr = Fraction(str(p))
        aggs.append(
            F.min(
                F.when(
                    (F.col("__cum") - F.col("__off"))
                    * F.lit(fr.denominator)
                    >= F.lit(fr.numerator) * F.col("__n_g"),
                    F.col(value_col),
                )
            ).alias(f"{prefix}{round(p * 100)}")
        )
    return j.groupBy(group_col).agg(*aggs)


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_name: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY ...)`` via the same
    two-pass shape, for callers that need only the rank."""
    with_one = df.withColumn("__one", F.lit(1).cast("long"))
    ranked = ranked_cumsum(
        with_one,
        order_by,
        "__one",
        rank_name=rank_name,
        cumsum_name="__cum_one",
        num_partitions=num_partitions,
    )
    return ranked.drop("__one", "__cum_one")


def ks_drift(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    ``value_col`` distributions of two row populations (``in_a`` /
    ``in_b`` boolean predicates) — the drift test a data pipeline runs
    between a reference window and a live window before trusting new
    data.

    D = max_v |F_a(v) − F_b(v)| is computed with ZERO floating-point
    state: per-distinct-value counts, one :func:`ranked_cumsums` pass
    (both cumulative counts share a single range exchange), and the
    integer cross-difference ``|cum_a·n_b − cum_b·n_a|`` whose maximum
    is an ordinary MAX aggregate. The only double is the final
    presentation division of two exact int64s — deterministic on any
    engine (n_a·n_b stays under 2^63 up to ~3·10^9 rows per side;
    beyond that emit the numerator alone and divide downstream).

    Returns ONE row: (ks_num, n_a, n_b, ks, at_value) where at_value
    is the smallest value attaining the maximum gap.

    Scale: the counts agg shuffles |distinct values| rows (map-side
    combined — bounded by the value DOMAIN, not the row count); the
    cumsum is the distsort range-exchange path; the argmax is a
    TakeOrderedAndProject over the distinct-value frame. No global
    window, no driver state.
    """
    tagged = (
        df.filter(F.col(value_col).isNotNull())  # a CDF has no NULL point
        .select(
            F.col(value_col).alias("__v"),
            in_a.cast("long").alias("__a"),
            in_b.cast("long").alias("__b"),
        )
        .filter((F.col("__a") == 1) | (F.col("__b") == 1))
    )
    counts = tagged.groupBy("__v").agg(
        F.sum("__a").cast("long").alias("cnt_a"),
        F.sum("__b").cast("long").alias("cnt_b"),
    )
    cums = ranked_cumsums(
        counts,
        [F.col("__v")],
        ["cnt_a", "cnt_b"],
        cumsum_names=["cum_a", "cum_b"],
        num_partitions=num_partitions,
    )
    tot = counts.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ).alias("__gap")
    return (
        cums.crossJoin(F.broadcast(tot))
        .select("__v", "n_a", "n_b", gap)
        .orderBy(F.col("__gap").desc(), F.col("__v"))
        .limit(1)
        .select(
            F.col("__gap").cast("long").alias("ks_num"),
            "n_a",
            "n_b",
            (
                F.col("__gap")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("ks"),
            F.col("__v").alias("at_value"),
        )
    )


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROC AUC of ``score_col`` against boolean ``label_col``,
    fully distributed — the Mann-Whitney midrank formulation:

        AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    with ties handled by midranks, which keeps the statistic identical
    to the pairwise definition P(s⁺ > s⁻) + ½·P(s⁺ = s⁻).

    Everything is INTEGER until the final division: per-distinct-score
    (count, positive-count) pairs ride one :func:`ranked_cumsum` range
    exchange ordered by score ascending; the doubled midrank
    ``2·cum − cnt + 1`` and the doubled rank-sum stay bigint, and AUC
    is ONE IEEE bigint/bigint division — bit-identical in any engine.
    No global sort of the raw rows, no single-task rank window: the
    largest single-task state is one row per shuffle partition.
    NULL scores/labels are dropped (pairwise semantics have no place
    for them). Returns one row: (n_pos, n_neg, auc)."""
    counts = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(score_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum(F.col(label_col).cast("int"))
            .cast("long")
            .alias("__pos"),
        )
    )
    cum = ranked_cumsum(
        counts,
        [F.col(score_col)],
        "__cnt",
        rank_name="__rk",
        cumsum_name="__cum",
        num_partitions=num_partitions,
    )
    # doubled midrank keeps integers: 2*mid = 2*cum - cnt + 1
    two_s = F.sum(
        F.col("__pos") * (2 * F.col("__cum") - F.col("__cnt") + 1)
    ).cast("long")
    agg = cum.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        (F.sum("__cnt") - F.sum("__pos")).cast("long").alias("n_neg"),
        two_s.alias("__two_s"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (
            (F.col("__two_s") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2 * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Precision/recall at EVERY distinct threshold ("predict positive
    when score >= t"), from the same single range-exchange cumsum as
    :func:`auc_exact`: per-distinct-score (count, positives) pairs
    cumulated ascending give exact integer TP/FP/FN at each t —

        tp(t) = n_pos − cum_pos(<t),   fp(t) = n_neg − cum_neg(<t)

    — and precision/recall are IEEE divisions of those integers.
    Output: one row per distinct score (threshold, tp, fp, fn,
    precision, recall), ordered by threshold. Row count = |distinct
    scores|, which for a bounded classifier-score grid is a report,
    not a data product."""
    counts = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(score_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum(F.col(label_col).cast("int"))
            .cast("long")
            .alias("__pos"),
        )
    )
    cum = ranked_cumsums(
        counts,
        [F.col(score_col)],
        ["__cnt", "__pos"],
        rank_name="__rk",
        cumsum_names=["__cum", "__cum_pos"],
        num_partitions=num_partitions,
    )
    totals = counts.agg(
        F.sum("__pos").cast("long").alias("__npos"),
        (F.sum("__cnt") - F.sum("__pos")).cast("long").alias("__nneg"),
    )
    # cum_* above INCLUDE the current score row; thresholds are
    # ">= t", so exclude rows strictly BELOW t: cum(<t) = cum - row
    tp = (F.col("__npos") - (F.col("__cum_pos") - F.col("__pos"))).cast(
        "long"
    )
    fp = (
        F.col("__nneg")
        - ((F.col("__cum") - F.col("__cum_pos")) - (F.col("__cnt") - F.col("__pos")))
    ).cast("long")
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.col(score_col).alias("threshold"),
            tp.alias("tp"),
            fp.alias("fp"),
            (F.col("__npos") - tp).cast("long").alias("fn"),
            (tp / (tp + fp)).alias("precision"),
            (tp / F.col("__npos")).alias("recall"),
        )
        .orderBy("threshold")
    )


def calibration_bins(
    df: DataFrame,
    num_col: str,
    den_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a score expressed as an exact
    integer RATIO ``num/den`` in [0, 1] (hits/tokens, matches/trials):
    bin assignment is pure bigint arithmetic ``min(n_bins−1,
    num·n_bins div den)`` — no float boundary can move a row across a
    bin edge — and each bin reports exact counts, the observed
    positive rate, and the ratio-of-sums mean score (Σnum/Σden, never
    a float average of floats). One map-side-combined hash agg on the
    bin key; rows with NULL or zero denominators drop out. Output:
    (bin, n, n_pos, mean_score, pos_rate), ordered by bin."""
    num = F.col(num_col).cast("long")
    den = F.col(den_col).cast("long")
    return (
        df.filter(
            num.isNotNull()
            & den.isNotNull()
            & (den > 0)
            & F.col(label_col).isNotNull()
        )
        .select(
            num.alias("__num"),
            den.alias("__den"),
            F.col(label_col).cast("int").alias("__y"),
        )
        # `div` is Spark's INTEGER division (`/` on longs is IEEE
        # double division — a float boundary that could move a row
        # across a bin edge); DuckDB's twin operator is `//`
        .withColumn(
            "bin",
            F.expr(
                f"least(CAST({n_bins - 1} AS BIGINT),"
                f" (__num * {n_bins}) div __den)"
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            (
                F.sum("__num").cast("double") / F.sum("__den")
            ).alias("mean_score"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "mean_score",
            (F.col("n_pos") / F.col("n").cast("double")).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def grouped_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-GROUP exact ROC AUC — :func:`auc_exact` for every slice at
    once (per-language, per-source classifier eval), with the same
    no-per-group-funnel shape as :func:`grouped_percentile_disc`:
    per-(group, distinct-score) count/positive pairs ride ONE global
    range exchange ordered by (group, score); each group's cumulative
    count is recovered by subtracting its exclusive offset from the
    |groups|-row totals theta-join. Doubled midranks keep all rank
    sums bigint; one IEEE division per group. Groups with no
    positives or no negatives report NULL auc (the statistic is
    undefined, not zero). Output: (group, n_pos, n_neg, auc)."""
    counts = (
        df.filter(
            F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .groupBy(group_col, score_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__cnt"),
            F.sum(F.col(label_col).cast("int"))
            .cast("long")
            .alias("__pos"),
        )
    )
    cum = ranked_cumsum(
        counts,
        [F.col(group_col), F.col(score_col)],
        "__cnt",
        rank_name="__rk",
        cumsum_name="__cum",
        num_partitions=num_partitions,
    )
    totals = counts.groupBy(group_col).agg(
        F.sum("__cnt").cast("long").alias("__n_g"),
        F.sum("__pos").cast("long").alias("__pos_g"),
    )
    earlier = totals.select(
        F.col(group_col).alias("__g2"), F.col("__n_g").alias("__n2")
    )
    offsets = (
        totals.join(earlier, F.col("__g2") < F.col(group_col), "left")
        .groupBy(group_col, "__n_g", "__pos_g")
        .agg(F.coalesce(F.sum("__n2"), F.lit(0)).cast("long").alias("__off"))
    )
    j = cum.join(offsets, group_col)
    cum_g = F.col("__cum") - F.col("__off")
    per_group = j.groupBy(group_col).agg(
        F.first("__pos_g").alias("n_pos"),
        (F.first("__n_g") - F.first("__pos_g")).cast("long").alias("n_neg"),
        F.sum(F.col("__pos") * (2 * cum_g - F.col("__cnt") + 1))
        .cast("long")
        .alias("__two_s"),
    )
    return per_group.select(
        group_col,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (F.col("__two_s") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2 * F.col("n_pos") * F.col("n_neg")),
        ).alias("auc"),
    ).orderBy(group_col)


def expected_calibration_error(
    df: DataFrame,
    num_col: str,
    den_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """ECE over :func:`calibration_bins`: Σ_b (n_b/N)·|pos_rate_b −
    mean_score_b| — the one-number summary of the reliability diagram.

    Exactness: each bin's |gap| is an |IEEE difference of two exact-
    integer divisions| MICRO-ROUNDED to int64 (the repo's libm/float-
    fold policy — a raw double SUM's value would depend on partition
    order), so the weighted numerator is a plain BIGINT sum and the
    ECE is one division: Σ n_b·gap_micro_b / (N·10⁶)."""
    bins = calibration_bins(df, num_col, den_col, label_col, n_bins)
    gap_micro = F.round(
        F.abs(F.col("pos_rate") - F.col("mean_score")) * 1_000_000, 0
    ).cast("long")
    agg = bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("n") * gap_micro).cast("long").alias("__num"),
    )
    return agg.select(
        "n",
        (
            F.col("__num")
            / (F.col("n").cast("double") * 1_000_000)
        ).alias("ece"),
    )


def best_f1_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """The operating point a deployed filter actually needs: the
    threshold maximizing F1 over :func:`pr_curve`'s exact confusion
    counts. F1 = 2·tp/(2·tp+fp+fn) is one IEEE division of exact
    integers per candidate threshold; ties break to the LOWEST
    threshold (keep more, deterministic). One row: (threshold, tp,
    fp, fn, precision, recall, f1)."""
    pr = pr_curve(df, score_col, label_col, num_partitions=num_partitions)
    f1 = (2 * F.col("tp")) / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    scored = pr.withColumn("f1", f1)
    best = scored.agg(
        F.max_by(
            F.struct(*scored.columns),
            F.struct(F.col("f1"), (-F.col("threshold")).alias("nt")),
        ).alias("b")
    )
    return best.select("b.*")


def reciprocal_rank(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group reciprocal rank of a retrieval ranking: items rank by
    (score desc, id asc) within each group (query), and RR = 1 / rank
    of the FIRST relevant item — the per-query ingredient of MRR, the
    standard first-hit retrieval metric.

    Returns one row per group: (group, n_items, n_rel, first_rel_rank,
    rr). Groups with no relevant item get NULL rank/rr (absence of a
    hit is not a rank — averaging callers decide how to treat it).
    Determinism: the rank is a pure integer (deterministic tiebreak on
    the id), and rr is ONE IEEE 1/bigint division — engine- and
    partitioning-exact.

    Plan: one group hash exchange feeds both the rank window and the
    final per-group aggregate (same partitioning, no second shuffle);
    no global sort, state bounded by group size like any rank window.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    ranked = df.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col(label_col).cast("int")).cast("long").alias("n_rel"),
            F.min(
                F.when(F.col(label_col).cast("int") == 1, F.col("__rk"))
            ).cast("long").alias("first_rel_rank"),
        )
        .withColumn("rr", F.lit(1.0) / F.col("first_rel_rank"))
    )


def ndcg_discounts(k: int) -> list[float]:
    """1/log2(i+1) for ranks i = 1..k, computed ONCE in Python and
    injected as literals into BOTH the Spark expression and any SQL
    oracle — log2 is libm-territory, so sharing the constants (not the
    computation) is what keeps the metric engine-exact."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group nDCG@k of a retrieval ranking with graded relevance:

        DCG@k  = Σ_{i≤k} (2^rel_i − 1) / log2(i+1)   (ranked by score)
        IDCG@k = the same sum over the k highest relevances
        nDCG   = DCG / IDCG

    Returns one row per group: (group, n_items, dcg_micro, idcg_micro,
    ndcg); groups with no relevant item (IDCG = 0) get NULL ndcg.

    Determinism contract: the discount table comes from
    :func:`ndcg_discounts` (shared Python literals, never an engine's
    own log2); each position's gain ``(2^rel − 1)·discount`` is
    micro-rounded to BIGINT before summing — a raw double SUM's
    accumulation order is partition-dependent, bigint addition is
    associative — and nDCG is ONE IEEE bigint/bigint division.
    ``rel`` must be a small non-negative integer grade (2^rel in
    int64, i.e. rel < 62 — real grading scales stop at 4).

    Plan: ONE group hash exchange feeds the score-order rank window,
    the relevance-order (ideal) rank window, and the final per-group
    aggregate — same partitioning throughout, no global sort."""
    from pyspark.sql import Window

    disc = F.array(*[F.lit(d) for d in ndcg_discounts(k)])
    w_score = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    w_ideal = Window.partitionBy(group_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col).asc()
    )
    # SQL shiftleft accepts a column exponent (the Python wrapper
    # doesn't): (1 << rel) − 1 stays exact int64 before the cast
    gain = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), CAST({rel_col} AS INT)) - 1 "
        f"AS DOUBLE)"
    )
    ranked = df.select(
        F.col(group_col),
        gain.alias("__g"),
        F.row_number().over(w_score).alias("__rk"),
        F.row_number().over(w_ideal).alias("__irk"),
    )
    micro = ranked.select(
        group_col,
        F.when(
            F.col("__rk") <= k,
            F.round(
                F.col("__g") * F.element_at(disc, F.col("__rk")) * 1e6, 0
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")).alias("__dcg_term"),
        F.when(
            F.col("__irk") <= k,
            F.round(
                F.col("__g") * F.element_at(disc, F.col("__irk")) * 1e6, 0
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")).alias("__idcg_term"),
    )
    return (
        micro.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("__dcg_term").cast("long").alias("dcg_micro"),
            F.sum("__idcg_term").cast("long").alias("idcg_micro"),
        )
        .withColumn(
            "ndcg",
            F.when(
                F.col("idcg_micro") > 0,
                F.col("dcg_micro") / F.col("idcg_micro"),
            ),
        )
    )


def diversified_topk(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    k: int,
    per_group: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Global top-k under a PER-GROUP cap — search-result
    diversification / fairness quota: no group (source, domain,
    seller…) may occupy more than ``per_group`` of the ``k`` result
    slots, so one boilerplate-heavy domain can't monopolize a result
    page. ``order_by`` must be a TOTAL order (include an id tiebreak)
    so both the within-group cap and the final cut are deterministic.

    Semantics: rank within each group by ``order_by``, keep each
    group's best ``per_group``, then take the global top-k of the
    survivors in the same order; ``rank_name`` is the final 1..k
    position. (Greedy-swap diversifiers differ when a capped item
    would beat an uncapped one — this is the standard quota form:
    the result is exactly "best k among per-group bests".)

    Scale shape: one group-keyed exchange for the cap window (groups
    are the diversity unit — bounded fan-in per group), then a
    TakeOrderedAndProject for the global cut — the full survivor set
    is never globally sorted."""
    from pyspark.sql import Window

    wg = Window.partitionBy(group_col).orderBy(*order_by)
    capped = (
        df.withColumn("__gr", F.row_number().over(wg))
        .filter(F.col("__gr") <= per_group)
        .drop("__gr")
    )
    top = capped.orderBy(*order_by).limit(k)
    w = Window.orderBy(*order_by)  # over <= k rows by construction
    return top.withColumn(
        rank_name, F.row_number().over(w).cast("long")
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    scale: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact Gini coefficient of a non-negative value distribution —
    the inequality scalar next to a Lorenz curve (token mass across
    sources, spend across customers):

        G = Σ_i (2i − n − 1)·x_(i)  /  (n · Σ x)

    over values sorted ascending. Everything integer until the final
    division: values fix to BIGINT at ``scale`` (cents by default),
    the global rank i comes from one :func:`ranked_cumsum` range
    exchange (ties get distinct ranks — the formula is tie-invariant:
    equal values contribute the same total for any rank order within
    the tie, since Σ(2i−n−1) over a rank run is rank-set-symmetric),
    and the weighted sum stays BIGINT. One row: (n, total, gini);
    NULL gini when n·Σx = 0. NULL/negative values are the caller's
    job to filter (Gini is undefined on negatives — document the
    population, don't guess)."""
    vals = df.select(
        F.round(F.col(value_col) * scale, 0).cast("long").alias("__v")
    )
    ranked = ranked_cumsum(
        vals,
        [F.col("__v").asc()],
        "__v",
        rank_name="__i",
        cumsum_name="__cum",
        num_partitions=num_partitions,
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__v").cast("long").alias("total_scaled"),
        F.sum(
            (2 * F.col("__i") - F.lit(1)) * F.col("__v")
        ).cast("long").alias("__wsum_part"),
    )
    # Σ(2i−n−1)x = Σ(2i−1)x − n·Σx  (n unknown until the agg, so the
    # per-row weight uses (2i−1) and the n·Σx term folds in here)
    return agg.select(
        "n",
        "total_scaled",
        F.when(
            (F.col("n") > 0) & (F.col("total_scaled") > 0),
            (
                F.col("__wsum_part") - F.col("n") * F.col("total_scaled")
            ) / (F.col("n") * F.col("total_scaled")).cast("double"),
        ).alias("gini"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact Spearman rank correlation between two columns — the
    monotone-association eval (quality score vs human rating, length
    vs loss) that Pearson-on-raw gets wrong on heavy tails.

    ρ = Pearson over midranks, ties handled exactly: per-distinct-value
    (value, count) pairs ride one :func:`ranked_cumsum` range exchange
    per variable, the DOUBLED midrank ``2·cum − cnt + 1`` stays
    integer, and rows rejoin their midranks by value (a per-distinct-
    value frame — vocabulary-sized, shuffle-joined, no broadcast
    hint). The correlation of doubled ranks equals the correlation of
    ranks (affine invariance), so nothing is ever halved.

    Exactness: every moment sum accumulates in DECIMAL(38,0)
    (associative integer adds — a double Σr² is partition-order-
    dependent); the final ρ = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) ·
    √(nΣy²−(Σy)²)) casts each exact integer to double once —
    deterministic rounding — and IEEE sqrt is CORRECTLY ROUNDED by
    the standard (unlike ln/pow, sqrt is engine-safe). Exact-integer
    headroom: n·Σ(2r)² ≤ 38 digits holds to n ≈ 10⁸ rows — report-
    scale inputs; beyond that, rank a sample. NULLs in either column
    drop (pairwise semantics). One row: (n, rho); NULL rho when
    either variable is constant."""
    rows = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))

    def midranks(col: str, out: str) -> DataFrame:
        counts = rows.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("__cnt")
        )
        cum = ranked_cumsum(
            counts,
            [F.col(col).asc()],
            "__cnt",
            rank_name="__rk",
            cumsum_name="__cum",
            num_partitions=num_partitions,
        )
        return cum.select(
            col,
            (2 * F.col("__cum") - F.col("__cnt") + 1).alias(out),
        )

    ranked = rows.join(midranks("__x", "__rx"), "__x").join(
        midranks("__y", "__ry"), "__y"
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d(F.col("__rx"))).alias("__sx"),
        F.sum(d(F.col("__ry"))).alias("__sy"),
        F.sum(d(F.col("__rx") * F.col("__rx"))).alias("__sxx"),
        F.sum(d(F.col("__ry") * F.col("__ry"))).alias("__syy"),
        F.sum(d(F.col("__rx") * F.col("__ry"))).alias("__sxy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    dx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    dy = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    return agg.select(
        "n",
        F.when(
            (dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy))
        ).alias("rho"),
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    alpha_pct: int = 10,
    tiebreak: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Split-conformal calibration threshold — the finite-sample-exact
    quantile that turns any nonconformity score into a prediction set
    with guaranteed >= 1-alpha coverage (Vovk; Angelopoulos & Bates
    2021):

        qhat = s_(r),   r = ceil((n+1)*(1-alpha))   (r-th smallest score)

    The +1 is the finite-sample correction — a plain (1-alpha)
    empirical quantile UNDER-covers; this order statistic is the
    distribution-free guarantee. r > n (tiny calibration sets)
    degenerates to qhat = NULL (= +inf: every prediction set must
    include everything), reported rather than clamped so the caller
    sees the guarantee is vacuous.

    Exactness: alpha enters as an integer PERCENT, n as an exact count,
    so r = ceil((n+1)*(100-alpha)/100) is exact integer arithmetic (no
    float quantile fractions), and qhat is an actual data value
    SELECTED by rank, never interpolated. One :func:`ranked_cumsum`
    range exchange for the rank (never a single-task window); rank
    ties broken by ``tiebreak`` for a deterministic pick among equal
    scores (equal scores => equal qhat, so any tiebreak yields the
    same threshold). Returns one row: (n_cal, rank_r, qhat)."""
    base = df.select(F.col(score_col).alias("__s"))
    order = [F.col("__s").asc()]
    if tiebreak is not None:
        base = df.select(F.col(score_col).alias("__s"), tiebreak.alias("__t"))
        order = [F.col("__s").asc(), F.col("__t").asc()]
    n = base.count()  # bounded scalar: one count job
    pct = 100 - int(alpha_pct)
    rank_r = ((n + 1) * pct + 99) // 100
    spark = df.sparkSession
    totals = spark.createDataFrame(
        [(n, rank_r)], "n_cal: long, rank_r: long"
    )
    ranked = global_row_number(
        base, order, rank_name="__r", num_partitions=num_partitions
    )
    picked = (
        ranked.where(F.col("__r") == rank_r)
        .select(
            F.lit(n).cast("long").alias("n_cal"),
            F.lit(rank_r).cast("long").alias("rank_r"),
            F.col("__s").alias("qhat"),
        )
    )
    # left join the (<=1-row) picked value onto the 1-row totals so the
    # degenerate r > n case yields qhat NULL instead of zero rows
    return totals.join(F.broadcast(picked), ["n_cal", "rank_r"], "left")


def map_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group Mean-Average-Precision@k of a retrieval ranking with
    binary relevance — the order-sensitive cousin of nDCG that rewards
    putting EVERY relevant item early, completing the ranking-eval
    family (AUC / PR / RR / nDCG / MAP):

        AP@k = Σ_{i≤k, rel_i} P@i  /  min(R, k),   P@i = (#rel in top i)/i

    ranked by (score DESC, id ASC); R = the group's total relevant
    count (the standard TREC normalization, so a group that can't fill
    k isn't penalized for it).

    Determinism (the ndcg_at_k discipline): each P@i term is
    micro-rounded to BIGINT at 1e6 BEFORE the associative integer sum
    — a raw double Σ is partition-order-dependent — and AP is ONE
    IEEE division of the exact micro-sum by 1e6·min(R,k). Groups with
    no relevant item report NULL.

    Plan: ONE group hash exchange feeds a single rank window whose
    frame also carries the running relevant-count (same partitioning,
    same order — one Window op), then the per-group aggregate. Returns
    (group, n_items, n_rel, ap_micro, ap)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    y = F.col(rel_col).cast("long")
    ranked = df.select(
        F.col(group_col),
        y.alias("__y"),
        F.row_number().over(w).alias("__rk"),
        F.sum(y).over(w).alias("__cum"),
    )
    term = F.when(
        (F.col("__y") == 1) & (F.col("__rk") <= k),
        F.round(
            F.col("__cum").cast("double") / F.col("__rk").cast("double") * 1e6
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("__y").cast("long").alias("n_rel"),
        F.sum(term).cast("long").alias("ap_micro"),
    )
    denom = F.least(F.col("n_rel"), F.lit(k).cast("long"))
    return agg.select(
        group_col,
        "n_items",
        "n_rel",
        "ap_micro",
        F.when(
            F.col("n_rel") > 0,
            F.col("ap_micro").cast("double")
            / (denom.cast("double") * 1e6),
        ).alias("ap"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Quantile normalization of a per-group score onto the GLOBAL
    distribution — the cross-source score harmonizer: source A's
    length/quality scores live on a different scale than source B's,
    so rank-map each value to the global value at the same quantile
    before any cross-source threshold or mixing decision.

        q_u        = (r_g − ½) / n_g          (mid-rank quantile in-group)
        norm_value = global value at rank ⌈q_u · N⌉   (percentile_disc)

    Exactness: both ranks are exact (a per-group rank window and one
    global :func:`ranked_cumsum` range exchange, ties broken by id),
    and the target rank is pure integer arithmetic — ⌈q·N⌉ =
    ((2r−1)·N + 2n_g − 1) DIV (2n_g) — no float quantile ever; the
    normalized value is an actual data value SELECTED by rank, never
    interpolated. Engine- and partitioning-exact.

    Scale shape: one group hash exchange (rank + n_g share the window
    partitioning), one global range exchange for the value ladder, one
    equi-join on the target rank. Returns
    (id, group, value, norm_value)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    ranked_g = df.select(
        F.col(id_col),
        F.col(group_col),
        F.col(value_col),
        F.row_number().over(w).cast("long").alias("__rg"),
        F.count(F.lit(1)).over(wn).cast("long").alias("__ng"),
    )
    ladder = global_row_number(
        df.select(F.col(value_col).alias("__v"), F.col(id_col).alias("__i")),
        [F.col("__v").asc(), F.col("__i").asc()],
        rank_name="__gr",
        num_partitions=num_partitions,
    ).select(F.col("__gr"), F.col("__v").alias("norm_value"))
    n_total = df.count()
    target = ranked_g.withColumn(
        "__gr",
        F.expr(
            f"((2 * __rg - 1) * {int(n_total)}L + 2 * __ng - 1) DIV (2 * __ng)"
        ),
    )
    return target.join(ladder, "__gr").select(
        id_col, group_col, value_col, "norm_value"
    )
