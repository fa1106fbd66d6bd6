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
    """Append global ``rank_name`` (row_number over the total order)
    and ``cumsum_name`` (running sum of ``value_col``, current row
    inclusive) to ``df`` — the distributed equivalent of

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
    """
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
        F.sum(value_col).over(local_w).alias("__local_sum"),
    )

    # Offsets: one row per shuffle partition — bounded by
    # spark.sql.shuffle.partitions (cluster config), NOT by the data,
    # so the unpartitioned window over it is a bounded frame (guard-
    # test allowlist).
    totals = staged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(value_col).alias("__s"),
    )
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "__pid",
        (F.sum("__n").over(off_w) - F.col("__n")).alias("__rn_off"),
        (F.sum("__s").over(off_w) - F.col("__s")).alias("__sum_off"),
    )

    out = local.join(F.broadcast(offsets), "__pid").select(
        *[c for c in df.columns],
        (F.col("__local_rn") + F.col("__rn_off"))
        .cast("long")
        .alias(rank_name),
        (F.col("__local_sum") + F.col("__sum_off")).alias(cumsum_name),
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
