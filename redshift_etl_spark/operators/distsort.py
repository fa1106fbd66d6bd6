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
) -> DataFrame:
    """Append global ``rank_name`` (row_number over the total order)
    and ``cumsum_name`` (running sum of ``value_col``, current row
    inclusive) to ``df`` — the distributed equivalent of

        row_number() OVER (ORDER BY ...)            AS rank,
        sum(v) OVER (ORDER BY ... ROWS UNBOUNDED
                     PRECEDING)                     AS cum_value

    ``order_by`` must be a TOTAL order (include a tiebreak column).
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    pid = F.spark_partition_id().alias("__pid")
    staged = ranged.select("*", pid)

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
