"""As-of join — for each left row, the most recent right row at-or-
before (or strictly before) its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive
formulations are a range join (O(n·m) nested loop) or join+groupBy-max+
rejoin (three shuffles). This implementation is the single-shuffle
merge: union both sides tagged, hash-partition by key, sort by (time,
side), and carry the latest right values forward with
``last(ignorenulls)`` over an unbounded-preceding window — the
distributed equivalent of pandas ``merge_asof``. Cost: ONE shuffle of
(left + right), no duplication, no range explosion; skewed keys are
split by AQE like any window.

Right-side ties (same key, same time) must be resolved by the caller
(dedupe to one row per (key, time)) — same requirement DuckDB's ASOF
imposes for determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: left columns + ``value_cols`` from the matched
    right row (NULL when no right row precedes).

    inclusive=True  → right_time <= left_time (DuckDB ``ON l.t >= r.t``)
    inclusive=False → right_time <  left_time (previous-row semantics)

    ``tolerance`` (pandas merge_asof parity): a SQL expression string
    — ``"INTERVAL 1 HOUR"`` for timestamps, ``"5"`` for a numeric
    axis — bounding how STALE the matched right row may be: a match
    older than ``left_time − tolerance`` is reported as no-match
    (NULL values), which is what "the last heartbeat, if recent" means
    operationally. Exact pandas parity: the returned value is the
    MATCHED row's value — if the newest preceding right row holds NULL
    in a value column, NULL is returned (not an older non-null value),
    and the freshness gate judges the matched row's own time. Same
    single-shuffle plan; the gate is a projection on the carried
    (time, value) struct. Callers must ensure right rows are
    unique per (key, time) — equal-time right rows have no defined
    winner (dedup with a max_by first, as `asof_prev_order` does).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns

    # tag order decides whether an equal-time right row is visible to
    # the left row: right first (0) = inclusive, left first = strict
    right_tag, left_tag = (0, 1) if inclusive else (1, 0)

    l_side = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__side"),
        *[F.col(c) for c in lcols if c not in keys],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    r_side = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_side.unionByName(r_side)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry (time, value) as ONE struct per value column: the struct is
    # non-null for every right row (even when the value itself is NULL),
    # so `last ignorenulls` lands on the MATCHED row — pandas merge_asof
    # returns the matched row's value, NULL included. Carrying the bare
    # value would skip a newest-but-NULL right row back to an older
    # non-null one, and the tolerance gate would then judge freshness by
    # the wrong row's time. All structs share one window spec → still a
    # single exchange + sort.
    carried = unioned.select(
        *unioned.columns,
        *[
            F.last(
                F.when(
                    F.col("__side") == right_tag,
                    F.struct(
                        F.col("__t").alias("t"),
                        F.col(f"__r_{c}").alias("v"),
                    ),
                ),
                ignorenulls=True,
            ).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
    )
    is_left = F.col("__side") == left_tag

    def gated(c: str):
        if tolerance is None:
            return F.col(f"__m_{c}.v")
        fresh = F.col(f"__m_{c}.t") >= F.expr(f"__t - {tolerance}")
        return F.when(fresh, F.col(f"__m_{c}.v"))

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__t").alias(left_time)]
        + [F.col(c) for c in lcols if c not in keys and c != left_time]
        + [gated(c).alias(c) for c in value_cols]
    )
    return carried.filter(is_left).select(*out_cols)


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    matched_time: str = "matched_time",
) -> DataFrame:
    """NEAREST as-of join: for each left row, the right row minimizing
    |t_left − t_right| per key — pandas ``merge_asof(direction=
    'nearest')``, which neither Spark nor DuckDB has natively. The
    matched right time is returned as ``matched_time`` (NULL when the
    key has no right rows at all).

    Same single-shuffle merge as :func:`asof_join`: both sides union
    into one key partitioning, and the backward candidate
    (``last ignorenulls`` over unbounded-preceding) and forward
    candidate (``first ignorenulls`` over unbounded-following) ride
    the SAME sort order — two frames, one window exchange, no second
    sort. A left row then picks whichever candidate is closer.

    Determinism: distances compare in epoch-seconds doubles (exact
    casts of the same timestamps in any engine); an equal-distance
    tie goes to the BACKWARD (at-or-before) candidate — and an
    equal-TIME right row sorts before the left row, so it is the
    backward candidate at distance zero. Right rows must be unique
    per (key, time) — the same determinism contract asof_join and
    DuckDB's ASOF impose."""
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns

    l_side = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in keys],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    r_side = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in keys
        ],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_time).alias("__rt"),
    )
    unioned = l_side.unionByName(r_side)

    order = [F.col("__t").asc(), F.col("__side").asc()]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *unioned.columns,
        F.last("__rt", ignorenulls=True).over(w_back).alias("__b_rt"),
        F.first("__rt", ignorenulls=True).over(w_fwd).alias("__f_rt"),
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w_back)
            .alias(f"__b_{c}")
            for c in value_cols
        ],
        *[
            F.first(f"__r_{c}", ignorenulls=True)
            .over(w_fwd)
            .alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    tn = F.col("__t").cast("timestamp").cast("double")
    b_tn = F.col("__b_rt").cast("timestamp").cast("double")
    f_tn = F.col("__f_rt").cast("timestamp").cast("double")
    pick_back = F.col("__b_rt").isNotNull() & (
        F.col("__f_rt").isNull() | ((tn - b_tn) <= (f_tn - tn))
    )
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("__t").alias(left_time)]
        + [F.col(c) for c in lcols if c not in keys and c != left_time]
        + [
            F.when(pick_back, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(c)
            for c in value_cols
        ]
        + [
            F.when(pick_back, F.col("__b_rt"))
            .otherwise(F.col("__f_rt"))
            .alias(matched_time)
        ]
    )
    return carried.filter(F.col("__side") == 1).select(*out_cols)
