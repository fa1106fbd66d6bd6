"""ML feature-engineering operators — encodings a training pipeline
derives from the data itself (no external model, no Python row path).

Determinism policy (same as the rest of the engine): every statistic
is an exact BIGINT aggregate; the handful of IEEE double operations
that remain (a prior ratio, the smoothed blend) are single fixed-order
expressions spelled identically in the DuckDB oracles, so outputs are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m_estimate_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    m: int = 10,
    loo: bool = False,
    out_col: str = "enc",
) -> DataFrame:
    """Bayesian m-estimate target encoding (the standard smoothed
    category→rate feature; Micci-Barreca 2001):

        enc(c) = (pos_c + m·prior) / (n_c + m),   prior = P / N

    Small categories shrink toward the global prior, large ones
    approach their raw rate — the classic high-cardinality-categorical
    encoder that doesn't explode like one-hot.

    Exactness: pos/n/P/N are exact BIGINTs; ``prior`` is one IEEE
    division and the blend one fixed-order double expression —
    deterministic in any engine. (The all-integer cross-multiplied
    form ``(pos·N + m·P)/((n+m)·N)`` would be fully exact but
    overflows int64 at corpus scale — pos·N ~ 10²⁴ at 100 TB — so the
    deterministic-double spelling is the contract.)

    ``loo=False`` returns the per-category table (cat, n, pos, enc) —
    the artifact you persist and join at serving time. ``loo=True``
    returns ``df`` with an ``out_col`` column holding the
    LEAVE-ONE-OUT encoding ``(pos_c − y_i + m·prior)/(n_c − 1 + m)``
    — the train-time variant that doesn't leak the row's own label.

    Scale shape: one hash agg to the category table (+ a 1-row prior
    folded in by AQE-sized cross join); LOO adds one category hash
    join back onto the rows — no window, no broadcast hint (category
    cardinality is data-dependent)."""
    y = F.col(label_col).cast("int")
    per_cat = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("pos"),
    )
    totals = df.agg(
        F.count(F.lit(1)).cast("long").alias("__N"),
        F.sum(y).cast("long").alias("__P"),
    )
    prior = F.col("__P") / F.col("__N").cast("double")
    cat_table = per_cat.crossJoin(totals)
    if not loo:
        return cat_table.select(
            cat_col,
            "n",
            "pos",
            (
                (F.col("pos") + F.lit(m) * prior)
                / (F.col("n") + F.lit(m)).cast("double")
            ).alias(out_col),
        )
    joined = df.join(
        cat_table.select(cat_col, "n", "pos", "__N", "__P"), cat_col
    )
    return joined.select(
        *df.columns,
        (
            (F.col("pos") - y + F.lit(m) * prior)
            / (F.col("n") - 1 + F.lit(m)).cast("double")
        ).alias(out_col),
    )
