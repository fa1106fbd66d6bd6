"""Z-order (Morton-curve) clustering — multi-column data skipping for
the lake.

A 100 TB table is pruned at read time by parquet file/page min-max
stats, but a layout sorted on ONE column gives skipping on that column
only: a filter on any other column overlaps every file. Interleaving
the bits of several bucketed columns into one Morton z-value and
range-laying-out files by it gives every interleaved column locally
narrow min/max ranges — the standard lakehouse `OPTIMIZE ZORDER BY`
(Delta) / `sort_order` (Iceberg) trick, here as a plain operator over
any DataFrame + parquet.

Shape: one bounded stats pass (per-column min/max — driver-side
scalars, the codebook-class metadata exception), then a pure per-row
projection computes the z-value, then ONE range exchange on it lays
out the files. The z-value arithmetic is integer div/mod only —
generated from the same constants for Spark and any SQL oracle, so
the assignment is engine-portable and partition-independent.

Bucketing uses fixed-width min-max scaling: bucket =
floor((v − mn) · (2^bits − 1) / (mx − mn)), an IEEE-exact expression
both engines evaluate identically (one subtract, one multiply, one
divide, one floor — same association order in the generated text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zvalue_sql",
    "bucket_sql",
    "zorder_layout",
    "write_zordered",
]


def bucket_sql(col_sql: str, mn_sql: str, mx_sql: str, bits: int) -> str:
    """Fixed-width bucket of ``col_sql`` into [0, 2^bits) given SQL
    expressions for the column's global min/max (float literals on the
    Spark side, a stats-CTE column on the oracle side — numerically
    the same doubles either way, since MIN/MAX select existing values
    exactly and repr round-trips them). The generated text is
    floor/arithmetic only with a fixed association order, so both
    engines make the identical IEEE decision at every bucket boundary.
    Degenerate constant columns collapse to bucket 0."""
    k = (1 << bits) - 1
    return (
        f"CASE WHEN ({mx_sql}) <= ({mn_sql}) THEN 0 ELSE "
        f"CAST(floor((CAST({col_sql} AS DOUBLE) - ({mn_sql})) * {k} "
        f"/ (({mx_sql}) - ({mn_sql}))) AS BIGINT) END"
    )


def zvalue_sql(
    bucket_sqls: list[str], bits: int, intdiv: str = "div"
) -> str:
    """Morton interleave of pre-bucketed columns as one integer
    expression: bit i of column c lands at position i·n + c. Pure
    div/mod/multiply/add so the text is portable; ``intdiv`` is the
    engine's integer-division token (Spark SQL ``div``, DuckDB
    ``//``)."""
    n = len(bucket_sqls)
    terms = []
    for i in range(bits):
        for c_idx, bs in enumerate(bucket_sqls):
            w = 1 << (i * n + c_idx)
            terms.append(f"((({bs}) {intdiv} {1 << i}) % 2) * {w}")
    return " + ".join(terms)


def _stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    out_col: str = "zvalue",
) -> DataFrame:
    """Append the Morton z-value over ``cols``: one bounded min/max
    stats pass, then a per-row projection. Sorting/range-partitioning
    by ``out_col`` clusters rows so every participating column gets
    narrow per-file min/max ranges (multi-dimension skipping)."""
    stats = _stats(df, cols)
    buckets = [
        # an all-NULL (or empty) column has no min/max: degenerate to
        # bucket 0 rather than interpolating a None literal into SQL
        "0"
        if stats[c][0] is None or stats[c][1] is None
        else bucket_sql(
            f"`{c}`", repr(stats[c][0]), repr(stats[c][1]), bits
        )
        for c in cols
    ]
    return df.withColumn(
        out_col, F.expr(zvalue_sql(buckets, bits, intdiv="div"))
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` as ~``n_files`` parquet files laid out along the
    z-curve: range exchange on the z-value (the one shuffle) + sort
    within each task so file AND page stats are tight on every
    z-ordered column. The helper z-value column is not persisted."""
    laid = zorder_layout(df, cols, bits, out_col="__z")
    (
        laid.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
