"""Local stand-in for the driver's DuckDB-oracle comparison: row count,
column-name set, and an order-insensitive value comparison (columns
sorted by name, rows sorted, cell-wise equality with exact semantics —
floats must match after each side's own rounding, mirroring a hash
compare)."""

from __future__ import annotations

import math
from datetime import date, datetime


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — the driver hashes values, so we demand exactness
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    return v


def rows_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    # NULL-safe sort (full-outer joins produce None cells)
    return sorted(normed, key=lambda row: [(c is None, str(c)) for c in row])


def compare(spark_df, duck_con, sql: str, name: str = "") -> None:
    sp_cols = [c.lower() for c in spark_df.columns]
    sp_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(sql)
    dk_cols = [d[0].lower() for d in rel.description]
    dk_rows = rel.fetchall()

    assert sorted(sp_cols) == sorted(dk_cols), (
        f"{name}: column mismatch {sorted(sp_cols)} vs {sorted(dk_cols)}"
    )
    assert len(sp_rows) == len(dk_rows), (
        f"{name}: row count {len(sp_rows)} vs {len(dk_rows)}"
    )
    sk = rows_key(sp_rows, sp_cols)
    dk = rows_key(dk_rows, dk_cols)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
