"""Plan inspection — programmatic checks over Catalyst physical plans.

The engine's scale posture is enforced here, not hoped for: tests
assert that dim joins BROADCAST, that filters and projections reach the
parquet scan (PushedFilters / ReadSchema), and that an operator's plan
carries no more shuffles (Exchange) than its algebra requires.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan.
    AQE may coalesce partitions at runtime but cannot remove a shuffle
    boundary — this is the structural count."""
    return len(re.findall(r"\bExchange\b(?! SinglePartition)", physical_plan(df)))


def count_broadcasts(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastExchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or (
        "BroadcastNestedLoopJoin" in physical_plan(df)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scanned_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning check."""
    cols = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols.append([c.split(":")[0] for c in m.group(1).split(",") if c])
    return cols


def assert_scan_pruned(df: DataFrame, table_cols: int) -> None:
    """Raise if any scan reads every column of a wider table (a scan
    that reads all columns for a narrow projection is wrong)."""
    for cols in scanned_columns(df):
        if len(cols) >= table_cols:
            raise AssertionError(
                f"unpruned scan: {len(cols)} columns read ({cols})"
            )


def plan_tree(df: DataFrame) -> str:
    """Operator tree only — the first block of the formatted plan. In
    the full formatted output every operator appears twice (tree +
    per-operator detail section), so substring counts over it double;
    counts over the tree are exact."""
    return physical_plan(df).split("\n\n")[0]


def final_plan_tree(df: DataFrame) -> str:
    """Operator tree of the FINAL adaptive plan: executes the frame
    (rows discarded) so AQE's runtime re-plan — e.g. the SMJ→broadcast
    conversion it makes from actual frame sizes — is visible. Use when
    the posture under test is a deliberate runtime decision instead of
    a forced static hint (per-key frames of caller-controlled
    cardinality must NOT carry a broadcast hint; AQE broadcasts them
    when they are actually small)."""
    df.collect()
    tree = plan_tree(df)
    # after execution the tree block holds "== Final Plan ==" followed
    # by "== Initial Plan ==" — keep only the final section so operator
    # counts don't double
    if "== Initial Plan ==" in tree:
        tree = tree.split("== Initial Plan ==")[0]
    return tree


def final_tree_count(df: DataFrame, op: str) -> int:
    return len(re.findall(rf"\b{op}\b", final_plan_tree(df)))


def tree_count(df: DataFrame, op: str) -> int:
    """Exact occurrence count of a physical operator in the plan tree."""
    return len(re.findall(rf"\b{op}\b", plan_tree(df)))


def has_cross_product(df: DataFrame) -> bool:
    """True if the plan contains any all-pairs join — CartesianProduct
    or BroadcastNestedLoopJoin. Scale-path operators (dedup candidate
    generation, bucketed ANN) must never plan one: an OR of equalities
    or a pure inequality join silently degrades to O(n²)."""
    tree = plan_tree(df)
    return "CartesianProduct" in tree or "BroadcastNestedLoopJoin" in tree
