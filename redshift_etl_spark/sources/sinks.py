"""Warehouse sinks (SURVEY §2.1 S5/S6/S7).

The reference loads Redshift three ways: S3-staged COPY
(`Salesforce/Task/lambda_litify_task.py:40-48`), multi-row INSERT
(`Amazon Connect/connect_agent_metrics.py:108-131`), and row-by-row
keyed upsert (`…/lambda_connect_user_upsert.py:107-143`). In Spark all
three collapse to set-based operations:

- bulk append   → ``df.write.jdbc(..., mode="append")`` (executors
  write partitions in parallel — the COPY analog)
- staged upsert → stage the DataFrame, then a MERGE statement on the
  warehouse (or operators.merge.merge_scd1 when the target is a lake
  table). NEVER row-at-a-time probes.

The JDBC path is round-tripped in tests against embedded Apache Derby
(ships inside the Spark distribution — see tests/test_jdbc.py), so both
``jdbc_append`` and the generated MERGE execute against a real SQL
engine; ``parquet_table_sink`` is the lake-table sink with the same
interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str] | None = None
) -> None:
    """S5/S6 — parallel bulk append to a warehouse table. Partition
    count = write parallelism; coalesce upstream if the warehouse
    throttles concurrent loaders."""
    df.write.jdbc(url=url, table=table, mode="append", properties=properties or {})


def jdbc_staged_merge_sql(
    staging_table: str,
    target_table: str,
    key_cols: list[str],
    all_cols: list[str],
    quote: str = "",
) -> str:
    """S7 replacement — the MERGE statement to run warehouse-side after
    staging (the reference's stored-procedure body,
    `Salesforce/Task/SP_litify_task.sql:14-77`, generated instead of
    hand-written per object).

    ``quote`` wraps column identifiers (e.g. ``'"'``) for warehouses
    where the staged tables were created with exact-case quoted columns
    — Spark's JDBC writer quotes lowercase names, so case-sensitive
    engines (Derby, Postgres) need the MERGE to quote them too;
    Redshift's case-insensitive default needs none."""
    q = lambda c: f"{quote}{c}{quote}"  # noqa: E731
    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in key_cols)
    set_cols = ", ".join(
        f"{q(c)} = s.{q(c)}" for c in all_cols if c not in key_cols
    )
    ins_cols = ", ".join(q(c) for c in all_cols)
    ins_vals = ", ".join(f"s.{q(c)}" for c in all_cols)
    return (
        f"MERGE INTO {target_table} t USING {staging_table} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_cols} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def parquet_table_sink(df: DataFrame, path: str, mode: str = "append") -> None:
    """Lake-table sink used by tests and local pipelines."""
    df.write.mode(mode).parquet(path)


def jdbc_partitioned_read(
    spark,
    url: str,
    table: str,
    partition_col: str,
    lower: int,
    upper: int,
    num_partitions: int,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel warehouse EXTRACT — the read-side mirror of
    `jdbc_append`: ``num_partitions`` executors each issue a bounded
    range query on ``partition_col`` (Spark generates the WHERE
    clauses), so a 100 TB-adjacent warehouse table streams out in
    parallel instead of through one connection. Filters and column
    pruning applied to the returned DataFrame push down into the
    generated SQL (PushedFilters on the JDBC scan — asserted in
    tests/test_jdbc.py).

    The reference only ever reads its warehouse via stored procedures
    inside Redshift; an engine that replaces those needs the bulk
    extract path too (initial lake hydration, warehouse→lake CDC
    seeds). ``table`` may be a subquery alias — ``"(SELECT ...) t"`` —
    to push arbitrary projections server-side."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_col)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .options(**(properties or {}))
        .load()
    )
