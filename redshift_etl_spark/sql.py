"""SQL surface — the reference's users write SQL (every `SP_*.sql` /
view in the repo), so the engine exposes its tables to `spark.sql`
directly: one call registers the testdata tables as temp views
(through `queries.tables.load`, so the nanos-timestamp conversion and
session conf apply), and any ANSI query runs on Catalyst unchanged.

The catalog's queries stay DataFrame-first (composability, plan
tests), but `sql_surface_demo` proves the SQL door: a multi-table
Spark-SQL text whose DuckDB twin is the SAME text modulo dialect —
the migration path for a reference user's existing SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries.tables import TABLES, load


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every testdata table as a temp view ``<prefix><name>``
    and return the view names. Views are lazy — no scan happens until
    a query references one."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register the views and run one ANSI query — the one-call entry
    for a SQL-first user."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
