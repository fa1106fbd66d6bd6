"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship agent-metrics query (the reference's
`Amazon Connect/Views/view_agent_metrics.sql` re-expressed over the
testdata star schema) at sf0.001. ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the LLM-data-pipeline
operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from redshift_etl_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.agent_metrics.agent_metrics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names,
    same canonical semantics)."""
    return Q.all_oracles()
