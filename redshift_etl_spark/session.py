"""SparkSession factory.

Tuned for the driver harness (local[N]) but with settings that scale to a
real cluster: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow for any Python exchange, UTC session timezone so
timestamp semantics match the DuckDB oracle exactly (parquet stores
UTC-adjusted instants; DuckDB reads them naive-UTC).

The reference pins America/New_York local-naive timestamps
(`Amazon Connect/connect_agent_metrics.py:94-95`); the engine treats the
zone as configuration — pass ``timezone="America/New_York"`` for
reference-parity pipelines, keep UTC for oracle comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "redshift_etl_spark",
    master: str | None = None,
    timezone: str = "UTC",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", timezone)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # The driver testdata stores TIMESTAMP(NANOS), which the Spark
        # parquet reader rejects; read as long and convert in the loader
        # (queries/tables.py) — truncation to micros matches DuckDB.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
