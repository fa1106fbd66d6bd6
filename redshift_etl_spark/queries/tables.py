"""Testdata table access.

All queries take an ``sf_dir`` pointing at the driver's parquet tables
(TESTDATA.md). Reads are bare ``spark.read.parquet`` — schema lives in
the footer, and Catalyst handles column pruning + predicate pushdown, so
a query that touches 2 columns scans 2 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) in the driver parquet. Spark's
# reader has no nanos type, so the session sets
# `spark.sql.legacy.parquet.nanosAsLong` and we convert here —
# floor-division to micros, the same truncation DuckDB applies.
_NANOS_TS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _ensure_conf(spark: SparkSession) -> None:
    """Make a caller-provided session (e.g. the driver's) read the
    testdata correctly: nanos timestamps as long (converted below) and
    UTC session timezone so wall-clock values match the DuckDB oracle.
    Both are runtime-settable SQL confs."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANOS_TS.get(name, ()):
        dt = df.schema[col].dataType
        if isinstance(dt, T.LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
        elif isinstance(dt, T.TimestampNTZType):
            # writer-dependent: some testdata generations store micros
            # NTZ instead of nanos-long. Canonicalize to TIMESTAMP so
            # every downstream epoch/tz function sees one type; session
            # tz is UTC, so the wall-clock value is preserved.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
