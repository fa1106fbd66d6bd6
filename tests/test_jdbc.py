"""JDBC round-trip for the warehouse sinks (SURVEY §2.1 S5/S6/S7).

Uses embedded Apache Derby — it ships inside the Spark distribution
itself (derby*.jar on every Spark classpath), so the test exercises the
REAL ``df.write.jdbc`` / ``spark.read.jdbc`` code path and executes the
generated MERGE statement on a real SQL engine, with zero external
dependencies. Derby is in-memory-per-JVM; in local mode the executors
share the driver JVM, so parallel partition writes land in one store —
at scale the same code points at a networked warehouse URL instead.
"""

from __future__ import annotations

import pytest

from redshift_etl_spark.operators import merge as M
from redshift_etl_spark.sources import sinks

URL = "jdbc:derby:memory:graftdb;create=true"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _exec_sql(spark, sql: str) -> None:
    """Run a statement warehouse-side (the reference's stored-procedure
    EXECUTE), via the JVM's DriverManager on the same embedded DB."""
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    try:
        stmt = conn.createStatement()
        stmt.execute(sql)
        stmt.close()
    finally:
        conn.close()


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "id bigint, amount double, tag string",
    )
    staging = spark.createDataFrame(
        [(2, 99.0, "B"), (4, 40.0, "d")],
        "id bigint, amount double, tag string",
    )
    return target, staging


def test_jdbc_append_round_trip(spark, frames):
    """S5/S6 — write a DataFrame through the real JDBC path and read it
    back unchanged."""
    target, _ = frames
    sinks.jdbc_append(target, URL, "rt_append", properties=PROPS)
    back = spark.read.jdbc(URL, "rt_append", properties=PROPS)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in target.collect()
    }
    _exec_sql(spark, "DROP TABLE rt_append")


def test_jdbc_staged_merge_round_trip(spark, frames):
    """S7 — stage via jdbc_append, run the GENERATED MERGE on the
    warehouse, read back: matched keys updated, new keys inserted.
    The same statement text the reference's stored procedure shape
    produces, executed on a real SQL engine."""
    target, staging = frames
    sinks.jdbc_append(target, URL, "mt_target", properties=PROPS)
    sinks.jdbc_append(staging, URL, "mt_staging", properties=PROPS)
    sql = sinks.jdbc_staged_merge_sql(
        "mt_staging", "mt_target", ["id"], ["id", "amount", "tag"],
        quote='"',
    )
    _exec_sql(spark, sql)
    back = spark.read.jdbc(URL, "mt_target", properties=PROPS)
    got = {tuple(r) for r in back.collect()}
    assert got == {
        (1, 10.0, "a"),
        (2, 99.0, "B"),  # matched → updated
        (3, 30.0, "c"),
        (4, 40.0, "d"),  # not matched → inserted
    }
    _exec_sql(spark, "DROP TABLE mt_target")
    _exec_sql(spark, "DROP TABLE mt_staging")


def test_jdbc_merge_agrees_with_lake_merge(spark, frames):
    """The warehouse MERGE and the lake-side merge_scd1 implement the
    same upsert algebra: staging rows win on key collision, new keys
    append. (merge_scd1 additionally honors recency; with staging
    strictly newer the two must agree row-for-row.)"""
    target, staging = frames
    # make staging strictly newer by the recency column (amount here is
    # data; add an explicit version column for recency)
    from pyspark.sql import functions as F

    tgt = target.withColumn("ver", F.lit(1))
    stg = staging.withColumn("ver", F.lit(2))
    lake = M.merge_scd1(tgt, stg, "id", "ver")

    sinks.jdbc_append(tgt, URL, "ag_target", properties=PROPS)
    sinks.jdbc_append(stg, URL, "ag_staging", properties=PROPS)
    _exec_sql(
        spark,
        sinks.jdbc_staged_merge_sql(
            "ag_staging", "ag_target", ["id"], ["id", "amount", "tag", "ver"],
            quote='"',
        ),
    )
    back = spark.read.jdbc(URL, "ag_target", properties=PROPS)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in lake.collect()
    }
    _exec_sql(spark, "DROP TABLE ag_target")
    _exec_sql(spark, "DROP TABLE ag_staging")


def test_jdbc_partitioned_parallel_read(spark):
    """Read-side mirror: bounded range partitions, real parallelism,
    and filter pushdown into the generated SQL."""
    src = spark.range(0, 200).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS v"
    )
    sinks.jdbc_append(src, URL, "bulk_src", PROPS)
    back = sinks.jdbc_partitioned_read(
        spark, URL, "bulk_src", "id", 0, 200, 4,
        {"driver": PROPS["driver"]},
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200
    assert {r["id"] for r in back.collect()} == set(range(200))
    filtered = back.filter("id >= 150").select("id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(id,150" in plan
    assert filtered.count() == 50
