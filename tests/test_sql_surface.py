"""SQL surface (`redshift_etl_spark/sql.py`): views register lazily,
arbitrary ANSI text runs, and results equal the DataFrame route."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.queries.tables import load
from redshift_etl_spark.sql import register_tables, run_sql

from .conftest import SF_SMOKE


def test_register_and_query(spark):
    names = register_tables(spark, SF_SMOKE)
    assert "lineitem" in names and len(names) == 10
    got = spark.sql(
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY 1"
    ).collect()
    want = (
        load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_run_sql_one_call(spark):
    df = run_sql(
        spark,
        SF_SMOKE,
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders "
        "WHERE o_orderpriority = '1-URGENT'",
    )
    assert df.collect()[0]["n"] > 0
