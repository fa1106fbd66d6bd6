"""Literal-SQL catalog slice: the Spark-side text and the DuckDB oracle
must be the SAME string (the whole point — a twin that can't drift),
and the texts must analyze on Spark over the registered views."""

from __future__ import annotations

from redshift_etl_spark.queries import sqltext


def test_slice_registers_ten_same_text_twins():
    assert len(sqltext.QUERIES) == 10
    assert set(sqltext.QUERIES) == set(sqltext.ORACLES)
    for name in sqltext.QUERIES:
        src = name.removeprefix("sql_")
        assert sqltext.ORACLES[name] is sqltext._SOURCE_ORACLES[src], (
            f"{name}: oracle text is not the identical string object"
        )


def test_slice_analyzes_and_matches_dataframe_twin(spark):
    # one end-to-end representative: the literal text over registered
    # views must produce the same rows as the DataFrame original
    from redshift_etl_spark.queries import tpch_shapes

    sf = "/root/testdata/sf0.001"
    sql_rows = sorted(
        tuple(r)
        for r in sqltext.QUERIES["sql_regional_revenue"](spark, sf).collect()
    )
    df_rows = sorted(
        tuple(r)
        for r in tpch_shapes.QUERIES["regional_revenue"](spark, sf).collect()
    )
    assert sql_rows == df_rows
