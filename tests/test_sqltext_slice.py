"""Literal-SQL catalog slice: the Spark-side text and the DuckDB oracle
must be the SAME string (the whole point — a twin that can't drift),
and the texts must analyze on Spark over the registered views."""

from __future__ import annotations

from redshift_etl_spark.queries import sqltext


def test_slice_registers_same_text_twins():
    # 10 promoted TPC-H shapes (r11) + the two reference views (r12:
    # sql_agent_metrics carries its own shared-dialect text;
    # sql_agent_metrics_2 promotes view 2's oracle directly) + the SP
    # change-detection text (r13: sql_changed_or_new promotes the
    # changed_or_new oracle — `SP_litify_task.sql:6-11`'s shape)
    assert len(sqltext.QUERIES) == 13
    assert set(sqltext.QUERIES) == set(sqltext.ORACLES)
    for name in sqltext._PROMOTED:
        assert (
            sqltext.ORACLES[f"sql_{name}"]
            is sqltext._SOURCE_ORACLES[name]
        ), f"sql_{name}: oracle text is not the identical string object"
    # the capstone twins are the same string OBJECT on both engines too
    assert (
        sqltext.ORACLES["sql_agent_metrics"]
        is sqltext._AGENT_METRICS_SHARED
    )
    assert sqltext.ORACLES["sql_agent_metrics_2"] is sqltext._V2_TEXT


def test_capstone_view_matches_dataframe_flagship(spark):
    # the literal view text must produce the same rows as the
    # DataFrame flagship it renders (modulo column order)
    from redshift_etl_spark.queries import agent_metrics as AM

    sf = "/root/testdata/sf0.001"
    sql_df = sqltext.QUERIES["sql_agent_metrics"](spark, sf)
    df = AM.agent_metrics(spark, sf)
    assert sorted(c.lower() for c in sql_df.columns) == sorted(
        c.lower() for c in df.columns
    )
    cols = sorted(sql_df.columns)
    a = sorted(map(tuple, sql_df.select(*cols).collect()))
    b = sorted(map(tuple, df.select(*cols).collect()))
    assert a == b


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
