"""commit_group / schema_drift (`sources/versioned.py`) — the
cross-table release contract: all-or-nothing pointer swaps, failure
before the swap phase leaves every pointer untouched, and the schema
tripwire reads footers only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redshift_etl_spark.sources import versioned as V


def _df(spark, n, cols="id: long"):
    return spark.range(n).select(F.col("id").cast("long").alias("id"))


def test_commit_group_all_tables_move_together(spark, tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    V.write_version(_df(spark, 3), ra)
    V.write_version(_df(spark, 5), rb)
    got = V.commit_group({ra: (_df(spark, 30), None), rb: (_df(spark, 50), None)})
    assert got == {ra: 1, rb: 1}
    assert V.current_version(ra) == 1 and V.current_version(rb) == 1
    assert V.read_current(spark, ra).count() == 30
    assert V.read_current(spark, rb).count() == 50


def test_commit_group_failure_before_swap_touches_no_pointer(spark, tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    V.write_version(_df(spark, 3), ra)
    V.write_version(_df(spark, 5), rb)

    # a frame that ANALYZES fine (explicit schema, listable dir) but
    # FAILS at execution: a directory holding a garbage "parquet" file
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    bad = spark.read.schema("id long").parquet(str(corrupt))
    with pytest.raises(Exception):
        # sorted order puts ra (tmp/a) first: its DATA stages fine,
        # rb's read fails during staging -> NO pointer moved
        V.commit_group({ra: (_df(spark, 30), None), rb: (bad, None)})
    assert V.current_version(ra) == 0 and V.current_version(rb) == 0
    assert V.read_current(spark, ra).count() == 3
    # the staged-but-unreferenced v=1 under ra is reclaimable garbage,
    # and the next commit overwrites/advances past it
    got = V.commit_group({ra: (_df(spark, 7), None), rb: (_df(spark, 9), None)})
    assert V.read_current(spark, ra).count() == 7
    assert V.read_current(spark, rb).count() == 9
    assert got[ra] >= 1 and got[rb] >= 1


def test_schema_drift_tripwire(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = spark.range(3).select(
        F.col("id"), F.lit("x").alias("name"), F.lit(1).cast("int").alias("flag")
    )
    V.write_version(v0, root)
    v1 = spark.range(3).select(
        F.col("id"),
        F.lit("x").alias("name"),
        F.lit(True).alias("flag"),  # type change
        F.lit(0.5).alias("score"),  # added
    )
    V.write_version(v1, root)
    drift = V.schema_drift(spark, root, 0)
    assert drift == [
        {"column": "flag", "change": "type_changed", "old_type": "int", "new_type": "boolean"},
        {"column": "score", "change": "added", "old_type": None, "new_type": "double"},
    ]
    # identical snapshots -> empty
    assert V.schema_drift(spark, root, 1, 1) == []
