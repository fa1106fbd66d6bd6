"""Physical-plan posture checks — the scale contract, asserted.

These tests fail if a future change silently turns a broadcast join
into a shuffle join, un-prunes a scan, or drops a filter pushdown.
"""

from __future__ import annotations

from redshift_etl_spark import plans as P
from redshift_etl_spark import queries as Q

from .conftest import SF_ORACLE


def test_star_join_broadcasts_dims(spark):
    df = Q.all_queries()["agent_metrics"](spark, SF_ORACLE)
    assert P.has_broadcast_join(df)
    assert P.count_broadcasts(df) >= 3  # customer, nation, region


def test_star_filter_project_no_shuffle(spark):
    # project+filter+broadcast joins — nothing in this plan may shuffle
    df = Q.all_queries()["star_filter_project"](spark, SF_ORACLE)
    assert P.count_shuffles(df) == 0
    assert P.count_broadcasts(df) >= 2


def test_filter_pushdown_reaches_scan(spark):
    df = Q.all_queries()["pricing_summary"](spark, SF_ORACLE)
    pushed = " ".join(P.pushed_filters(df))
    assert "l_shipdate" in pushed


def test_column_pruning(spark):
    # lineitem has 11 columns; pricing reads 8, star projection reads 5
    df = Q.all_queries()["star_filter_project"](spark, SF_ORACLE)
    P.assert_scan_pruned(df, table_cols=11)
    scans = P.scanned_columns(df)
    li_scan = next(s for s in scans if "l_orderkey" in s)
    assert len(li_scan) == 5


def test_dedup_scan_reads_only_needed_columns(spark):
    df = Q.all_queries()["dedup_exact"](spark, SF_ORACLE)
    scans = P.scanned_columns(df)
    assert scans and all(set(s) <= {"doc_id", "text"} for s in scans)
