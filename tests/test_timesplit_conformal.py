"""Purged time split, conformal threshold, PSI (wave-2 r10 operators) —
edge semantics the sf-oracle parity can't isolate: embargo accounting
identities, the finite-sample rank correction and its degenerate r > n
case, one-sided-bin exclusion from the PSI total."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from redshift_etl_spark.operators.distsort import conformal_threshold
from redshift_etl_spark.operators.quality import psi_report
from redshift_etl_spark.operators.sampling import purged_time_split


def _mk_events(spark, n=100):
    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(hours=i), i) for i in range(n)]
    return spark.createDataFrame(rows, "ts: timestamp, event_id: long")


def test_purged_split_accounting_identity(spark):
    n = 100
    df = _mk_events(spark, n)
    rep = purged_time_split(df, "ts", "event_id", k=5, embargo="INTERVAL 6 HOURS").collect()
    assert [r["fold"] for r in rep] == [0, 1, 2, 3, 4]
    for r in rep:
        assert r["n_test"] == 20
        assert r["n_test"] + r["n_train"] + r["n_purged"] == n
    # middle folds purge on both sides (6h embargo = 6 hourly rows per
    # side); edge folds only on their inner side
    assert rep[0]["n_purged"] == 6 and rep[4]["n_purged"] == 6
    assert all(r["n_purged"] == 12 for r in rep[1:4])
    # spans are contiguous and ordered
    for a, b in zip(rep, rep[1:]):
        assert a["test_end"] < b["test_start"]


def test_purged_split_zero_embargo_keeps_all_nontest(spark):
    df = _mk_events(spark, 50)
    rep = purged_time_split(df, "ts", "event_id", k=5, embargo="INTERVAL 0 HOURS").collect()
    assert all(r["n_purged"] == 0 and r["n_train"] == 40 for r in rep)


def test_conformal_rank_and_pick(spark):
    # scores 1..100; alpha=10% -> r = ceil(101*0.9) = 91 -> qhat = 91.0
    df = spark.createDataFrame(
        [(float(i), i) for i in range(1, 101)], "s: double, id: long"
    )
    row = conformal_threshold(df, "s", alpha_pct=10, tiebreak=F.col("id")).collect()[0]
    assert row["n_cal"] == 100
    assert row["rank_r"] == math.ceil(101 * 0.9) == 91
    assert row["qhat"] == 91.0


def test_conformal_degenerate_small_calibration_is_null(spark):
    # n=5, alpha=10%: r = ceil(6*0.9) = 6 > n -> vacuous guarantee, NULL
    df = spark.createDataFrame([(float(i), i) for i in range(5)], "s: double, id: long")
    row = conformal_threshold(df, "s", alpha_pct=10).collect()[0]
    assert row["n_cal"] == 5 and row["rank_r"] == 6
    assert row["qhat"] is None


def test_conformal_tie_stability(spark):
    # equal scores around the cut: any tiebreak must give the same qhat
    df = spark.createDataFrame(
        [(1.0, i) for i in range(50)] + [(2.0, 50 + i) for i in range(50)],
        "s: double, id: long",
    )
    a = conformal_threshold(df, "s", alpha_pct=10, tiebreak=F.col("id")).collect()[0]
    b = conformal_threshold(df, "s", alpha_pct=10, tiebreak=-F.col("id")).collect()[0]
    assert a["qhat"] == b["qhat"] == 2.0


def test_psi_hand_check_and_onesided_exclusion(spark):
    # bin 0: A 60 / B 40 of their sides; bin 1: A 40 / B 60;
    # bin 2: A-only (excluded from the total, counted one-sided)
    rows = (
        [(0, False)] * 60 + [(1, False)] * 40 + [(2, False)] * 10
        + [(0, True)] * 40 + [(1, True)] * 60
    )
    df = spark.createDataFrame(rows, "bin: int, side: boolean")
    out = {r["bin"]: r for r in psi_report(df, "bin", "side").collect()}
    ta, tb = 110, 100
    t0 = (60 / ta - 40 / tb) * math.log((60 / ta) / (40 / tb))
    assert out[0]["psi_term"] == t0
    assert out[2]["psi_term"] is None
    assert out[0]["n_onesided_bins"] == 1
    expected_total = (
        round(t0 * 1e12)
        + round((40 / ta - 60 / tb) * math.log((40 / ta) / (60 / tb)) * 1e12)
    ) / 1e12
    assert out[0]["psi_total"] == expected_total
    # total repeated identically on every row
    assert len({r["psi_total"] for r in out.values()}) == 1
