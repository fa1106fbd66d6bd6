"""CMH / McNemar / Welch — the r11 experiment-analysis trio:
hand-checked values, exactly-two-variants contracts, degenerate NULLs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from redshift_etl_spark.operators.quality import (
    cmh_test,
    mcnemar_test,
    welch_ttest,
)


def test_cmh_hand_check(spark):
    rows = [
        # stratum 1: A 1/2, B 1/2
        ("s1", "A", 1), ("s1", "A", 0), ("s1", "B", 1), ("s1", "B", 0),
        # stratum 2: A 1/1, B 0/1
        ("s2", "A", 1), ("s2", "B", 0),
    ]
    df = spark.createDataFrame(rows, "st string, v string, s long")
    out = cmh_test(df, "st", "v", "s").first()
    assert out["n_variants"] == 2 and out["n_strata"] == 2
    assert (out["n_a"], out["x_a"], out["n_b"], out["x_b"]) == (3, 2, 3, 1)
    # s1: e=1, v=1/3, orn=ord=0.25 ; s2: e=0.5, v=0.25, orn=0.5, ord=0
    # O-E = 0.5, V = 0.583333333 (nano-fixed), OR = 0.75/0.25 = 3
    assert math.isclose(out["chi2_cmh"], 0.25 / 0.583333333)
    assert out["or_mh"] == 3.0


def test_cmh_three_variants_null(spark):
    df = spark.createDataFrame(
        [("s1", "A", 1), ("s1", "B", 0), ("s1", "C", 1)],
        "st string, v string, s long",
    )
    out = cmh_test(df, "st", "v", "s").first()
    assert out["n_variants"] == 3
    assert out["chi2_cmh"] is None and out["or_mh"] is None


def test_mcnemar_hand_check(spark):
    rows = (
        [(1, 1)] * 2 + [(0, 0)] * 1 + [(1, 0)] * 3 + [(0, 1)] * 1
    )
    df = spark.createDataFrame(rows, "ca int, cb int")
    out = mcnemar_test(df, F.col("ca") == 1, F.col("cb") == 1).first()
    assert out["n_items"] == 7
    assert out["n_both_right"] == 2 and out["n_both_wrong"] == 1
    assert out["n_a_only"] == 3 and out["n_b_only"] == 1
    assert out["chi2"] == (3 - 1) ** 2 / 4  # discordant-only signal


def test_mcnemar_no_discordant_is_null(spark):
    df = spark.createDataFrame([(1, 1), (0, 0)], "ca int, cb int")
    out = mcnemar_test(df, F.col("ca") == 1, F.col("cb") == 1).first()
    assert out["chi2"] is None


def test_welch_hand_check(spark):
    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0), ("B", 4.0)]
    df = spark.createDataFrame(rows, "v string, value double")
    out = welch_ttest(df, "v", "value").first()
    assert (out["n_a"], out["n_b"]) == (3, 2)
    assert out["mean_a"] == 2.0 and out["mean_b"] == 3.0
    # s2_a=1, s2_b=2 -> se2 = 1/3 + 1 ; t = -1/sqrt(4/3)
    assert math.isclose(out["t"], -1 / math.sqrt(4 / 3))
    assert math.isclose(out["df"], (4 / 3) ** 2 / (1 / 18 + 1))


def test_welch_single_row_variant_is_null(spark):
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 5.0)], "v string, value double"
    )
    out = welch_ttest(df, "v", "value").first()
    assert out["t"] is None and out["df"] is None


def test_welch_null_values_excluded(spark):
    """ADVICE r11: NULL outcomes must not land in n while SUM skips
    them in Σy/Σy² — the NULL-padded frame must agree exactly with the
    same frame minus its NULL rows."""
    base = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0), ("B", 4.0)]
    padded = base + [("A", None), ("B", None), ("B", None)]
    df = spark.createDataFrame(padded, "v string, value double")
    out = welch_ttest(df, "v", "value").first()
    ref = welch_ttest(
        spark.createDataFrame(base, "v string, value double"), "v", "value"
    ).first()
    assert out == ref
    assert (out["n_a"], out["n_b"]) == (3, 2)  # NULLs not in n
    assert out["mean_a"] == 2.0 and out["mean_b"] == 3.0


def test_mcnemar_null_flags_excluded(spark):
    """ADVICE r11: items one classifier left unscored (NULL flag) are
    excluded entirely — the four cells must keep summing to n_items."""
    rows = (
        [(1, 1)] * 2 + [(0, 0)] * 1 + [(1, 0)] * 3 + [(0, 1)] * 1
        + [(None, 1), (1, None), (None, None)]
    )
    df = spark.createDataFrame(rows, "ca int, cb int")
    out = mcnemar_test(df, F.col("ca") == 1, F.col("cb") == 1).first()
    assert out["n_items"] == 7
    assert (
        out["n_both_right"] + out["n_both_wrong"]
        + out["n_a_only"] + out["n_b_only"]
    ) == out["n_items"]
    assert out["chi2"] == (3 - 1) ** 2 / 4
