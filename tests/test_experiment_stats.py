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


# --- CUPED / DiD / bootstrap / NDV estimate (r12 additions) ----------------

def test_cuped_theta_and_adjusted_means_vs_numpy(spark):
    import numpy as np

    from redshift_etl_spark.operators.quality import cuped_ttest

    rows = [
        ("A", 1.0, 2.0), ("A", 2.0, 3.0), ("A", 3.0, 5.0), ("A", 4.0, 5.5),
        ("B", 1.0, 3.0), ("B", 2.0, 4.5), ("B", 3.0, 6.0), ("B", 4.0, 7.0),
    ]
    df = spark.createDataFrame(rows, "v string, x double, y double")
    out = cuped_ttest(df, "v", "x", "y").first()
    x = np.array([r[1] for r in rows])
    y = np.array([r[2] for r in rows])
    theta = ((x * y).mean() - x.mean() * y.mean()) / (
        (x * x).mean() - x.mean() ** 2
    )
    assert abs(out["theta"] - theta) < 1e-12
    xa, ya = x[:4], y[:4]
    assert abs(out["adj_mean_a"] - (ya.mean() - theta * (xa.mean() - x.mean()))) < 1e-12
    # balanced covariate (x̄_a == x̄_b): the adjusted DIFFERENCE equals
    # the raw difference — CUPED only removes variance, never the effect
    raw_diff = ya.mean() - y[4:].mean()
    assert abs((out["adj_mean_a"] - out["adj_mean_b"]) - raw_diff) < 1e-12
    assert out["t"] is not None and out["df"] is not None


def test_cuped_variance_reduction_vs_welch(spark):
    """A strongly-correlated covariate must tighten the test: |t_cuped|
    > |t_welch| on the same effect."""
    import math
    import random

    from redshift_etl_spark.operators.quality import cuped_ttest, welch_ttest

    rng = random.Random(7)
    rows = []
    for i in range(200):
        x = round(rng.uniform(0, 100), 2)
        noise = round(rng.uniform(-2, 2), 2)
        v = "A" if i % 2 == 0 else "B"
        lift = 1.0 if v == "B" else 0.0
        rows.append((v, x, round(x + noise + lift, 2)))
    df = spark.createDataFrame(rows, "v string, x double, y double")
    t_c = cuped_ttest(df, "v", "x", "y").first()["t"]
    t_w = welch_ttest(df, "v", "y").first()["t"]
    assert abs(t_c) > 2 * abs(t_w)
    assert math.isfinite(t_c)


def test_cuped_constant_covariate_reports_null(spark):
    from redshift_etl_spark.operators.quality import cuped_ttest

    rows = [("A", 5.0, 1.0), ("A", 5.0, 2.0), ("B", 5.0, 3.0), ("B", 5.0, 4.0)]
    df = spark.createDataFrame(rows, "v string, x double, y double")
    out = cuped_ttest(df, "v", "x", "y").first()
    assert out["theta"] is None and out["t"] is None
    assert out["adj_mean_a"] is None  # den = 0: no adjustment defined


def test_diff_in_diff_hand_check(spark):
    import math

    from redshift_etl_spark.operators.quality import diff_in_diff

    rows = (
        [("A", 1, 1)] * 2 + [("A", 1, 0)] * 2      # p_a1 = 2/4
        + [("A", 2, 1)] * 3 + [("A", 2, 0)] * 1    # p_a2 = 3/4
        + [("B", 1, 1)] * 1 + [("B", 1, 0)] * 3    # p_b1 = 1/4
        + [("B", 2, 1)] * 3 + [("B", 2, 0)] * 1    # p_b2 = 3/4
    )
    df = spark.createDataFrame(rows, "v string, p long, s long")
    out = diff_in_diff(df, "v", "p", "s").first()
    assert (out["n_a1"], out["n_a2"], out["n_b1"], out["n_b2"]) == (4, 4, 4, 4)
    assert out["did"] == (0.75 - 0.25) - (0.75 - 0.5)
    se2 = (0.5 * 0.5 + 3 * 0.75 * 0.25) / 4
    assert math.isclose(out["se"], math.sqrt(se2))
    assert math.isclose(out["z"], out["did"] / math.sqrt(se2))


def test_diff_in_diff_degenerate_shapes_null(spark):
    from redshift_etl_spark.operators.quality import diff_in_diff

    # 3 variants -> NULL effect, honest counts
    df = spark.createDataFrame(
        [("A", 1, 1), ("B", 1, 0), ("C", 1, 1), ("A", 2, 1), ("B", 2, 0),
         ("C", 2, 0)],
        "v string, p long, s long",
    )
    out = diff_in_diff(df, "v", "p", "s").first()
    assert out["n_variants"] == 3 and out["did"] is None
    # one period only
    df2 = spark.createDataFrame(
        [("A", 1, 1), ("B", 1, 0)], "v string, p long, s long"
    )
    out2 = diff_in_diff(df2, "v", "p", "s").first()
    assert out2["n_periods"] == 1 and out2["z"] is None


def test_poisson_weight_thresholds_exact(spark):
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators.sampling import (
        POISSON1_CUM_U32,
        poisson1_weight,
    )

    t0, t1 = POISSON1_CUM_U32[0], POISSON1_CUM_U32[1]
    df = spark.createDataFrame(
        [(0,), (t0 - 1,), (t0,), (t1 - 1,), (t1,), (2**32 - 1,)], "u long"
    )
    got = [
        r[0]
        for r in df.select(poisson1_weight(F.col("u"))).collect()
    ]
    assert got == [0, 0, 1, 1, 2, 9]


def test_bootstrap_ci_deterministic_and_ordered(spark):
    from redshift_etl_spark.operators.sampling import bootstrap_mean_ci

    rows = [(i, float(50 + (i * 37) % 100) / 10.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, value double")
    a = bootstrap_mean_ci(df, "id", "value", b=40).first()
    b = bootstrap_mean_ci(df, "id", "value", b=40).first()
    assert a == b                      # md5 weights: identical every run
    assert a["n"] == 500 and a["b"] == 40
    assert a["ci_lo"] < a["mean"] < a["ci_hi"]
    # interval shrinks roughly like 1/sqrt(n): a 10x bigger sample
    big = spark.createDataFrame(
        [(i, float(50 + (i * 37) % 100) / 10.0) for i in range(5000)],
        "id long, value double",
    )
    c = bootstrap_mean_ci(big, "id", "value", b=40).first()
    assert (c["ci_hi"] - c["ci_lo"]) < (a["ci_hi"] - a["ci_lo"])


def test_bootstrap_b_bounds(spark):
    import pytest

    from redshift_etl_spark.operators.sampling import bootstrap_mean_ci

    df = spark.createDataFrame([(1, 1.0)], "id long, value double")
    with pytest.raises(ValueError, match="b must be in"):
        bootstrap_mean_ci(df, "id", "value", b=1)
    with pytest.raises(ValueError, match="b must be in"):
        bootstrap_mean_ci(df, "id", "value", b=1000)


def test_distinct_count_estimate_full_rate_is_exact(spark):
    from redshift_etl_spark.operators.heavy import distinct_count_estimate

    df = spark.createDataFrame(
        [(i % 100,) for i in range(1000)], "k long"
    )
    out = distinct_count_estimate(df, "k", rate_per_65536=65536).first()
    assert out["true_distinct"] == 100
    assert out["est_distinct"] == 100.0  # rate 1.0: the sample IS the data
    assert out["rel_error"] == 0.0


def test_selectivity_estimate_full_rate_exact_and_independence(spark):
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators.heavy import selectivity_estimate

    # full rate: the sample IS the data -> est == true, rel_error 0
    rows = [(i, i % 4, i % 3) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = selectivity_estimate(
        df, F.col("a") == 0, F.col("b") == 0, "id", rate_per_65536=65536
    ).first()
    # i%4==0 and i%3==0 <=> i%12==0: 50 rows, truly independent (600
    # is a common multiple, so p(A∧B) = p(A)·p(B) exactly)
    assert out["true_rows"] == 50 and out["est_rows"] == 50.0
    assert out["rel_error"] == 0.0
    assert abs(out["correlation_factor"] - 1.0) < 1e-12
    assert abs(out["indep_est_rows"] - 50.0) < 1e-9
    # perfectly correlated: A == B -> factor = 1/p(A)
    out2 = selectivity_estimate(
        df, F.col("a") == 0, F.col("a") == 0, "id", rate_per_65536=65536
    ).first()
    assert abs(out2["correlation_factor"] - 4.0) < 1e-12


def test_ab_power_mde_hand_check(spark):
    import math

    from redshift_etl_spark.operators.quality import (
        Z_ALPHA_0_05,
        Z_POWER_0_80,
        ab_power_mde,
    )

    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0), ("B", 4.0)]
    df = spark.createDataFrame(rows, "v string, value double")
    out = ab_power_mde(df, "v", "value").first()
    # same moments as the welch hand-check: s2_a=1, s2_b=2
    se = math.sqrt(1 / 3 + 2 / 2)
    zsum = Z_ALPHA_0_05 + Z_POWER_0_80
    assert math.isclose(out["se"], se)
    assert math.isclose(out["mde_abs"], zsum * se)
    assert out["mean_diff"] == -1.0
    assert out["n_per_arm_for_observed"] == math.ceil(zsum * zsum * 3)


def test_ab_power_mde_zero_diff_null_required_n(spark):
    from redshift_etl_spark.operators.quality import ab_power_mde

    rows = [("A", 1.0), ("A", 3.0), ("B", 1.0), ("B", 3.0)]
    df = spark.createDataFrame(rows, "v string, value double")
    out = ab_power_mde(df, "v", "value").first()
    assert out["mean_diff"] == 0.0
    assert out["n_per_arm_for_observed"] is None  # no effect to power
    assert out["mde_abs"] is not None             # MDE still defined


def test_trimmed_mean_hand_check_and_boundary_ties(spark):
    from redshift_etl_spark.operators.quality import trimmed_mean_ttest

    rows = (
        [("A", 0.0), ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 100.0)]
        + [("B", 1.0), ("B", 2.0), ("B", 3.0), ("B", 4.0), ("B", 5.0)]
    )
    df = spark.createDataFrame(rows, "v string, value double")
    out = trimmed_mean_ttest(df, "v", "value", trim=0.2).first()
    # k = floor(0.2*5) = 1 per tail: A keeps [1,2,3], B keeps [2,3,4]
    assert (out["n_a"], out["n_kept_a"]) == (5, 3)
    assert out["tmean_a"] == 2.0 and out["tmean_b"] == 3.0
    # boundary tie: the cut lands inside the duplicated 1s — exactly
    # one copy must survive (partial count), mean (1+2+3)/3
    rows2 = [("A", 1.0), ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 9.0)] + [
        ("B", v) for v in (1.0, 2.0, 3.0, 4.0, 5.0)
    ]
    out2 = trimmed_mean_ttest(
        spark.createDataFrame(rows2, "v string, value double"),
        "v", "value", trim=0.2,
    ).first()
    assert out2["n_kept_a"] == 3 and out2["tmean_a"] == 2.0


def test_trimmed_mean_resists_whale(spark):
    from redshift_etl_spark.operators.quality import (
        trimmed_mean_ttest,
        welch_ttest,
    )

    base = [("A", 10.0 + (i % 5)) for i in range(40)] + [
        ("B", 11.0 + (i % 5)) for i in range(39)
    ]
    whale = base + [("B", 100000.0)]  # one whale purchase in B
    df = spark.createDataFrame(whale, "v string, value double")
    w = welch_ttest(df, "v", "value").first()
    t = trimmed_mean_ttest(df, "v", "value", trim=0.05).first()
    # plain welch is destroyed by the whale (|t| collapses toward 0 as
    # the variance explodes); the trimmed test keeps the real signal
    assert abs(w["t"]) < 1.1
    assert abs(t["t"]) > 3.0
    assert t["tmean_b"] < 20  # whale trimmed away


def test_trimmed_mean_trim_bounds(spark):
    import pytest

    from redshift_etl_spark.operators.quality import trimmed_mean_ttest

    df = spark.createDataFrame([("A", 1.0)], "v string, value double")
    with pytest.raises(ValueError, match="trim must be in"):
        trimmed_mean_ttest(df, "v", "value", trim=0.5)


def test_distinct_set_estimate_full_rate_exact(spark):
    from redshift_etl_spark.operators.heavy import distinct_set_estimate

    a = spark.createDataFrame([(i,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i,) for i in range(60, 200)], "k long")
    out = distinct_set_estimate(a, b, "k", "k", rate_per_65536=65536).first()
    assert out["true_union"] == 200 and out["true_intersection"] == 40
    assert out["est_union"] == 200.0 and out["est_intersection"] == 40.0
    assert out["est_jaccard"] == 40 / 200
    assert out["rel_error_union"] == 0.0


def test_diff_in_diff_empty_input_returns_one_honest_row(spark):
    """r12 self-review: the one-row contract must hold on empty/all-NULL
    input (a groupBy over the bounds returned ZERO rows)."""
    from redshift_etl_spark.operators.quality import diff_in_diff

    empty = spark.createDataFrame([], "v string, p long, s long")
    out = diff_in_diff(empty, "v", "p", "s").collect()
    assert len(out) == 1
    row = out[0]
    assert row["n_variants"] == 0 and row["n_periods"] == 0
    assert row["did"] is None and row["z"] is None
    allnull = spark.createDataFrame(
        [(None, None, None)], "v string, p long, s long"
    )
    out2 = diff_in_diff(allnull, "v", "p", "s").collect()
    assert len(out2) == 1 and out2[0]["did"] is None


# --- r13 additions: rank-sum / SRM / post-stratification ---------------------

def test_rank_sum_hand_check(spark):
    """A = {1, 3}, B = {2, 2}: pooled midranks 1, 2.5, 2.5, 4 (the two
    2s tie). W_a = 1 + 4 = 5, U_a = 5 - 2*3/2 = 2 = n_a*n_b/2 -> z = 0
    exactly, and the tie term is t^3 - t = 6 for the one tied value."""
    from redshift_etl_spark.operators.quality import rank_sum_test

    df = spark.createDataFrame(
        [("A", 0.01), ("A", 0.03), ("B", 0.02), ("B", 0.02)],
        "v string, y double",
    )
    out = rank_sum_test(df, "v", "y", scale=100).first()
    assert (out["n_variants"], out["n_a"], out["n_b"]) == (2, 2, 2)
    assert out["u_a"] == 2.0
    assert out["z"] == 0.0


def test_rank_sum_extreme_separation(spark):
    """All of A below all of B: U_a = 0, z at its most negative —
    sign convention pinned (a is the name-min variant)."""
    from redshift_etl_spark.operators.quality import rank_sum_test

    rows = [("A", float(i)) for i in range(1, 6)] + [
        ("B", float(i)) for i in range(10, 15)
    ]
    df = spark.createDataFrame(rows, "v string, y double")
    out = rank_sum_test(df, "v", "y").first()
    assert out["u_a"] == 0.0
    # no ties: var = n_a*n_b*(N+1)/12 = 25*11/12; z = -12.5/sqrt(...)
    assert math.isclose(out["z"], -12.5 / math.sqrt(25 * 11 / 12))


def test_rank_sum_three_variants_null(spark):
    from redshift_etl_spark.operators.quality import rank_sum_test

    df = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("C", 3.0)], "v string, y double"
    )
    out = rank_sum_test(df, "v", "y").first()
    assert out["n_variants"] == 3
    assert out["z"] is None and out["u_a"] is None


def test_srm_hand_check(spark):
    """60/40 observed against a 50/50 design over 100 users:
    chi2 = (60-50)^2/50 + (40-50)^2/50 = 4.0 (nano-exact)."""
    from redshift_etl_spark.operators.quality import srm_check

    rows = [("A",)] * 60 + [("B",)] * 40
    df = spark.createDataFrame(rows, "v string")
    out = srm_check(df, "v", {"A": 0.5, "B": 0.5}).first()
    assert (out["n_variants"], out["n_total"], out["dof"]) == (2, 100, 1)
    assert out["chi2_srm"] == 4.0
    assert out["worst_abs_dev"] == 10.0
    # two-variant deviations always tie in absolute value: the
    # name-max variant wins deterministically
    assert out["worst_variant"] == "B"


def test_srm_unknown_bucket_is_loud(spark):
    """A variant missing from the design contributes o^2 — the report
    must scream, not drop the rows."""
    from redshift_etl_spark.operators.quality import srm_check

    rows = [("A",)] * 5 + [("B",)] * 5 + [("GHOST",)] * 2
    df = spark.createDataFrame(rows, "v string")
    out = srm_check(df, "v", {"A": 0.5, "B": 0.5}).first()
    assert out["n_variants"] == 3
    assert out["chi2_srm"] > 4.0  # the 2^2=4 ghost term dominates


def test_post_stratified_hand_check(spark):
    """Two strata with opposite imbalance; within each stratum the
    A-B difference is exactly 1.0, so diff_ps = 1.0 regardless of the
    imbalance, while the naive diff is biased by it."""
    from redshift_etl_spark.operators.quality import post_stratified_ab

    rows = (
        # stratum s1 (low values): 3xA {1,2,3}, 2xB {0.5, 1.5}
        [("s1", "A", 1.0), ("s1", "A", 2.0), ("s1", "A", 3.0),
         ("s1", "B", 0.5), ("s1", "B", 1.5)]
        # stratum s2 (high values): 2xA {11, 13}, 3xB {10, 11, 12}
        + [("s2", "A", 11.0), ("s2", "A", 13.0),
           ("s2", "B", 10.0), ("s2", "B", 11.0), ("s2", "B", 12.0)]
    )
    df = spark.createDataFrame(rows, "s string, v string, y double")
    out = post_stratified_ab(df, "s", "v", "y").first()
    assert (out["n_strata"], out["n_strata_skipped"]) == (2, 0)
    assert (out["n_a"], out["n_b"]) == (5, 5)
    # within-stratum diffs: s1 2-1=1, s2 12-11=1; shares 0.5/0.5
    assert math.isclose(out["diff_ps"], 1.0)
    # naive: mean_a = 30/5 = 6, mean_b = 35/5 = 7 -> -1: sign flipped
    # by the imbalance the stratification removes (Simpson shape)
    assert math.isclose(out["diff_naive"], -1.0)
    assert out["se_ps"] > 0 and out["z_ps"] is not None


def test_post_stratified_skips_single_variant_stratum(spark):
    """A stratum holding only one variant can't contribute a
    difference — it must be counted skipped, not silently averaged."""
    from redshift_etl_spark.operators.quality import post_stratified_ab

    rows = [
        ("s1", "A", 1.0), ("s1", "A", 2.0), ("s1", "B", 1.0),
        ("s1", "B", 3.0),
        ("s2", "A", 9.0), ("s2", "A", 9.0),  # no B in s2
    ]
    df = spark.createDataFrame(rows, "s string, v string, y double")
    out = post_stratified_ab(df, "s", "v", "y").first()
    assert out["n_strata"] == 2 and out["n_strata_skipped"] == 1
    # only s1 contributes: share 4/6, diff 1.5-2.0 = -0.5
    assert math.isclose(out["diff_ps"], (4 / 6) * -0.5, abs_tol=1e-9)


def test_msprt_hand_check_null_effect(spark):
    """Symmetric variants (no effect): theta = 0, so log_lambda =
    0.5*ln(V/(V+tau^2)) < 0 — never rejects. Verified against the
    closed form."""
    from redshift_etl_spark.operators.quality import msprt_ab

    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0),
            ("B", 1.0), ("B", 2.0), ("B", 3.0)]
    df = spark.createDataFrame(rows, "v string, y double")
    out = msprt_ab(df, "v", "y", tau=1.0).first()
    assert out["theta"] == 0.0
    # V = (1 + 1)/3 = 2/3 (sample var 1.0 each, n 3)
    assert math.isclose(out["v_n"], 2 / 3)
    expected = 0.5 * math.log((2 / 3) / (2 / 3 + 1.0))
    assert out["log_lambda_micro"] == round(expected * 1e6)
    assert out["reject_null"] is False


def test_msprt_strong_effect_rejects(spark):
    """A clearly separated pair with tiny variance: log_lambda far
    above ln(1/0.05) ~ 2.9957 -> reject at any stopping time."""
    from redshift_etl_spark.operators.quality import msprt_ab

    rows = [("A", 10.0 + 0.01 * i) for i in range(50)] + [
        ("B", 0.0 + 0.01 * i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "v string, y double")
    out = msprt_ab(df, "v", "y", tau=1.0).first()
    assert out["theta"] > 9.9
    assert out["log_lambda_micro"] > 2_995_732
    assert out["reject_null"] is True


def test_msprt_contracts_null(spark):
    from redshift_etl_spark.operators.quality import msprt_ab

    # three variants -> NULL verdict with honest counts
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0), ("C", 1.0),
         ("C", 2.0)],
        "v string, y double",
    )
    out = msprt_ab(df, "v", "y").first()
    assert out["n_variants"] == 3
    assert out["log_lambda_micro"] is None and out["reject_null"] is None
    # single-row variant -> NULL (no variance)
    df2 = spark.createDataFrame(
        [("A", 1.0), ("B", 1.0), ("B", 2.0)], "v string, y double"
    )
    out2 = msprt_ab(df2, "v", "y").first()
    assert out2["reject_null"] is None
