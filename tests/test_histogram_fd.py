"""heavy.histogram_selectivity / heavy.fd_strength — the r13 planner
primitives: exact interior bins + nano-fixed edge fractions; g3-style
FD strength from exact cell counts."""

from __future__ import annotations

import math

from redshift_etl_spark.operators.heavy import (
    fd_strength,
    histogram_selectivity,
)


def test_histogram_bin_aligned_range_is_exact(spark):
    """A predicate landing exactly on bin edges uses only interior
    bins — the estimate must equal the truth with zero error."""
    # domain [0, 100), 10 bins of width 10 (scale=1 keeps integers)
    rows = [(float(v),) for v in range(100)]
    df = spark.createDataFrame(rows, "x double")
    out = histogram_selectivity(
        df, "x", lo=20.0, hi=50.0, domain_max=100.0, n_bins=10, scale=1
    ).first()
    assert out["n_rows"] == 100 and out["true_rows"] == 30
    assert out["est_rows"] == 30.0
    assert out["rel_error"] == 0.0


def test_histogram_fractional_edge_interpolates(spark):
    """A half-bin overlap contributes half the bin's count under the
    uniform-within-bin rule — exact here because the data IS uniform."""
    rows = [(float(v),) for v in range(100)]
    df = spark.createDataFrame(rows, "x double")
    # [25, 45): bins 2 (half), 3 (full), 4 (half) -> 5 + 10 + 5 = 20
    out = histogram_selectivity(
        df, "x", lo=25.0, hi=45.0, domain_max=100.0, n_bins=10, scale=1
    ).first()
    assert out["true_rows"] == 20
    assert math.isclose(out["est_rows"], 20.0)


def test_histogram_skew_grades_its_own_error(spark):
    """All mass piled at one end of a bin: the uniform assumption is
    wrong and rel_error must SAY so (the report's whole point)."""
    rows = [(10.0,)] * 100  # all at the left edge of bin [10, 20)
    df = spark.createDataFrame(rows, "x double")
    # predicate covers only the right half of that bin -> est 50, true 0
    out = histogram_selectivity(
        df, "x", lo=15.0, hi=20.0, domain_max=100.0, n_bins=10, scale=1
    ).first()
    assert out["true_rows"] == 0
    assert math.isclose(out["est_rows"], 50.0)
    assert out["rel_error"] is None  # true=0: no finite ratio


def test_histogram_out_of_domain_clamps(spark):
    df = spark.createDataFrame(
        [(-5.0,), (250.0,), (50.0,)], "x double"
    )
    out = histogram_selectivity(
        df, "x", lo=0.0, hi=100.0, domain_max=100.0, n_bins=10, scale=1
    ).first()
    # -5 clamps into bin 0 (inside [0,100)), 250 into bin 9 (inside)
    assert out["n_rows"] == 3
    assert out["est_rows"] == 3.0


def test_fd_strength_exact_dependency(spark):
    df = spark.createDataFrame(
        [("web", "en"), ("web", "en"), ("pdf", "de")], "src string, lg string"
    )
    out = fd_strength(df, "src", "lg").first()
    assert out["fd_strength"] == 1.0
    assert out["n_determinants"] == 2 and out["n_cells"] == 2
    assert out["n_kept_rows"] == out["n_rows"] == 3


def test_fd_strength_partial_dependency_hand_check(spark):
    """src 'web' maps en:3 / de:1 (keep 3), 'pdf' maps de:2 (keep 2):
    strength = 5/6; NULLs in either column excluded."""
    rows = [
        ("web", "en"), ("web", "en"), ("web", "en"), ("web", "de"),
        ("pdf", "de"), ("pdf", "de"),
        (None, "en"), ("web", None),
    ]
    df = spark.createDataFrame(rows, "src string, lg string")
    out = fd_strength(df, "src", "lg").first()
    assert out["n_rows"] == 6
    assert out["n_determinants"] == 2 and out["n_cells"] == 3
    assert out["n_kept_rows"] == 5
    assert math.isclose(out["fd_strength"], 5 / 6)


def test_fd_strength_empty_is_null(spark):
    df = spark.createDataFrame([], "src string, lg string")
    out = fd_strength(df, "src", "lg").first()
    assert out["n_rows"] == 0
    assert out["fd_strength"] is None
