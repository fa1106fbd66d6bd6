"""heavy.join_size_estimate: key-sampled synopsis correctness —
deterministic, unbiased on the sampled stratum, NULL keys dropped."""

from __future__ import annotations

from redshift_etl_spark.operators.heavy import join_size_estimate


def test_truth_is_sum_of_count_products_and_est_deterministic(spark):
    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3, None]], "k long"
    )
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], "k long")
    out = join_size_estimate(a, b, "k", "k").first()
    # true: key1 3*1 + key2 2*2 = 7 (NULL keys never match)
    assert out["true_join_rows"] == 7
    again = join_size_estimate(a, b, "k", "k").first()
    assert out["est_join_rows"] == again["est_join_rows"]  # md5, no RNG
    assert out["n_keys_sampled"] == again["n_keys_sampled"]


def test_full_rate_sample_is_exact(spark):
    # rate 65536 samples every key: the estimate must equal the truth
    a = spark.createDataFrame([(k,) for k in range(200) for _ in (0, 1)],
                              "k long")
    b = spark.createDataFrame([(k,) for k in range(100)], "k long")
    out = join_size_estimate(a, b, "k", "k", rate_per_65536=65536).first()
    assert out["true_join_rows"] == 200
    assert out["est_join_rows"] == 200.0
    assert out["rel_error"] == 0.0


def test_empty_intersection_reports_zero_and_null_error(spark):
    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(9,), (8,)], "k long")
    out = join_size_estimate(a, b, "k", "k").first()
    assert out["true_join_rows"] == 0
    assert out["est_join_rows"] == 0.0
    assert out["rel_error"] is None
