"""Snapshot-diff and audit contracts — the NULL-safety table the
reference's hand-spelled change predicates get wrong silently."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redshift_etl_spark.operators import quality as QA


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, price double")


def test_snapshot_diff_classification(spark):
    old = _snap(
        spark,
        [
            (1, "O", 10.0),   # unchanged → dropped
            (2, "O", 10.0),   # price changes
            (3, "F", 10.0),   # removed
            (4, None, None),  # NULL → NULL: unchanged → dropped
            (5, None, 10.0),  # NULL → value: changed
        ],
    )
    new = _snap(
        spark,
        [
            (1, "O", 10.0),
            (2, "O", 11.0),
            (4, None, None),
            (5, "O", 10.0),
            (6, "O", 1.0),    # added
        ],
    )
    out = {
        r["k"]: r["change_type"]
        for r in QA.snapshot_diff(old, new, "k", ["status", "price"]).collect()
    }
    assert out == {2: "changed", 3: "removed", 5: "changed", 6: "added"}


def test_audit_metrics(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, None, None), (3, 99, "c")],
        "k long, fk int, req string",
    )
    dim = spark.createDataFrame([(10,), (20,)], "d int")
    row = QA.audit(df, "k", ["req"], fk=("fk", dim, "d")).collect()[0]
    assert row["n_rows"] == 4
    assert row["n_dup_keys"] == 1          # key 1 appears twice
    assert row["n_null_req"] == 1
    assert row["n_orphans"] == 1           # fk=99; NULL fk is not an orphan


def test_validate_split_paths(spark):
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators import quality as QL

    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),        # fails positive
            (3, 10.0, None),        # NULL predicate → violation
            (4, -1.0, "bad"),       # fails BOTH rules
        ],
        "id long, amount double, status string",
    )
    valid, quarantined = QL.validate_split(
        df,
        {
            "positive": F.col("amount") > 0,
            "status_ok": F.col("status") == "ok",
        },
    )
    assert [r["id"] for r in valid.collect()] == [1]
    assert "violations" not in valid.columns
    q = {r["id"]: r["violations"] for r in quarantined.collect()}
    assert q == {
        2: "positive",
        3: "status_ok",
        4: "positive|status_ok",
    }
    # pure projection — dead-lettering must not shuffle
    from redshift_etl_spark import plans as P

    assert P.count_shuffles(quarantined) == 0


def test_table_fingerprint_invariant_and_sensitive(spark):
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators import quality as QL

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id long, v string"
    )

    def fp(frame):
        r = QL.table_fingerprint(frame).collect()[0]
        return (r["checksum"], r["n_rows"])

    base = fp(df)
    assert fp(df.repartition(16)) == base          # partitioning-proof
    assert fp(df.orderBy(F.desc("id"))) == base    # order-proof
    changed = df.withColumn(
        "v", F.when(F.col("id") == 50, "TAMPERED").otherwise(F.col("v"))
    )
    assert fp(changed) != base                     # single-row sensitive
    # NULL vs the string "<NULL>" must differ only via the sentinel
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "<NULL>")], "id long, v string")
    assert fp(a) == fp(b)  # documented sentinel collision — by design


def test_validate_split_empty_rules_everything_valid(spark):
    from redshift_etl_spark.operators import quality as QL

    df = spark.createDataFrame([(1,), (2,)], "id long")
    valid, quarantined = QL.validate_split(df, {})
    assert [r["id"] for r in valid.collect()] == [1, 2]
    assert quarantined.count() == 0
    assert "violations" in quarantined.columns


def test_table_fingerprint_auto_casts_floats(spark):
    """A raw double column must fingerprint identically to the same
    data pre-cast to DECIMAL(30,6) — the documented cross-engine
    canonicalization happens inside the operator, not only in callers."""
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators import quality as QL

    df = spark.createDataFrame(
        [(1, 0.1), (2, 1.0 / 3.0), (3, None)], "id long, x double"
    )
    pre = df.select("id", F.col("x").cast("decimal(30,6)").alias("x"))
    raw_fp = QL.table_fingerprint(df).collect()[0]["checksum"]
    pre_fp = QL.table_fingerprint(pre).collect()[0]["checksum"]
    assert raw_fp == pre_fp


# --- analyze_stats ---------------------------------------------------------

def test_analyze_stats_one_scan_and_values(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.quality import analyze_stats

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.0), (3, "b", None)],
        "k long, s string, v double",
    )
    out = {r["column_name"]: r for r in analyze_stats(df).collect()}
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 3
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "3"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["v"]["n_nulls"] == 2 and out["v"]["n_distinct"] == 2
    assert all(r["n_rows"] == 4 for r in out.values())
    # single scan: exactly one parquet/LocalTableScan feeds the agg
    plan = analyze_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_changed_buckets_localizes_single_row_change(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.export import content_hash48
    from redshift_etl_spark.operators.quality import changed_buckets

    old = spark.range(1000).selectExpr("id", "id * 2 AS v")
    new = old.withColumn(
        "v", F.when(F.col("id") == 437, F.lit(-1)).otherwise(F.col("v"))
    )
    diff = changed_buckets(old, new, "id", 64).collect()
    assert len(diff) == 1
    want_bucket = (
        spark.range(1).select(
            F.pmod(content_hash48(F.lit(437)), F.lit(64)).alias("b")
        ).collect()[0]["b"]
    )
    assert diff[0]["bucket"] == want_bucket
    assert diff[0]["old_rows"] == diff[0]["new_rows"]  # same count, diff content
    # identical snapshots: zero changed buckets
    assert changed_buckets(old, old, "id", 64).count() == 0


# --- mutual information -----------------------------------------------------

def test_mutual_information_known_values(spark):
    import math

    from redshift_etl_spark.operators.quality import mutual_information

    # independent columns -> MI ~ 0 (exactly 0 with uniform margins:
    # every cell ratio is exactly 1, ln(1) = 0 with no rounding)
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(25)],
        "x string, y string",
    )
    r = mutual_information(ind, "x", "y").collect()[0]
    assert r["mi_nats"] == 0.0
    assert abs(r["h_x"] - math.log(2)) < 1e-5
    assert abs(r["nmi"]) < 1e-12

    # perfectly dependent -> MI = H(x) = H(y), nmi = 1
    dep = spark.createDataFrame(
        [("a", "c")] * 30 + [("b", "d")] * 70, "x string, y string"
    )
    r = mutual_information(dep, "x", "y").collect()[0]
    want_h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert abs(r["mi_nats"] - want_h) < 1e-5
    assert abs(r["h_x"] - want_h) < 1e-5
    assert abs(r["nmi"] - 1.0) < 1e-5


def test_mutual_information_null_is_a_level(spark):
    from redshift_etl_spark.operators.quality import mutual_information

    df = spark.createDataFrame(
        [("a", None)] * 10 + [("b", "y")] * 10, "x string, y string"
    )
    r = mutual_information(df, "x", "y").collect()[0]
    assert r["n"] == 20
    assert r["nmi"] > 0.99  # NULL level perfectly predicted by x


def test_cohens_kappa_hand_computed(spark):
    from redshift_etl_spark.operators.quality import cohens_kappa

    # classic 2x2 example: n=50, agree=35, rowA=(25,25), colB=(30,20)
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5
        + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["n_items"] == 50 and r["n_agree"] == 35
    # pe_num = 25*30 + 25*20 = 1250; kappa = (50*35-1250)/(2500-1250)
    assert r["pe_num"] == 1250
    assert abs(r["kappa"] - 500 / 1250) < 1e-15
    assert abs(r["po"] - 0.7) < 1e-15 and abs(r["pe"] - 0.5) < 1e-15


def test_cohens_kappa_degenerate_and_nulls(spark):
    from redshift_etl_spark.operators.quality import cohens_kappa

    # single category on both sides: pe_num = n^2 -> NULL kappa
    df = spark.createDataFrame([("x", "x")] * 7, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["kappa"] is None and r["n_agree"] == 7
    # NULLs dropped; disjoint categories -> pe_num 0, kappa = agree/n
    df2 = spark.createDataFrame(
        [("x", "y"), ("x", None), (None, "y"), ("y", "x")],
        "a string, b string",
    )
    r2 = cohens_kappa(df2, "a", "b").collect()[0]
    assert r2["n_items"] == 2 and r2["pe_num"] == 2  # x:1*1 + y:1*1
    assert r2["n_agree"] == 0


@pytest.mark.slow
def test_cohens_kappa_partition_invariance(spark):
    from redshift_etl_spark.operators.quality import cohens_kappa

    rows = [(f"c{i % 4}", f"c{(i * 7) % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "a string, b string")
    one = cohens_kappa(df.coalesce(1), "a", "b").collect()
    many = cohens_kappa(df.repartition(9), "a", "b").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_cramers_v_hand_computed_and_degenerate(spark):
    from redshift_etl_spark.operators.quality import cramers_v

    # perfect association: x fully determines y -> V = 1
    rows = [("a", "p")] * 10 + [("b", "q")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = cramers_v(df, "x", "y").collect()[0]
    assert abs(r["v"] - 1.0) < 1e-6 and r["n"] == 20
    # independence: uniform cross product -> chi2 = 0, V = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "ab" for b in "pq" for _ in range(5)],
        "x string, y string",
    )
    r2 = cramers_v(ind, "x", "y").collect()[0]
    assert r2["chi2"] == 0.0 and r2["v"] == 0.0
    # degenerate: one column constant -> NULL v
    const = spark.createDataFrame([("a", "p")] * 5, "x string, y string")
    assert cramers_v(const, "x", "y").collect()[0]["v"] is None


def test_wilson_bounds_properties(spark):
    from redshift_etl_spark.operators.quality import wilson_lower_bounds

    rows = (
        [("big", True)] * 90 + [("big", False)] * 10  # 90% over n=100
        + [("small", True)] * 3                        # 100% over n=3
    )
    df = spark.createDataFrame(rows, "g string, y boolean")
    out = {r["g"]: r.asDict() for r in wilson_lower_bounds(df, "g", "y").collect()}
    # the bound is strictly below the point estimate and within [0, 1]
    for r in out.values():
        assert 0.0 <= r["lb"] < r["p_hat"] + 1e-12
    # rank-by-confidence: the big 90% source must outrank the tiny
    # perfect one (the whole point of the statistic)
    assert out["big"]["lb"] > out["small"]["lb"]
    # hand value: n=100, p=.9 (python mirror of the same spelling)
    assert abs(out["big"]["lb"] - 0.8256343384950866) < 1e-12
