"""`versioned.forget_keys` — right-to-be-forgotten over the versioned
store: snapshot semantics, partition-scoped rewrite (untouched
partitions hard-linked, byte-identical), DataFrame bulk form, no-op on
absent keys, and hard delete completing via vacuum."""

from __future__ import annotations

import os

from redshift_etl_spark.sources import versioned as V


def _df(spark):
    rows = [(i, f"u{i % 5}", f"payload{i}") for i in range(50)]
    return spark.createDataFrame(rows, "id long, user string, body string")


def test_forget_unpartitioned_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = V.write_version(_df(spark), root)
    rep = V.forget_keys(spark, root, "user", ["u1", "u3"])
    assert rep["rows_removed"] == 20 and rep["version"] == v0 + 1
    cur = V.read_current(spark, root)
    assert cur.count() == 30
    assert cur.filter("user in ('u1','u3')").count() == 0
    # prior snapshot still holds the rows (time travel) …
    assert V.read_version(spark, root, v0).count() == 50
    # … until vacuum completes the erasure
    dropped = V.vacuum(root, keep=1)
    assert v0 in dropped
    assert not os.path.isdir(os.path.join(root, f"v={v0}"))


def test_forget_partition_scoped_links_untouched_partitions(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    V.write_version(_df(spark), root, partition_by="user")
    src = os.path.join(root, "v=0")
    before = {
        p: sorted(os.listdir(os.path.join(src, p)))
        for p in os.listdir(src)
        if p.startswith("user=")
    }
    rep = V.forget_keys(spark, root, "id", [7, 12], partition_col="user")
    # ids 7 and 12 live in user=u2 — exactly one partition rewrites
    assert rep["rows_removed"] == 2
    assert rep["partitions_rewritten"] == 1
    assert rep["partitions_linked"] == len(before) - 1
    new = os.path.join(root, f"v={rep['version']}")
    # untouched partitions are hard links of the old files (same inode)
    for p, files in before.items():
        if p == "user=u2":
            continue
        for f in files:
            old_f = os.path.join(src, p, f)
            new_f = os.path.join(new, p, f)
            assert os.path.samefile(old_f, new_f)
    cur = V.read_current(spark, root)
    assert cur.count() == 48
    assert cur.filter("id in (7, 12)").count() == 0
    # the rewritten partition kept its other rows
    assert cur.filter("user = 'u2'").count() == 8


def test_forget_dataframe_bulk_form(spark, tmp_path):
    root = str(tmp_path / "t")
    V.write_version(_df(spark), root, partition_by="user")
    keys = spark.range(0, 50, 2).select("id")  # all even ids
    rep = V.forget_keys(spark, root, "id", keys, partition_col="user")
    assert rep["rows_removed"] == 25
    assert rep["partitions_rewritten"] == 5  # every user has even ids
    cur = V.read_current(spark, root)
    assert cur.count() == 25
    assert cur.filter("id % 2 = 0").count() == 0


def test_forget_hive_escaped_partition_values_rewrite(spark, tmp_path):
    # ADVICE r09: partition values with characters Hive %XX-escapes in
    # directory names ('a/b' → 'a%2Fb') must still be recognized as
    # affected — matching raw dir names against str(value) would link
    # the partition through untouched and the rows would survive
    root = str(tmp_path / "t")
    rows = [(1, "a/b", "x"), (2, "a/b", "y"), (3, "plain", "z"),
            (4, "c:d", "w")]
    df = spark.createDataFrame(rows, "id long, grp string, body string")
    V.write_version(df, root, partition_by="grp")
    src = os.path.join(root, "v=0")
    dirs = sorted(p for p in os.listdir(src) if p.startswith("grp="))
    assert "grp=a%2Fb" in dirs  # the escaping is real
    rep = V.forget_keys(spark, root, "id", [1], partition_col="grp")
    assert rep["rows_removed"] == 1
    assert rep["partitions_rewritten"] == 1
    assert rep["partitions_linked"] == 2  # plain + c:d untouched
    cur = V.read_current(spark, root)
    assert cur.filter("id = 1").count() == 0  # actually erased
    assert cur.filter("grp = 'a/b'").count() == 1  # survivor kept
    assert cur.count() == 3


def test_forget_null_partition_value_rewrites(spark, tmp_path):
    # NULL partition values land in __HIVE_DEFAULT_PARTITION__; an
    # erasure key living there must trigger a rewrite of that
    # directory, and isin() alone never matches NULL
    root = str(tmp_path / "t")
    rows = [(1, None, "x"), (2, None, "y"), (3, "g", "z")]
    df = spark.createDataFrame(rows, "id long, grp string, body string")
    V.write_version(df, root, partition_by="grp")
    src = os.path.join(root, "v=0")
    assert "grp=__HIVE_DEFAULT_PARTITION__" in os.listdir(src)
    rep = V.forget_keys(spark, root, "id", [1], partition_col="grp")
    assert rep["rows_removed"] == 1
    assert rep["partitions_rewritten"] == 1
    assert rep["partitions_linked"] == 1  # grp=g untouched
    cur = V.read_current(spark, root)
    assert cur.filter("id = 1").count() == 0
    assert cur.filter("grp is null").count() == 1  # null survivor kept
    assert cur.filter("grp = 'g'").count() == 1


def test_forget_partitioned_path_on_unpartitioned_store_raises(
    spark, tmp_path
):
    # ADVICE r09: the snapshot was written WITHOUT partition_by, so no
    # 'col=' directories exist — proceeding would commit a version
    # holding only the affected-partition survivors (silent data loss).
    # It must refuse instead, and the store must be left untouched.
    import pytest

    root = str(tmp_path / "t")
    v0 = V.write_version(_df(spark), root)  # NOT partitioned
    with pytest.raises(ValueError, match="not.*written with partition_by"):
        V.forget_keys(spark, root, "id", [7], partition_col="user")
    assert V.current_version(root) == v0
    assert V.versions(root) == [v0]  # no half-written version committed
    assert V.read_current(spark, root).count() == 50


def test_forget_absent_key_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = V.write_version(_df(spark), root, partition_by="user")
    assert V.forget_keys(spark, root, "id", [999], partition_col="user") is None
    assert V.forget_keys(spark, root, "id", [999]) is None
    assert V.current_version(root) == v0
    assert V.versions(root) == [v0]  # no history churn


def test_forget_boolean_partition_values_rewrite(spark, tmp_path):
    # str(True) is 'True' but Hive writes 'grp=true' — a boolean
    # partition value must still be recognized as affected
    root = str(tmp_path / "t")
    rows = [(1, True, "x"), (2, True, "y"), (3, False, "z")]
    df = spark.createDataFrame(rows, "id long, grp boolean, body string")
    V.write_version(df, root, partition_by="grp")
    src = os.path.join(root, "v=0")
    assert "grp=true" in os.listdir(src)  # the lowercase spelling
    rep = V.forget_keys(spark, root, "id", [1], partition_col="grp")
    assert rep["rows_removed"] == 1
    assert rep["partitions_rewritten"] == 1
    assert rep["partitions_linked"] == 1  # grp=false untouched
    cur = V.read_current(spark, root)
    assert cur.filter("id = 1").count() == 0  # actually erased
    # partition inference reads the bool dirs back as STRING
    # 'true'/'false' — compare as strings
    assert cur.filter("grp = 'true'").count() == 1  # survivor kept
    assert cur.filter("grp = 'false'").count() == 1
