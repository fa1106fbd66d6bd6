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


def test_forget_absent_key_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    v0 = V.write_version(_df(spark), root, partition_by="user")
    assert V.forget_keys(spark, root, "id", [999], partition_col="user") is None
    assert V.forget_keys(spark, root, "id", [999]) is None
    assert V.current_version(root) == v0
    assert V.versions(root) == [v0]  # no history churn
