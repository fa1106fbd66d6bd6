"""Z-order layout: the z-value arithmetic (portable, partition-stable)
and the REASON the operator exists — multi-column file skipping proven
on real parquet footers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from redshift_etl_spark.operators import zorder as Z


def _file_ranges(path, cols):
    """(min, max) per parquet part-file per column, straight from the
    footers — exactly the stats a reader prunes on."""
    import pyarrow.parquet as pq

    out = []
    for d, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith("part-") or not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            rng = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name not in cols or col.statistics is None:
                        continue
                    st = col.statistics
                    lo, hi = rng.get(name, (st.min, st.max))
                    rng[name] = (min(lo, st.min), max(hi, st.max))
            if rng:
                out.append(rng)
    return out


def _overlapping(ranges, box):
    return sum(
        1
        for rng in ranges
        if all(rng[c][0] <= hi and rng[c][1] >= lo for c, (lo, hi) in box.items())
    )


def test_zvalue_portable_and_partition_stable(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 1000, float((i * 91) % 500)) for i in range(2000)],
        ["id", "x", "y"],
    )
    a = {r["id"]: r["zvalue"] for r in Z.zorder_layout(df, ["x", "y"]).collect()}
    b = {
        r["id"]: r["zvalue"]
        for r in Z.zorder_layout(df.repartition(11), ["x", "y"]).collect()
    }
    assert a == b
    bits = 8
    # z-value interleave replayed in python from the same constants
    mnx, mxx = 0.0, max((i * 37) % 1000 for i in range(2000)) * 1.0
    mny, mxy = 0.0, max(float((i * 91) % 500) for i in range(2000))
    import math

    def bucket(v, mn, mx):
        return int(math.floor((float(v) - mn) * 255 / (mx - mn)))

    def zval(x, y):
        bx, by = bucket(x, mnx, mxx), bucket(y, mny, mxy)
        return sum(
            ((bx >> i) & 1) << (2 * i) | ((by >> i) & 1) << (2 * i + 1)
            for i in range(bits)
        )

    for i in range(0, 2000, 97):
        assert a[i] == zval((i * 37) % 1000, float((i * 91) % 500)), i


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """The operator's contract at scale: against a 2-D box filter, the
    z-ordered layout must prune well on BOTH columns while a layout
    sorted on x alone prunes only via x. Measured on the actual
    parquet footer min/max — the stats a real reader uses."""
    n, files = 20_000, 128
    df = spark.createDataFrame(
        [(i, (i * 7919) % 10_000, float((i * 104729) % 10_000)) for i in range(n)],
        ["id", "x", "y"],
    )
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
    Z.write_zordered(df, zpath, ["x", "y"], n_files=files)
    (
        df.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    zr = _file_ranges(zpath, {"x", "y"})
    xr = _file_ranges(xpath, {"x", "y"})
    assert len(zr) >= files - 1 and len(xr) >= files - 1
    # a 25% x 25% box
    box = {"x": (2000, 4500), "y": (2000.0, 4500.0)}
    z_hit = _overlapping(zr, box)
    x_hit = _overlapping(xr, box)
    # x-sorted prunes on x only: ~25% of files remain (~32 of 128).
    # z-order prunes on both dims (box area 6.25%, curve fragmentation
    # ~2-3x): decisively fewer files touched (ideal-split simulation:
    # 20 vs 33).
    assert z_hit < x_hit * 0.8, (z_hit, x_hit, len(zr))
    # and reading the pruned layout still yields the right answer
    got = (
        spark.read.parquet(zpath)
        .filter(
            (F.col("x").between(2000, 4500))
            & (F.col("y").between(2000.0, 4500.0))
        )
        .count()
    )
    want = sum(
        1
        for i in range(n)
        if 2000 <= (i * 7919) % 10_000 <= 4500
        and 2000.0 <= float((i * 104729) % 10_000) <= 4500.0
    )
    assert got == want


def test_zorder_degenerate_columns(spark):
    # all-NULL and constant columns collapse to bucket 0 instead of
    # breaking the generated SQL; the other column still orders rows
    df = spark.createDataFrame(
        [(i, None, float(i % 50)) for i in range(100)],
        "id long, x long, y double",
    )
    out = Z.zorder_layout(df, ["x", "y"]).collect()
    assert len(out) == 100
    zs = {r["id"]: r["zvalue"] for r in out}
    assert len(set(zs.values())) > 1  # y still differentiates
    const = spark.createDataFrame(
        [(i, 7, float(i)) for i in range(10)], "id long, x long, y double"
    )
    assert Z.zorder_layout(const, ["x", "y"]).count() == 10
