"""Stream-stream attribution join: the live two-feed form must emit
exactly what the batch interval join computes, with watermark-bounded
state; leftOuter's unmatched-negatives semantics pinned in batch mode."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from redshift_etl_spark.streaming.joins import attribution_join

T0 = "2024-05-01 10:00:00"


def _ts(offset_sec: int) -> str:
    import datetime

    base = datetime.datetime.fromisoformat(T0)
    return (base + datetime.timedelta(seconds=offset_sec)).isoformat(" ")


IMPS = [(1, 0), (1, 400), (2, 0)]
CLICKS = [(1, 100), (1, 600), (2, 301), (3, 50)]
# max_delay=300 ->
#   click (1,100): matches imp (1,0)   delay 100
#   click (1,600): matches imp (1,400) delay 200 (imp (1,0) is 600 away)
#   click (2,301): 1s beyond the window -> no match
#   click (3,50):  no impression -> no match
EXPECTED = [(1, 0, 100, 100), (1, 400, 600, 200)]


def _frames(spark):
    imps = spark.createDataFrame(
        [(a, _ts(o)) for a, o in IMPS], ["ad_id", "imp_time"]
    ).select("ad_id", F.col("imp_time").cast("timestamp").alias("imp_time"))
    clks = spark.createDataFrame(
        [(a, _ts(o)) for a, o in CLICKS], ["ad_id", "click_time"]
    ).select(
        "ad_id", F.col("click_time").cast("timestamp").alias("click_time")
    )
    return imps, clks


def _rows(df):
    import datetime

    base = datetime.datetime.fromisoformat(T0)

    def off(t):
        return int((t - base).total_seconds())

    return sorted(
        (r["ad_id"], off(r["imp_time"]), off(r["click_time"]), r["delay_sec"])
        for r in df.collect()
    )


def test_attribution_join_batch_semantics(spark):
    imps, clks = _frames(spark)
    out = attribution_join(imps, clks, max_delay_seconds=300)
    assert _rows(out) == EXPECTED


def test_attribution_join_left_outer_negatives(spark):
    imps, clks = _frames(spark)
    out = attribution_join(
        imps, clks, max_delay_seconds=300, how="leftOuter"
    ).collect()
    unmatched = sorted(
        r["ad_id"] for r in out if r["click_time"] is None
    )
    assert unmatched == [2]  # imp (2,0) expires unclicked
    assert len(out) == len(EXPECTED) + 1


def test_attribution_join_stream_equals_batch(spark, tmp_path):
    imp_dir, clk_dir = tmp_path / "imps", tmp_path / "clicks"
    imp_dir.mkdir()
    clk_dir.mkdir()
    now = time.time()
    (imp_dir / "i.json").write_text(
        "\n".join(
            json.dumps({"ad_id": a, "imp_time": _ts(o)}) for a, o in IMPS
        )
    )
    os.utime(imp_dir / "i.json", (now - 20, now - 20))
    (clk_dir / "c.json").write_text(
        "\n".join(
            json.dumps({"ad_id": a, "click_time": _ts(o)})
            for a, o in CLICKS
        )
    )
    os.utime(clk_dir / "c.json", (now - 20, now - 20))

    imps = (
        spark.readStream.schema("ad_id long, imp_time timestamp")
        .json(str(imp_dir))
    )
    clks = (
        spark.readStream.schema("ad_id long, click_time timestamp")
        .json(str(clk_dir))
    )
    joined = attribution_join(imps, clks, max_delay_seconds=300)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_join_live")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    live = spark.sql("SELECT * FROM attr_join_live")
    assert _rows(live) == EXPECTED
