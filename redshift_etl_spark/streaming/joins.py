"""Stream-stream event-time joins — attribution over two live feeds.

The canonical use: join a click stream to the impression that caused
it, where the click must arrive within an attribution window after its
impression. In a warehouse this is a batched range join run hours
later; Structured Streaming answers it continuously, and the ONLY way
the engine can ever free join state is an event-time constraint on
BOTH sides plus watermarks — the time bound is what turns an unbounded
join into bounded state:

  - each impression is retained until the watermark passes
    imp_time + max_delay (no later click can match it);
  - each click is retained until the watermark passes click_time
    (its impression, if any, must carry an earlier event time).

So state is O(events per attribution window), independent of stream
lifetime — the same bounded-state discipline as the dedup/top-k/
heavy-hitter operators in this package.

In batch mode (static frames) the identical expression degrades to a
plain interval join, which is how the semantics are oracle-checked:
`queries/relational.py` runs the same predicate as a batch range join
against a DuckDB twin; the streaming tests then pin that the live
two-stream form emits exactly the batch answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "ad_id",
    imp_time: str = "imp_time",
    click_time: str = "click_time",
    max_delay_seconds: int = 300,
    watermark: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Click-to-impression attribution: match (same ``key``) where
    ``click_time`` ∈ [imp_time, imp_time + max_delay_seconds]. On
    streaming inputs both sides are watermarked so the state store
    stays bounded by the attribution window; ``how="leftOuter"`` also
    emits impressions that expire unclicked (the negative set an ads
    pipeline trains on), released once the watermark proves no click
    can still arrive."""
    imp = impressions
    clk = clicks
    if imp.isStreaming:
        imp = imp.withWatermark(imp_time, watermark)
    if clk.isStreaming:
        clk = clk.withWatermark(click_time, watermark)
    cond = (
        (imp[key] == clk[key])
        & (clk[click_time] >= imp[imp_time])
        & (
            clk[click_time]
            <= imp[imp_time]
            + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    joined = imp.join(clk, cond, how)
    return joined.select(
        imp[key].alias(key),
        imp[imp_time].alias(imp_time),
        clk[click_time].alias(click_time),
        (
            clk[click_time].cast("long") - imp[imp_time].cast("long")
        ).alias("delay_sec"),
    )
