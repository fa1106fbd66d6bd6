"""Trending terms over an unbounded document stream — watermarked
tumbling-window token counts, the streaming form of the batch
token-frequency aggregates in `operators/text.py`.

Append output mode: a window's counts emit exactly once, after the
watermark passes its end — so the sink receives CLOSED windows only and
per-window ranking downstream is deterministic. State is bounded by the
watermark (Spark evicts a window's state once it can no longer change).
Lateness semantics are Spark's documented best-effort: an event behind
the watermark still merges if its window's state has not yet been
evicted (eviction happens at the end of the batch that advances the
watermark past the window), and is dropped only after — the watermark
is a state-retention bound, not a strict admission filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import tokens_col


def trending_terms_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """(window, token, n) per closed tumbling window. One explode + one
    windowed hash agg; the shuffle key is (window, token) — uniform by
    construction except stopword heads, which AQE's skew split handles
    exactly as in the batch token aggs."""
    return (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).alias("w"),
            F.explode(tokens_col(text_col)).alias("token"),
        )
        .groupBy("w", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "token",
            F.col("n").cast("long").alias("n"),
        )
    )


def topk_terms(closed_counts: DataFrame, k: int = 3) -> DataFrame:
    """Per-window top-k over the CLOSED windows a trending sink has
    collected — deterministic (n DESC, token ASC) rank. Batch-side
    post-step: append mode guarantees each window arrived exactly once,
    so ranking here equals ranking inside the engine."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("token")
    )
    return (
        closed_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "token", "n", F.col("rank").cast("long"))
    )
