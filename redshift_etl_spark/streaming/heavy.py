"""Continuous heavy hitters — bounded-state Misra-Gries on a stream.

Batch `operators/heavy.heavy_hitters` recounts candidates exactly in a
second pass; a stream has no second pass, so the continuous variant
keeps a per-bucket Misra-Gries summary as STREAMING STATE and emits
the current candidates every micro-batch.

State layout: items hash-partition into ``buckets`` groups
(deterministic ``pmod(xxhash64(item), buckets)``), each group's state
is one MG summary with ``d - 1`` counters. Because partitioning is BY
ITEM, an item's occurrences all land in one bucket, so a global heavy
hitter (freq > n/d over the whole stream) has freq > n_b/d within its
bucket and MG's guarantee applies directly: it is ALWAYS among the
emitted candidates, over the stream's entire lifetime. Total state is
``buckets × (d-1)`` counters — fixed, never grows with cardinality
(the same bounded-state posture as `dropDuplicatesWithinWatermark`
vs the reference's unbounded DynamoDB table).

Emitted counts are MG lower bounds (true frequency ≥ count, and
≥ true − n_b/d); a caller needing exact figures recounts the emitted
candidate set offline — the same candidates→recount split as the
batch operator, with the candidate pass running forever.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_SCHEMA = "items array<string>, counts array<long>, seen long"
_OUT_SCHEMA = "bucket long, item string, min_count long, bucket_seen long"


def heavy_hitters_stream(
    df: DataFrame,
    item_col: str,
    d: int,
    buckets: int = 64,
) -> DataFrame:
    """Streaming MG candidates over ``df[item_col]`` (strings): per
    micro-batch each touched bucket re-emits its full candidate set —
    (bucket, item, min_count, bucket_seen) in update mode."""
    if d < 2:
        raise ValueError("d must be >= 2")

    def fn(key, pdf_iter: Iterator, state) -> Iterator:
        import pandas as pd

        from ..operators.heavy import mg_merge

        if state.exists:
            items, counts, seen = state.get
            mg = dict(zip(items, counts))
        else:
            mg, seen = {}, 0
        for pdf in pdf_iter:
            mg, n = mg_merge(mg, pdf["item"], d)
            seen += n
        state.update((list(mg.keys()), list(mg.values()), seen))
        if mg:
            yield pd.DataFrame(
                {
                    "bucket": key[0],
                    "item": list(mg.keys()),
                    "min_count": list(mg.values()),
                    "bucket_seen": seen,
                }
            )

    keyed = df.select(
        F.col(item_col).alias("item"),
        F.pmod(F.xxhash64(item_col), F.lit(buckets)).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", "NoTimeout"
    )
