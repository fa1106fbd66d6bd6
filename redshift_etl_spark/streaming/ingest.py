"""Continuous corpus ingest with global dedup — the streaming form of
the `incremental_ingest` daily-run shape: every micro-batch dedupes
within itself (exact fingerprint groupBy) AND against everything ever
stored, then appends only the new documents to the corpus store.

Exactly-once without a transaction log: the store's own content is the
idempotence ledger. A crash-replayed batch re-runs the anti-join
against a store that already holds its fingerprints and appends
nothing — content-based dedup makes redelivery a no-op by construction
(same argument as merge idempotence in `ctr.start_merge_sink`, but here
the MERGE key is the content hash).

Scale shape per trigger: one md5 groupBy over the BATCH only, one
anti-join batch-vs-store on the fingerprint column (the store side
prunes to that single column; Spark's runtime bloom filter or a
broadcast of the batch's fingerprints keeps the store scan cheap), one
append write. Raw corpus text is never rescanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_ingest_batch(
    batch_df: DataFrame,
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch body (module-level so tests can drive replay
    semantics directly): batch-internal exact dedup → anti-join against
    stored fingerprints → append survivors as (id, text, fingerprint).
    Idempotent: re-running with the same batch appends nothing."""
    spark = batch_df.sparkSession
    # Winners carried THROUGH the groupBy (text is constant within a
    # fingerprint group, so min(text) IS the text) — no join back to
    # the batch. The r4 formulation joined winners to the batch on id
    # alone, so a batch that reused a doc_id for two different texts
    # multiplied the match and appended mismatched (fingerprint, text)
    # pairs; keying the agg by fingerprint makes the pairing exact by
    # construction.
    keep = (
        batch_df.select(
            F.col(id_col),
            F.col(text_col),
            F.md5(F.col(text_col)).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.min(text_col).alias(text_col),
        )
    )
    if os.path.exists(corpus_path):
        stored = spark.read.parquet(corpus_path).select(
            "fp_bucket", "fingerprint"
        )
        keep = keep.withColumn(
            "fp_bucket", F.substring("fingerprint", 1, 2)
        ).join(stored, ["fp_bucket", "fingerprint"], "left_anti")
    else:
        keep = keep.withColumn(
            "fp_bucket", F.substring("fingerprint", 1, 2)
        )
    new_rows = keep.select(id_col, text_col, "fingerprint", "fp_bucket")
    # append is safe mid-read: parquet appends are new part files, and
    # the store read above already resolved its file list.
    #
    # The store is hive-partitioned on the 2-hex fingerprint prefix
    # (256 buckets): the anti-join probe reads only the single pruned
    # fingerprint column, the bucket key joins partition-to-partition,
    # and a periodic compaction that sorts within buckets gives parquet
    # min/max page skipping — so per-trigger probe cost is bounded by
    # the store's fingerprint-column footprint, not its text payload,
    # and stays prunable as the store grows over the stream's lifetime.
    new_rows.write.mode("append").partitionBy("fp_bucket").parquet(
        corpus_path
    )


def start_dedup_ingest_sink(
    stream: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
):
    """Attach the dedup-ingest body to a document stream. The target is
    an append-only store in which every fingerprint occurs exactly once
    across the whole stream lifetime — the corpus a trainer reads."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_ingest_batch(batch_df, corpus_path, id_col, text_col)

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
