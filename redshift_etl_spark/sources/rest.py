"""REST API sources (SURVEY §2.1 S8/S9) — the reference fetches Amazon
Connect APIs and Google Sheets driver-side and row-inserts the results
(`Amazon Connect/connect_agent_metrics.py:18-66`,
`…CTR with boto3/lambda_boto3_connect_redshift.py:91-189`,
`Google Sheets/Employee/lambda_legal_employee_upsert.py:149-156`).

Engine shape:
- ``rows_to_df`` — small result sets: fetch on the driver, one
  createDataFrame (Arrow), then normal distributed processing.
- ``fanout_fetch`` — large id lists: distribute the fetch itself with
  ``mapInPandas`` over a partitioned id frame; each partition calls the
  API client with its batch (with retry/backoff — ST6). The actual HTTP
  client is injected; this container has no network, so tests inject a
  deterministic fake.

Pagination (NextToken loops) and rate limiting live in the injected
fetcher — they are connector concerns, not relational ones.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def rows_to_df(
    spark: SparkSession,
    rows: Iterable[dict],
    schema: T.StructType,
) -> DataFrame:
    """Driver-side fetch → DataFrame (S8/S9 small path)."""
    return spark.createDataFrame(list(rows), schema=schema)


def with_retry(
    fn: Callable[..., object],
    retries: int = 3,
    backoff_s: float = 2.0,
    retryable: type[Exception] = Exception,
) -> Callable[..., object]:
    """ST6 — retry/backoff on rate limit
    (`…CTR with boto3/lambda_boto3_connect_redshift.py:112-115`)."""

    def wrapped(*args, **kwargs):
        for attempt in range(retries + 1):
            try:
                return fn(*args, **kwargs)
            except retryable:
                if attempt == retries:
                    raise
                time.sleep(backoff_s * (attempt + 1))

    return wrapped


def fanout_fetch(
    ids: DataFrame,
    fetch_batch: Callable[[list], list[dict]],
    out_schema: T.StructType,
    id_col: str = "id",
    batch_size: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """S8 scale path — distribute per-id API enrichment across the
    cluster: partition the id frame, each task calls ``fetch_batch`` on
    chunks of ``batch_size`` (the reference's MaxResults=100 analog) and
    yields Arrow batches. Python here is I/O-bound fan-out, not row
    compute — the legitimate mapInPandas use."""
    if num_partitions:
        ids = ids.repartition(num_partitions)
    names = [f.name for f in out_schema.fields]

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            vals = pdf[id_col].tolist()
            for i in range(0, len(vals), batch_size):
                out = fetch_batch(vals[i : i + batch_size])
                if out:
                    yield pd.DataFrame(out, columns=names)

    return ids.mapInPandas(run, schema=out_schema)
