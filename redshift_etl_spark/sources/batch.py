"""Batch file sources — the reference's S3-CSV ingest path (SURVEY §2.1
S1/S2/S4) as schema-first Spark readers.

The reference reads each CSV with pandas inference then coerces by hand
(`Salesforce/Task/lambda_litify_task.py:158-159`, `:97-111`); here the
read applies the registry schema *as strings* (CSV arrives untyped) and
the normalize op does the typed coercion — so bad cells degrade to NULL
per T1–T7 instead of failing the file.

Scale notes: multi-path globs give Spark one distributed read over all
new folders (the reference loops folders serially in one Lambda);
`maxPartitionBytes` controls split sizing; column pruning/pushdown work
because normalize is a single projection over the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..schemas import ObjectSchema
from ..transforms import normalize


def read_csv_object(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: ObjectSchema,
    header: bool = True,
) -> DataFrame:
    """S1 — CSV scan + normalize. All columns are read as strings
    (no inference — deterministic across files), then coerced per the
    object schema in one projection."""
    if isinstance(paths, str):
        paths = [paths]
    raw = spark.read.csv(list(paths), header=header, inferSchema=False)
    return normalize(raw, schema)


def read_json_object(
    spark: SparkSession, paths: str | Sequence[str], schema: ObjectSchema
) -> DataFrame:
    """S4 (read side) — JSON-lines staging files
    (`Salesforce/Task/lambda_litify_task.py:30-33` writes these)."""
    if isinstance(paths, str):
        paths = [paths]
    raw = spark.read.json(list(paths))
    return normalize(raw, schema)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4 (write side) — JSON-lines sink; ISO timestamps are Spark's
    default JSON format, matching the reference's
    ``date_format='iso'``."""
    df.write.mode(mode).json(path)
