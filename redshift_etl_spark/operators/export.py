"""Training-shard export — deterministic sharding with a verifiable
manifest.

The last step of a 100 TB data pipeline is writing the corpus as
fixed-count shards (WebDataset/TFRecord-style) that trainers stream;
what makes shards trustworthy is a MANIFEST the reader can re-derive:
per shard its row count, byte volume, and an order-independent content
checksum. The reference's closest analog is its per-folder row-count
audit (SURVEY §2.1 S3); this operator makes the contract explicit and
cross-engine checkable.

Design:
- shard id = 48-bit md5 prefix of the stable key, mod n_shards — the
  same deterministic-hash discipline as `sampling.hash_bucket`
  (reruns, engines, and partitionings all agree; no RAND()).
- checksum = BIT_XOR of the 48-bit md5 prefix of the content column.
  XOR is associative/commutative/order-independent, so the aggregate
  is partitioning-exact and any reader can recompute it shard-local.
- `export_shards` writes `partitionBy(shard)` so each shard is a
  directory Spark prunes on read; one shuffle (repartition by shard)
  makes each shard a bounded file set rather than
  files × upstream-partitions fragments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "content_hash48",
    "assign_shards",
    "shard_manifest",
    "export_shards",
    "hash48_sql",
]


def content_hash48(col: Column | str) -> Column:
    """First 48 bits of md5 as a BIGINT — wide enough for checksums,
    small enough that every SQL engine's integer type holds it."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def hash48_sql(col_sql: str) -> str:
    """DuckDB twin of `content_hash48` (hex-literal cast)."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({col_sql} AS VARCHAR)), 1, 12)) "
        "AS BIGINT)"
    )


def assign_shards(
    df: DataFrame, key: Column | str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Deterministic shard id 0..n_shards-1 from the stable key."""
    return df.withColumn(
        out_col, F.pmod(content_hash48(key), F.lit(n_shards)).cast("long")
    )


def shard_manifest(
    df: DataFrame,
    key: Column | str,
    content: Column | str,
    n_shards: int,
) -> DataFrame:
    """(shard, n_rows, total_bytes, checksum) — the reader-verifiable
    contract. One hash aggregate over the shard id."""
    c = F.col(content) if isinstance(content, str) else content
    return (
        assign_shards(df, key, n_shards)
        .withColumn("__h", content_hash48(c))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.octet_length(c)).cast("long").alias("total_bytes"),
            F.expr("bit_xor(__h)").alias("checksum"),
        )
    )


def export_shards(
    df: DataFrame,
    path: str,
    key: Column | str,
    content: Column | str,
    n_shards: int,
    mode: str = "overwrite",
) -> DataFrame:
    """Write the corpus as `path/shard=N/` parquet directories and
    return the manifest computed from the SAME frame. Repartitioning on
    the shard id bounds each shard to its own file set."""
    sharded = assign_shards(df, key, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    return shard_manifest(df, key, content, n_shards)


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    key: Column | str,
    n_shards: int,
    mode: str = "overwrite",
) -> None:
    """Write the frame as ``path/shard=N/*.json`` JSON-lines — the
    interchange format LLM training stacks actually consume (one JSON
    object per line, UTF-8). Same deterministic md5-mod shard
    assignment as `export_shards`; one repartition on the shard id so
    each shard is its own file set, readable shard-parallel with
    partition pruning. Column types survive the JSON round-trip for
    string/long/double/bool/array payloads (timestamps: cast to ISO
    strings first — JSON has no timestamp type and readers differ)."""
    sharded = assign_shards(df, key, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode(mode)
        .partitionBy("shard")
        .json(path)
    )
