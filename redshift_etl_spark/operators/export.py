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

from collections.abc import Sequence

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


def export_webdataset_shards(
    df: DataFrame,
    path: str,
    key: Column | str,
    n_shards: int,
    text_col: str = "text",
    meta_cols: Sequence[str] = (),
) -> list[str]:
    """Write the corpus as WebDataset-style tar shards —
    ``path/shard-NNNNN.tar`` each holding ``{key}.txt`` (UTF-8 content)
    and ``{key}.json`` (metadata) members, the format streaming data
    loaders consume directly (members of one sample share the basename;
    samples are contiguous).

    Distributed shape: the same deterministic md5-mod shard assignment
    as `export_shards`, one repartition so each shard's rows land in
    exactly one task, then a per-partition tar writer (`mapInPandas`)
    that streams members in deterministic key order — executors write
    shard files directly to the shared filesystem, the driver only
    collects the tiny (shard, n_samples) report. Tar members carry a
    fixed mtime (0) so a shard's bytes are a pure function of its
    content — re-runs are binary-identical, diffable, cacheable.

    Returns the sorted list of shard file paths written."""
    import io
    import json as _json
    import os
    import tarfile

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    # a Column key has no name to select later — materialize it first,
    # then shard on the materialized column (same hash, same shards)
    if isinstance(key, str):
        key_name = key
    else:
        key_name = "__key"
        df = df.withColumn(key_name, key)
    sharded = assign_shards(df, key_name, n_shards)
    cols = [key_name, text_col, *meta_cols, "shard"]
    part = sharded.select(*cols).repartition(n_shards, "shard")

    def write_tars(batches):
        # one partition = one shard (the repartition above); the whole
        # shard is materialized to build its tar — size shards via
        # n_shards so each fits executor memory, the same constraint
        # any tar/WebDataset writer has
        chunks = list(batches)
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True)
        if rows.empty:
            return
        for shard, grp in rows.groupby("shard", sort=True):
            out = os.path.join(path, f"shard-{int(shard):05d}.tar")
            grp = grp.sort_values(key_name, kind="mergesort")
            with tarfile.open(out, "w") as tar:
                for _, r in grp.iterrows():
                    base = str(r[key_name])
                    body = (r[text_col] or "").encode("utf-8")
                    info = tarfile.TarInfo(name=f"{base}.txt")
                    info.size = len(body)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(body))
                    meta = _json.dumps(
                        {c: _jsonable(r[c]) for c in meta_cols},
                        sort_keys=True,
                    ).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{base}.json")
                    info.size = len(meta)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(meta))
            yield pd.DataFrame(
                {"shard": [int(shard)], "n_samples": [len(grp)]}
            )

    report = part.mapInPandas(
        write_tars, schema="shard long, n_samples long"
    )
    written = {r["shard"] for r in report.collect()}
    return sorted(
        os.path.join(path, f"shard-{int(s):05d}.tar") for s in written
    )


def _jsonable(v):
    """numpy scalars → Python natives for json.dumps."""
    try:
        return v.item()
    except AttributeError:
        return v


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "hrw",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment — the
    consistent-placement primitive for shard maps, cache affinity, and
    writer routing at cluster scale: every key independently picks the
    shard with the highest hash weight, so adding a shard moves only
    ~1/(k+1) of the keys (mod-k hashing reshuffles ~all of them — the
    `shard_manifest` md5-mod sharding is for FROZEN exports; this is
    the live-topology variant).

    Weight = md5('salt:key:shard') compared LEXICOGRAPHICALLY — a
    deterministic total order identical in any engine with md5, no
    numeric conversion needed. Implementation is relational (the
    engine-portable spelling): a key × shard-literal fan-out (bounded
    by the shard-count CONFIG) and one max_by per key — one map-side
    projection + one hash agg, no shuffle beyond the agg.

    Returns (key, shard)."""
    # distinct BEFORE the fan-out: duplicate keys would explode
    # n_shards× each and collapse again in the agg — same answer,
    # n_dups× the work (r10 ADVICE)
    pairs = df.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(
            F.array(*[F.lit(s) for s in range(int(n_shards))])
        ).alias("__s"),
    )
    h = F.md5(
        F.concat(
            F.lit(salt), F.lit(":"), F.col(key_col).cast("string"),
            F.lit(":"), F.col("__s").cast("string"),
        )
    )
    return (
        pairs.withColumn("__h", h)
        .groupBy(key_col)
        .agg(F.max_by("__s", "__h").cast("long").alias("shard"))
    )
