"""Versioned parquet tables — snapshot isolation, time travel, rollback.

The reference gets transactionality for free from Redshift
(`BEGIN…END` around every stored-procedure merge); a lake engine needs
its own story. `merge_scd1_write`'s temp+rename gives single-writer
atomicity but keeps no history. This layer adds the minimal
Delta-style contract on plain parquet, no table format required:

- every write lands in a fresh ``root/v=N/`` directory;
- ``root/_CURRENT`` names the live version, updated by an ATOMIC
  ``os.replace`` — a reader that resolved the pointer sees a complete,
  immutable snapshot regardless of concurrent writers (readers never
  list the root);
- old versions stay until ``vacuum`` — so time travel
  (``read_version``) and instant ``rollback`` (re-point, no data
  movement) come for free.

On a Delta/Iceberg cluster this maps 1:1 onto the real table format
(commit log ↔ pointer, VACUUM ↔ vacuum, RESTORE ↔ rollback); the point
here is that the ENGINE's merge/compact/ingest operators compose with
snapshots either way.

Scale notes: the pointer file is O(1); version directories are
standard parquet (partition pruning, pushdown, compaction all apply
inside a snapshot). Retention is the only cost — ``vacuum(keep=k)``
bounds storage at k snapshots.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_PTR = "_CURRENT"

# Hive's directory spelling for a NULL partition value (Spark writes
# the same constant — see ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
_HIVE_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


def _hive_value_str(v) -> str:
    """A collected partition value's Hive directory spelling (before
    %XX escaping). Python's str() agrees for ints/strings/dates, but
    booleans differ — str(True) is 'True' while Spark writes
    'grp=true' — which would silently hard-link an affected boolean
    partition through untouched (the ADVICE r09 class)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _unescape_hive(value: str) -> str:
    """Decode Hive partition-path escaping: special characters in a
    partition VALUE are written as %XX in the directory name ('a/b' →
    'a%2Fb'); '%' itself is escaped as %25, so every %XX in a directory
    value is an escape. Matching the raw directory string against
    str(collected value) silently misses every escaped value — the
    affected partition would be hard-linked untouched into the new
    version, a silent right-to-be-forgotten failure (ADVICE r09)."""
    return re.sub(
        r"%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), value
    )


def _vdir(root: str, n: int) -> str:
    return os.path.join(root, f"v={n}")


def versions(root: str) -> list[int]:
    """All landed versions, ascending (committed or not-yet-pointed)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def current_version(root: str) -> int | None:
    try:
        with open(os.path.join(root, _PTR)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _point(root: str, n: int) -> None:
    tmp = os.path.join(root, _PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, os.path.join(root, _PTR))  # atomic on POSIX


def write_version(
    df: DataFrame, root: str, partition_by: str | None = None
) -> int:
    """Land ``df`` as the next version and commit the pointer to it.
    The write happens entirely in the new directory; the commit is the
    one atomic pointer swap at the end. ``partition_by`` lays the
    snapshot out hive-partitioned — the layout `forget_keys` needs for
    partition-scoped erasure rewrites."""
    os.makedirs(root, exist_ok=True)
    vs = versions(root)
    n = (vs[-1] + 1) if vs else 0
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(_vdir(root, n))
    _point(root, n)
    return n


def read_current(spark: SparkSession, root: str) -> DataFrame:
    n = current_version(root)
    if n is None:
        raise FileNotFoundError(f"no committed version under {root}")
    return spark.read.parquet(_vdir(root, n))


def read_version(spark: SparkSession, root: str, n: int) -> DataFrame:
    """Time travel: read snapshot ``n`` (must not be vacuumed)."""
    return spark.read.parquet(_vdir(root, n))


def rollback(root: str, n: int) -> None:
    """Instant restore: re-point to an older snapshot. No data moves;
    the abandoned head stays until vacuum (so rollback is itself
    reversible)."""
    if n not in versions(root):
        raise ValueError(f"version {n} not present under {root}")
    _point(root, n)


def vacuum(root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the current
    one). Returns the dropped version numbers."""
    cur = current_version(root)
    vs = versions(root)
    drop = [n for n in vs[:-keep] if n != cur] if keep > 0 else []
    for n in drop:
        shutil.rmtree(_vdir(root, n), ignore_errors=True)
    return drop


def forget_keys(
    spark: SparkSession,
    root: str,
    key_col: str,
    keys,
    partition_col: str | None = None,
) -> dict | None:
    """Right-to-be-forgotten delete: commit a new snapshot WITHOUT the
    given keys. ``keys`` is a Python sequence (erasure requests are
    request-sized) or a 1-column DataFrame (bulk erasure — joined,
    never collected).

    Rewrite cost is scoped: with ``partition_col`` set (the store's
    hive partition column), one cheap scan of (key, partition) finds
    the AFFECTED partition values; untouched partitions are hard-linked
    into the new version directory (same filesystem ⇒ O(1) per file,
    no data copied — falls back to copy across devices) and only
    affected partitions re-run the anti-join — at 100 TB the rewrite
    is proportional to the partitions containing the keys, not the
    table. Without ``partition_col``, the whole table rewrites (the
    correct default for unpartitioned stores).

    Scale evidence (r10 rehearsal, `scripts/scale_rehearsal.py`
    forget_keys_scoped probe — day-partitioned event stores, same
    1,672-key erasure touching ONE day): 10x the table and 10x the
    partitions left the erasure wall FLAT (4.64 s → 4.37 s) with
    BYTE-IDENTICAL physical rewrite (41,765 bytes — the one affected
    partition's survivors) while hard-linked partitions grew 29 → 299
    at O(1) per file (2.3 MB → 23 MB linked, zero copied). Cost is
    proportional to affected partitions, as claimed.

    Returns a report dict (rows_removed, partitions_rewritten,
    partitions_linked, version) or None when no key matched (no new
    version is committed — erasure of an absent key is a no-op, not
    history churn). HARD delete semantics: prior snapshots still
    contain the rows until ``vacuum`` drops them — run
    ``vacuum(root, keep=1)`` after the commit to complete an erasure
    obligation (the Delta VACUUM story)."""
    cur = read_current(spark, root)
    import pyspark.sql.functions as F

    if isinstance(keys, DataFrame):
        kdf = keys.toDF(key_col)
        match = cur.join(kdf, key_col, "left_semi")
        drop = lambda df: df.join(kdf, key_col, "left_anti")  # noqa: E731
    else:
        keys = list(keys)
        match = cur.filter(F.col(key_col).isin(keys))
        drop = lambda df: df.filter(  # noqa: E731
            ~F.col(key_col).isin(keys)
        )

    vs = versions(root)
    n = vs[-1] + 1
    new_dir = _vdir(root, n)
    if partition_col is None:
        removed = match.count()
        if removed == 0:
            return None
        drop(cur).write.mode("overwrite").parquet(new_dir)
        _point(root, n)
        return {
            "version": n,
            "rows_removed": removed,
            "partitions_rewritten": None,
            "partitions_linked": 0,
        }

    affected_vals = [
        r[0] for r in match.select(partition_col).distinct().collect()
    ]  # bounded by the erasure request's partition spread
    if not affected_vals:
        return None
    has_null = any(v is None for v in affected_vals)
    nonnull_vals = [v for v in affected_vals if v is not None]
    # directory names carry the Hive-ESCAPED string spelling; compare
    # unescaped-dir against str(value) so escaped and NULL partitions
    # are rewritten, never silently linked through (ADVICE r09)
    affected_strs = {_hive_value_str(v) for v in nonnull_vals}
    removed = match.count()
    src_dir = _vdir(root, current_version(root))
    part_dirs = [
        name
        for name in os.listdir(src_dir)
        if os.path.isdir(os.path.join(src_dir, name))
        and name.startswith(f"{partition_col}=")
    ]
    if not part_dirs:
        # the snapshot was NOT written hive-partitioned on this column:
        # there is nothing to link, and proceeding would commit a new
        # version holding ONLY the affected-partition survivors — every
        # other row silently dropped with a success report (ADVICE r09)
        raise ValueError(
            f"snapshot v={current_version(root)} under {root} has no "
            f"'{partition_col}=' partition directories — it was not "
            f"written with partition_by={partition_col!r}; call "
            "forget_keys without partition_col (full rewrite) or "
            "rewrite the store partitioned first"
        )
    os.makedirs(new_dir, exist_ok=True)
    linked = 0
    for name in part_dirs:
        raw = name.split("=", 1)[1]
        if raw == _HIVE_NULL_DIR:
            if has_null:
                continue  # NULL partition is affected: rewrite, not link
        elif _unescape_hive(raw) in affected_strs:
            continue
        full = os.path.join(src_dir, name)
        dst = os.path.join(new_dir, name)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(full):
            s, d = os.path.join(full, f), os.path.join(dst, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
        linked += 1
    cond = (
        F.col(partition_col).isin(nonnull_vals)
        if nonnull_vals
        else F.lit(False)
    )
    if has_null:
        cond = cond | F.col(partition_col).isNull()
    kept = drop(cur.filter(cond))
    kept.write.mode("append").partitionBy(partition_col).parquet(new_dir)
    _point(root, n)
    return {
        "version": n,
        "rows_removed": removed,
        "partitions_rewritten": len(affected_vals),
        "partitions_linked": linked,
    }


def merge_scd1_version(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key,
    recency_col: str,
) -> int:
    """The recurring SCD1 merge against a versioned table: read the
    current snapshot, merge, land as a new version. Readers of the old
    pointer keep a consistent view for the whole duration; rollback
    undoes a bad load in O(1)."""
    from ..operators.merge import merge_scd1

    target = read_current(spark, root)
    merged = merge_scd1(target, source, key, recency_col)
    return write_version(merged, root)


def version_diff(
    spark: SparkSession,
    root: str,
    key: str,
    compare_cols,
    old_version: int,
    new_version: int | None = None,
) -> DataFrame:
    """Change data feed between two snapshots: (key, change_type ∈
    added/removed/changed), NULL-safe — `quality.snapshot_diff` over
    the stored versions. Answers "what did load N change?" without any
    bookkeeping at write time; one full-outer key shuffle."""
    from ..operators.quality import snapshot_diff

    if new_version is None:
        new_version = current_version(root)
        if new_version is None:
            raise FileNotFoundError(f"no committed version under {root}")
    return snapshot_diff(
        read_version(spark, root, old_version),
        read_version(spark, root, new_version),
        key,
        list(compare_cols),
    )


# --- streaming: exactly-once versioned sink --------------------------------

_BATCH_MARK = "_LAST_BATCH"


def last_applied_batch(root: str) -> tuple[str, int] | None:
    """(stream_id, epoch) of the last applied micro-batch, or None.
    The stream id scopes the epoch counter: Spark epoch ids restart at
    0 for every new checkpoint, so a bare epoch high-water mark would
    silently drop the first batches of a NEW stream over new data
    (same shape as Delta's (txnAppId, txnVersion) idempotence keys)."""
    try:
        with open(os.path.join(root, _BATCH_MARK)) as f:
            sid, _, epoch = f.read().strip().rpartition(":")
            return sid, int(epoch)
    except (FileNotFoundError, ValueError):
        return None


def start_versioned_merge_sink(
    stream: DataFrame,
    root: str,
    checkpoint_path: str,
    key,
    recency_col: str,
    trigger_seconds: int | None = None,
):
    """Exactly-once streaming merge into a versioned table: each
    micro-batch lands as a NEW snapshot via `merge_scd1_version`, and a
    ``_LAST_BATCH`` marker (committed by the same atomic-replace
    pattern as the version pointer) makes redelivery a NO-OP — a batch
    replayed after a crash between sink-commit and checkpoint-commit is
    skipped instead of re-applied. The marker records (stream id,
    epoch), with the stream id derived from the checkpoint location —
    epochs only dedupe within the SAME checkpoint's lifetime, because
    a fresh checkpoint restarts epoch ids at 0 over possibly brand-new
    data (Delta's (txnAppId, txnVersion) discipline). A deliberately
    rebuilt checkpoint replaying old files therefore re-applies them —
    merge idempotence keeps the STATE correct either way; the marker's
    job is keeping the VERSION HISTORY clean on crash-replay, which is
    what rollback/audit consumers read. Downstream always sees a
    consistent snapshot mid-merge (pointer semantics)."""
    import hashlib

    stream_id = hashlib.md5(
        os.path.abspath(checkpoint_path).encode()
    ).hexdigest()[:16]

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        last = last_applied_batch(root)
        if last is not None and last[0] == stream_id and epoch_id <= last[1]:
            return  # crash-replayed batch of THIS stream: already landed
        spark = batch_df.sparkSession
        if current_version(root) is None:
            os.makedirs(root, exist_ok=True)
            write_version(
                spark.createDataFrame([], batch_df.schema), root
            )
        merge_scd1_version(spark, root, batch_df, key, recency_col)
        tmp = os.path.join(root, _BATCH_MARK + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"{stream_id}:{epoch_id}")
        os.replace(tmp, os.path.join(root, _BATCH_MARK))

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def commit_group(writes: dict[str, tuple[DataFrame, str | None]]) -> dict[str, int]:
    """Cross-TABLE atomic commit — a training-data release is several
    tables that must move together (the corpus and its ANN index, a
    fact table and its rollup MV): committing them one `write_version`
    at a time exposes readers to a window where table A is new and
    table B is old. This stages EVERY table's data first and swaps all
    pointers only after every write succeeded:

        commit_group({rootA: (dfA, None), rootB: (dfB, "day")})

    Guarantees (single-writer, the module's contract):
    - any write failure before the swap phase leaves EVERY pointer
      untouched (staged ``v=N`` directories may remain — they are
      unreferenced and the next write/vacuum reclaims them: the same
      garbage story as an aborted Delta commit);
    - the swap phase is per-table ``os.replace`` (atomic each) in a
      deterministic (sorted-root) order, so a reader crossing the
      swap window can see {old,old}, {new,old}, or {new,new} — but
      never a TORN table, and "B new while A old" is excluded for
      readers that resolve pointers in the same sorted order.
    True multi-table isolation needs a shared manifest (one pointer
    naming every table's version — the Iceberg-catalog shape); this is
    the two-phase approximation that plain per-table pointers admit,
    and the staging phase is where all the time goes, so the
    inconsistency window is microseconds, not write-minutes.

    Returns {root: committed_version}."""
    staged: dict[str, int] = {}
    for root in sorted(writes):
        df, partition_by = writes[root]
        os.makedirs(root, exist_ok=True)
        vs = versions(root)
        n = (vs[-1] + 1) if vs else 0
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(_vdir(root, n))
        staged[root] = n
    for root in sorted(staged):
        _point(root, staged[root])
    return staged


def schema_drift(
    spark: SparkSession, root: str, old_n: int, new_n: int | None = None
) -> list[dict]:
    """Schema drift between two snapshots of a versioned table — the
    migration tripwire an upstream change trips BEFORE a consumer
    does: columns added, removed, or type-changed between version
    ``old_n`` and ``new_n`` (default: the current pointer). Reads only
    parquet FOOTERS (a LIMIT-0 schema resolve per side, no data scan).
    Returns a sorted list of {column, change, old_type, new_type}
    dicts; empty means the schemas are identical."""
    if new_n is None:
        new_n = current_version(root)
    old = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, root, old_n).schema.fields
    }
    new = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, root, new_n).schema.fields
    }
    out: list[dict] = []
    for c in sorted(old.keys() | new.keys()):
        if c not in new:
            out.append(
                {"column": c, "change": "removed", "old_type": old[c], "new_type": None}
            )
        elif c not in old:
            out.append(
                {"column": c, "change": "added", "old_type": None, "new_type": new[c]}
            )
        elif old[c] != new[c]:
            out.append(
                {
                    "column": c,
                    "change": "type_changed",
                    "old_type": old[c],
                    "new_type": new[c],
                }
            )
    return out
