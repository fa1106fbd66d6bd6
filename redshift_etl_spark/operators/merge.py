"""Merge operators — the reference's warehouse-side semantics (SURVEY
§2.3 J1–J6, §2.2 P6/P7) as distributed DataFrame algebra.

The reference runs these as Redshift stored procedures:
- SCD Type 1 MERGE: `Salesforce/Task/SP_litify_task.sql:14-77` (and
  User/Matter/Employee variants — the Matter merge is ~880 lines of
  hand-written column lists; here it is schema-driven and O(1) code).
- insert-only anti-join: `…CTR with boto3/SP_boto3_connect_redshift.sql:15-26`.
- composite-key update-if-changed: `Google Sheets/Goals/lambda_legal_goals_upsert.py:48-77`.

Scale design:
- Both sides shuffle once on the key; with the target bucketed/partitioned
  by key the source-side shuffle is the only one.
- The staging side is deduped to one row per key FIRST (row_number by
  recency) — at 100 TB this is the step that keeps the join 1:1 instead
  of exploding; the reference only guarantees it operationally
  (one CSV per merge, `Salesforce/Task/lambda_litify_task.py:153-164`).
- Typical staging batches are ≪ target: when `source` fits the broadcast
  threshold Catalyst broadcasts the anti-join side automatically (AQE).
- `merge_scd1_write` materializes behind a table-format switch:
  parquet temp-path + atomic rename by default (fail-fast concurrent-
  reader contract), or a true transactional Delta MERGE when the
  delta-spark runtime is present (`delta_available`); the pure
  `merge_scd1` returns the merged DataFrame for composition / oracle
  checking.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _key_list(key: str | Sequence[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def latest_per_key(
    df: DataFrame,
    key: str | Sequence[str],
    recency_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """One row per key, newest ``recency_col`` wins; deterministic
    tie-break on ``tiebreakers`` then remaining columns (SURVEY §7 risk 2:
    the reference leaves ties undefined — we pin them).

    row_number over (partition by key, order by recency desc) — a single
    hash-partition shuffle on the key, exactly the partitioning the
    subsequent merge join needs, so Catalyst reuses it.
    """
    keys = _key_list(key)
    order = [F.col(recency_col).desc_nulls_last()]
    order += [F.col(c).desc_nulls_last() for c in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def changed_or_new(
    source: DataFrame,
    target: DataFrame,
    key: str | Sequence[str],
    recency_col: str,
) -> DataFrame:
    """P6/J1 — change-detection filter: keep source rows that are new
    (key absent from target) or newer (`recency > target.recency`).
    `Salesforce/Task/SP_litify_task.sql:6-11`.
    """
    keys = _key_list(key)
    tgt = target.select(
        *[F.col(k).alias(f"__t_{k}") for k in keys],
        F.col(recency_col).alias("__t_recency"),
    )
    cond = None
    for k in keys:
        c = source[k] == tgt[f"__t_{k}"]
        cond = c if cond is None else (cond & c)
    joined = source.join(tgt, cond, "left")
    keep = F.col(f"__t_{keys[0]}").isNull() | (
        F.col(recency_col) > F.col("__t_recency")
    )
    return joined.filter(keep).drop(*[f"__t_{k}" for k in keys], "__t_recency")


def merge_scd1(
    target: DataFrame,
    source: DataFrame,
    key: str | Sequence[str],
    recency_col: str,
) -> DataFrame:
    """J4 — SCD Type 1 merge, returned as a DataFrame:

    MERGE INTO target USING source ON key
      WHEN MATCHED AND source newer THEN UPDATE all columns
      WHEN NOT MATCHED THEN INSERT
    (`Salesforce/Task/SP_litify_task.sql:14-77`)

    Algebra: dedupe source to latest-per-key, keep only new-or-newer rows
    (P6) — those are the inserted/updated output rows — and keep every
    target row whose key is NOT superseded.

    Column-pruned change detection (r14, guide §2/§5): the kept side used
    to anti-join the target against the *winners* frame, which re-evaluated
    the whole latest-per-key window subtree (at Matter width: 250-column
    rows through a second shuffle + sort) just to produce a key set. The
    superseded-key set only depends on per-key recency extrema, so it is
    now computed from two column-pruned aggregations —

        superseded = {k : max(source.recency) > min(target.recency)}

    — and the target anti-joins that narrow frame (broadcast when small).
    Equivalence with the anti-join-of-winners form, for ALL inputs:
    a target row was dropped iff its key appeared in winners with a
    matching target row, i.e. iff ∃ tgt row t with that key such that
    src_winner.recency > t.recency (strict, `Salesforce/Task/
    SP_litify_task.sql:9-11`). The window winner's recency IS the per-key
    max (desc_nulls_last ⇒ nulls never win ⇒ max() over non-nulls, null
    iff all null), and "∃t: s > t.recency" ⟺ "s > min over non-null
    target recencies" (NULL compares unknown on both sides, min() skips
    nulls on both sides). Keys absent from either side never join, hence
    never supersede — matching the anti-join, where they never matched.
    Shuffle shape: the wide window runs ONCE (winners branch); the kept
    branch moves only (key, recency) bytes through its aggregations.

    Width gate (measured, sf0.1 interleaved A/B): at Matter width the
    pruned detection wins (wide window subtrees 2 → 1; min 3.65 s →
    2.94 s); at trivial width (6 cols) the two extra aggregation
    subtrees cost MORE than re-running the cheap narrow window
    (0.58 s → 0.78 s), so narrow frames keep the classic
    anti-join-of-winners. Both branches are result-identical for all
    inputs (equivalence above), so the gate is a pure planner choice
    on statically-known schema width.
    """
    keys = _key_list(key)
    tiebreakers = [
        c for c in target.columns if c not in keys and c != recency_col
    ]
    src = latest_per_key(
        source.select(*target.columns), keys, recency_col, tiebreakers
    )
    winners = changed_or_new(src, target, keys, recency_col)
    if len(target.columns) <= 24:
        kept = target.join(winners.select(*keys), keys, "left_anti")
        return kept.unionByName(winners)
    src_max = source.groupBy(*keys).agg(
        F.max(recency_col).alias("__src_max")
    )
    tgt_min = target.groupBy(*keys).agg(
        F.min(recency_col).alias("__tgt_min")
    )
    superseded = (
        src_max.join(tgt_min, keys)
        .filter(F.col("__src_max") > F.col("__tgt_min"))
        .select(*keys)
    )
    kept = target.join(superseded, keys, "left_anti")
    return kept.unionByName(winners)


def append_new(
    target: DataFrame, source: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """J2/P7 — insert-only dedupe: append source rows whose key is absent
    from target (`…CTR with boto3/SP_boto3_connect_redshift.sql:15-26`).
    Duplicate keys *within* the source batch are collapsed
    (arbitrary-but-deterministic first by full row order) — the reference
    relies on its DynamoDB/stream dedup for this.
    """
    keys = _key_list(key)
    other = [c for c in source.columns if c not in keys]
    dedup_src = latest_per_key(source, keys, other[0]) if other else source.distinct()
    new_rows = dedup_src.join(target.select(*keys), keys, "left_anti")
    return target.unionByName(new_rows.select(*target.columns))


def upsert_if_changed(
    target: DataFrame,
    source: DataFrame,
    key: str | Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """J5 — composite-key upsert with update-only-if-changed semantics
    (`Google Sheets/Goals/lambda_legal_goals_upsert.py:48-77`: INSERT
    WHERE NOT EXISTS(email, week) + UPDATE WHERE goal != new_goal).

    Equivalent set algebra: rows from source win whenever the key is new
    OR any compare column differs; otherwise the target row stands
    (identical outcome either way — "unchanged" rows are identical).
    """
    keys = _key_list(key)
    src = source.select(*target.columns).dropDuplicates(keys)
    # anti-join semantics are duplicate-blind: probe the RAW key
    # projection (column-pruned scan, no aggregate subtree) instead of
    # re-evaluating the deduped frame a second time just for its keys
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(src)


def delta_available(spark) -> bool:
    """True when the Delta Lake runtime is usable in this session —
    the `delta-spark` Python package AND its jars on the Spark
    classpath. Gate, don't assume: this sandbox ships neither, and a
    cluster may ship one without the other."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        getattr(spark._jvm.io.delta.tables, "DeltaTable")
        return True
    except Exception:
        return False


def merge_scd1_write(
    spark_target_path: str,
    target: DataFrame,
    source: DataFrame,
    key: str | Sequence[str],
    recency_col: str,
    table_format: str = "parquet",
) -> None:
    """Materializing SCD1 merge behind a table-format switch.

    ``table_format="parquet"`` (default, zero-dependency): write the
    merged table via temp path + atomic rename. The concurrent-reader
    contract is fail-fast, not wait-free: a reader that resolved its
    file list before the swap either sees a complete pre-merge table
    or errors on vanished files — never a torn mix — and must retry
    (tested: test_merge_scd1_write_concurrent_reader_contract).

    ``table_format="delta"`` (requires the delta-spark runtime,
    `delta_available`): a true transactional MERGE INTO — dedupe the
    source to latest-per-key exactly as `merge_scd1` does, then
    ``whenMatched(source newer) UPDATE ALL / whenNotMatched INSERT
    ALL`` through the Delta log. Readers hold a snapshot via the
    transaction log, so a reader active ACROSS the merge succeeds
    without retry, and the merge rewrites only the files holding
    matched keys instead of the whole table (the at-scale win; the
    reference analog is Redshift's transactional MERGE,
    `Salesforce/Task/SP_litify_task.sql:14`). If the path is not yet a
    Delta table it is seeded from ``target`` first, so the call is a
    drop-in replacement for the parquet form. Row-level semantics are
    identical to `merge_scd1` by construction (same latest-per-key
    dedup, same strict newer-than condition), so the merge property
    suite applies to both backends (run against delta when the runtime
    is present — tests/test_merge.py skips it otherwise).
    """
    import os
    import shutil

    if table_format == "delta":
        spark = target.sparkSession
        if not delta_available(spark):
            raise RuntimeError(
                "table_format='delta' requires the delta-spark package "
                "and its jars on the Spark classpath (configure "
                "spark.sql.extensions and spark.sql.catalog.spark_catalog "
                "per the Delta docs); falling back silently would drop "
                "the transactional contract, so this fails loudly instead."
            )
        from delta.tables import DeltaTable

        keys = _key_list(key)
        tiebreakers = [
            c for c in target.columns if c not in keys and c != recency_col
        ]
        src = latest_per_key(
            source.select(*target.columns), keys, recency_col, tiebreakers
        )
        if not DeltaTable.isDeltaTable(spark, spark_target_path):
            target.write.format("delta").mode("errorifexists").save(
                spark_target_path
            )
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        (
            DeltaTable.forPath(spark, spark_target_path)
            .alias("t")
            .merge(src.alias("s"), on)
            .whenMatchedUpdateAll(
                condition=f"s.`{recency_col}` > t.`{recency_col}`"
            )
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    if table_format != "parquet":
        raise ValueError(
            f"unknown table_format {table_format!r}; expected 'parquet' "
            "or 'delta'"
        )

    merged = merge_scd1(target, source, key, recency_col)
    tmp = spark_target_path.rstrip("/") + ".__tmp__"
    merged.write.mode("overwrite").parquet(tmp)
    final_tmp = spark_target_path.rstrip("/") + ".__old__"
    if os.path.exists(spark_target_path):
        os.rename(spark_target_path, final_tmp)
    os.rename(tmp, spark_target_path)
    if os.path.exists(final_tmp):
        shutil.rmtree(final_tmp)


def merge_scd2(
    target: DataFrame,
    source: DataFrame,
    key: str | Sequence[str],
    recency_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD Type 2 merge — history-keeping upsert (the natural extension
    of the reference's Type 1 overwrite, `Salesforce/Task/
    SP_litify_task.sql:14-77`, for when the warehouse must answer
    "what did this row look like on date X").

    Contract: ``target`` rows carry ``valid_from``/``valid_to``
    (NULL = current version); ``source`` rows carry the attributes plus
    ``recency_col`` (the event time that becomes the new version's
    ``valid_from``). Per key, a source row that is newer than the
    current version AND differs on any attribute (null-safely) closes
    the current version at the source time and opens a new one;
    unchanged or stale sources are no-ops; unseen keys insert.

    Scale shape: source is deduped to latest-per-key first, the current
    slice full-outer-joins it (ONE shuffle on the key — history rows
    never move), and each joined row emits its 0–2 outputs through one
    array+explode pass — no self-join, no multi-branch recompute of the
    join, nothing to persist.
    """
    keys = _key_list(key)
    attrs = [c for c in source.columns if c not in (*keys, recency_col)]
    out_cols = [*keys, *attrs, valid_from, valid_to]

    src = latest_per_key(source, keys, recency_col).select(
        *keys, *attrs, F.col(recency_col).alias("__src_ts")
    )
    cur = target.filter(F.col(valid_to).isNull()).alias("t")
    hist = target.filter(F.col(valid_to).isNotNull()).select(*out_cols)

    j = cur.join(src.alias("s"), keys, "full_outer")
    t_present = F.col(f"t.{valid_from}").isNotNull()
    s_present = F.col("s.__src_ts").isNotNull()
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(f"t.{a}").eqNullSafe(F.col(f"s.{a}"))
    is_update = (
        t_present
        & s_present
        & (F.col("s.__src_ts") > F.col(f"t.{valid_from}"))
        & changed
    )

    def row(from_side: str, vf, vt) -> F.Column:
        return F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(f"{from_side}.{a}").alias(a) for a in attrs],
            vf.alias(valid_from),
            vt.alias(valid_to),
        )

    null_ts = F.lit(None).cast("timestamp")
    closed = F.when(
        is_update, row("t", F.col(f"t.{valid_from}"), F.col("s.__src_ts"))
    )
    kept = F.when(
        t_present & ~is_update, row("t", F.col(f"t.{valid_from}"), null_ts)
    )
    opened = F.when(
        s_present & (~t_present | is_update),
        row("s", F.col("s.__src_ts"), null_ts),
    )
    emitted = j.select(
        F.explode(
            F.filter(
                F.array(closed, kept, opened), lambda x: x.isNotNull()
            )
        ).alias("__r")
    ).select("__r.*")
    return emitted.unionByName(hist)


def scd2_snapshot(
    df: DataFrame,
    as_of,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Temporal point-in-time read over an SCD2 table (``AS OF T``):
    the row version whose validity interval covers T — the query-side
    payoff of keeping history with merge_scd2. A pure filter, so it
    pushes down to the scan; lay the table out partitioned/sorted by
    ``valid_from`` and the scan prunes to the relevant slices."""
    t = F.lit(as_of).cast("timestamp")
    return df.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > t))
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key: str | Sequence[str],
    recency_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC feed with inserts, updates AND deletes — the merge
    shape SCD1 can't express (its source rows only ever win or lose,
    never remove). ``changes`` carries the target's columns plus an
    ``op`` column in {'I','U','D'}; conflicts within the feed resolve
    latest-per-key by ``recency_col``, with op (descending, so 'U' >
    'I' > 'D') pinning the otherwise-undefined same-instant tie — real
    feeds carry a unique LSN as the recency column, making the
    tiebreak moot; here it just keeps the operator deterministic.

    result = target rows whose key never appears in the feed
           ∪ latest feed row per key, when its op is not D

    One window shuffle over the (small) feed + one anti-join against
    the target — the target table itself is never window-sorted. On
    Delta/Iceberg this compiles to MERGE ... WHEN MATCHED AND op='D'
    THEN DELETE; here it stays a pure DataFrame expression.
    """
    keys = _key_list(key)
    latest = latest_per_key(
        changes, keys, recency_col, tiebreakers=(op_col,)
    )
    survivors = latest.filter(F.col(op_col) != "D").drop(op_col)
    # the anti-join needs only "key appears in the feed" — a distinct
    # key set (map-side partial agg), NOT the windowed winner: any fed
    # key leaves the target either way, and skipping the second window
    # subtree halves the feed's sort work in the plan
    kept = target.join(
        changes.select(*keys).distinct(), keys, "left_anti"
    )
    return kept.unionByName(survivors.select(*target.columns))


def scd2_from_cdc(
    changes: DataFrame,
    key: str,
    ts_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Rebuild a full SCD2 history from a complete CDC feed (I/U/D) —
    the lineage-reconstruction op a warehouse runs when onboarding a
    table whose change log it has but whose history it never kept.

    Every I/U change opens a version at its timestamp; ANY later change
    on the key (including the delete) closes it — so ``valid_to`` is
    one `lead` over the per-key change sequence, deletes contribute
    only their closing timestamp, and ``is_current`` marks versions
    nothing ever closed. One key shuffle for the window; timestamps
    must be unique per key (CDC sequence numbers — append them to the
    ordering if the feed has same-instant changes).

    Returns the I/U rows + (valid_from, valid_to, is_current)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col)
    closed = changes.withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )
    return (
        closed.filter(F.col(op_col) != "D")
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(op_col)
    )

