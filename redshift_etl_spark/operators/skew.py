"""Skew-mitigating join — the explicit salting counterpart to the AQE
runtime skew-join the session already enables.

A hot join key (one customer with 10% of all events, one null-ish
default id) concentrates its rows in a single reducer at shuffle time;
at 100 TB that reducer runs hours after the rest finish. AQE splits
oversized partitions when it can observe them (post-shuffle), but the
split is reactive and per-stage. `salted_join` removes the hotspot
structurally: the probe side scatters each key across `salts` sub-keys,
the build side replicates each row `salts` times, and the join runs on
(key, salt) — every reducer sees at most 1/salts of any key's rows.

Cost model: build-side rows × salts extra shuffle volume. Use when the
build side is far smaller than the probe side's hot keys (the usual
fact⟕dim case that is too big to broadcast outright but whose
replication is still cheaper than a straggler).

The salt must be DETERMINISTIC (reruns and retried tasks must route a
row identically — `rand()` breaks exactly-once shuffle retry
semantics), so it is derived by hashing a second probe-side column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_from: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe ⋈ build` on ``key``, spread over ``salts``
    sub-partitions per key. Result ≡ ``probe.join(build, key, how)``
    (verified by the `salted_join` oracle query)."""
    p = probe.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salts)).cast("int")
    )
    b = build.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return p.join(b, [key, _SALT], how).drop(_SALT)


def skew_report(
    df: DataFrame,
    key: str,
    target_rows_per_task: int = 10_000_000,
    top: int = 20,
) -> DataFrame:
    """Pre-flight skew diagnostics for a planned join/agg on ``key``:
    the ``top`` heaviest keys with their row share and the salt factor
    that would spread each hot key to ≈``target_rows_per_task`` rows
    per task — the number `salted_join(salts=...)` wants. One hash agg
    + a bounded TakeOrdered; run it on a sample for a quick look, on
    the full table for the real plan decision (AQE's skew handling
    fixes sort-merge joins at runtime, but broadcast-build replication
    and stateful aggs still need the structural salt this recommends).

    Returns (key_value, n_rows, share, recommended_salts ≥ 1)."""
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("__t"))
    return (
        counts.orderBy(F.desc("n_rows"), F.asc("key_value"))
        .limit(top)
        .crossJoin(F.broadcast(tot))
        .select(
            "key_value",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__t")).alias("share"),
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("n_rows") / F.lit(float(target_rows_per_task))
                ),
            ).cast("long").alias("recommended_salts"),
        )
    )
