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
