"""Distributed Bloom-filter runtime pre-filter — shuffle reduction for
selective fact⋈dim joins.

The 100 TB problem this solves: a fact⋈dim inner join where the dim
slice is too LARGE to broadcast as a hash-join build side (AQE won't
pick BHJ past ~10M rows) but the join is highly selective, so the
shuffle moves mostly rows that will be dropped. A Bloom filter packs
the dim key set into ~10 bits/key (vs 100+ bytes/key for a broadcast
hash relation — a 10⁸-key dim is ~150 MB of bits vs tens of GB of hash
table), ships it to every task, and drops non-matching fact rows
MAP-SIDE, before the shuffle. No false negatives ever (the exact join
that follows sees every true match); false positives only cost shuffle
bytes, bounded by ``fpp``.

This is the same mechanism as Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`, injected by
`InjectRuntimeFilter`), re-expressed as an explicit operator so the
build is inspectable and reusable across queries:

- BUILD is distributed: k hash positions per key JVM-side
  (``xxhash64(key, seed)`` — whole-stage codegen), partial-aggregated
  to 64-bit words via map-side-combined ``bit_or`` on ``pos >> 6``,
  so the driver collects at most ``m/64`` (word, bits) rows — bounded
  by the CONFIG (``expected_items``/``fpp`` → m), never by the data.
- PROBE is Arrow-batched: positions computed JVM-side, the packed
  word array broadcast once per executor (TorrentBroadcast), bit
  tests vectorized in numpy over whole record batches. No
  row-at-a-time Python.

Sizing (standard Bloom algebra): m = -n·ln(p)/ln(2)², k = (m/n)·ln(2).
Words are capped at ``max_bits`` (default 2²⁷ bits = 16 MiB) — past
that the filter degrades (higher observed fpp) rather than OOMs the
driver; size ``expected_items`` honestly and raise ``max_bits`` on a
real cluster where a 1 GiB broadcast is routine.

Beyond-reference scale operator (the reference ETL joins everything
eagerly in pandas/Redshift — `Salesforce/Task/lambda_litify_task.py`
has no notion of a runtime filter); public-algorithm Bloom filter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["BloomFilter", "bloom_parameters", "bloom_build", "bloom_prefilter"]

_DEFAULT_MAX_BITS = 1 << 27  # 16 MiB of bits; raise on a real cluster


@dataclass(frozen=True)
class BloomFilter:
    """Packed Bloom filter: ``words[i]`` holds bits [64i, 64i+64).

    int64 throughout (Spark ``bit_or`` returns LONG; numpy arithmetic
    shifts keep ``(w >> b) & 1`` correct even when bit 63 is set)."""

    words: np.ndarray  # shape (m_bits // 64,), dtype int64
    m_bits: int
    k: int

    def might_contain_local(self, positions: np.ndarray) -> np.ndarray:
        """Vectorized membership over an (n, k) position matrix."""
        hit = (self.words[positions >> 6] >> (positions & 63)) & 1
        return hit.all(axis=1)


def bloom_parameters(
    expected_items: int, fpp: float, max_bits: int = _DEFAULT_MAX_BITS
) -> tuple[int, int]:
    """(m_bits, k) for the target false-positive rate; m is rounded up
    to a multiple of 64 and capped at ``max_bits``."""
    if expected_items <= 0:
        return 64, 1
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    m_bits = min(max_bits, ((int(m) // 64) + 1) * 64)
    k = max(1, round(m_bits / expected_items * math.log(2)))
    return m_bits, k


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for a key — JVM-side
    (xxhash64 per seed, codegen'd), identical for build and probe."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_bits: int = _DEFAULT_MAX_BITS,
) -> BloomFilter:
    """Build a Bloom filter over ``df[key_col]`` distributedly.

    One explode + one hash agg on ``pos >> 6`` (map-side-combined
    ``bit_or``, so the shuffle carries at most m/64 rows per map task);
    the driver collect is ≤ m/64 rows — config-bounded, data-blind.
    NULL keys are skipped (an inner join can never match them).
    """
    if expected_items is None:
        expected_items = df.select(key_col).count()
    m_bits, k = bloom_parameters(expected_items, fpp, max_bits)
    pos = (
        df.select(F.col(key_col).alias("__k"))
        .where(F.col("__k").isNotNull())
        .select(F.explode(_positions(F.col("__k"), m_bits, k)).alias("__pos"))
    )
    words = (
        pos.groupBy(F.shiftright("__pos", 6).alias("__word"))
        .agg(
            # PySpark's shiftleft() only takes a literal shift — the SQL
            # expression form accepts the column
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
            ).alias("__bits")
        )
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.int64)
    for row in words:
        arr[row["__word"]] = row["__bits"]
    return BloomFilter(words=arr, m_bits=m_bits, k=k)


def bloom_prefilter(df: DataFrame, key_col: str, bf: BloomFilter) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (plus any row the
    filter says no to, never — zero false negatives by construction).

    Positions are computed JVM-side; the probe is one Arrow-batched
    pandas_udf over the (batch, k) position matrix against the
    executor-local broadcast word array. Place this BEFORE the exact
    join: it is a map-side filter (no exchange of its own)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bf.words)
    m_bits, k = bf.m_bits, bf.k

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        mat = np.stack(pos.to_numpy()).astype(np.int64, copy=False)
        w = bc.value
        hit = (w[mat >> 6] >> (mat & 63)) & 1
        return pd.Series(hit.all(axis=1))

    return df.where(
        F.col(key_col).isNotNull()
        & might_contain(_positions(F.col(key_col), m_bits, k))
    )
