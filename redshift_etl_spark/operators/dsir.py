"""DSIR-style data selection via importance resampling.

Selects pretraining documents from a large raw pool so the selected
set's token distribution matches a small high-quality TARGET corpus —
the published Data Selection via Importance Resampling recipe (Xie et
al., NeurIPS 2023): featurize documents as hashed n-gram bucket
counts, fit smoothed bag-of-words models for target and raw, score
each pool document by its log importance weight
``log p_target(doc) − log p_raw(doc)``, and draw the selection by
Gumbel-top-k over the log-weights.

Everything is engine-portable (the DuckDB oracle reproduces the exact
selection, not just its shape):

- token → bucket is the md5 instr/substr spelling shared with
  `operators.sampling.hash_bucket` (no engine-internal hash);
- the per-bucket log-ratio is the ONLY libm call:
  ``ln((n_t+1)·(N_r+B) / ((n_r+1)·(N_t+B)))`` on exact int64
  products, rounded to integer MICRO-units — at most B distinct
  values per corpus, so a half-ulp libm divergence landing exactly on
  a rounding midpoint is vanishingly unlikely (verified empirically at
  three scale factors, the repo's libm policy);
- a document's log-weight is then an EXACT bigint:
  Σ over its tokens of delta_micro[bucket] — associative integer
  addition, partitioning-proof;
- the Gumbel noise is a PRECOMPUTED 256-entry integer quantile table
  (`gumbel_micro_table`, computed once in Python, embedded as
  literals in both engines) indexed by a salted md5 bucket of the
  doc key — real Gumbel-top-k semantics at 1/256 resolution with
  ZERO runtime libm in the noise path.

Scale posture (the 100 TB question): the bucket-count model is one
map-side-combined aggregate collapsing the whole corpus to B rows;
the delta table (B rows) rides a broadcast join onto the token
stream; scoring is ONE corpus-wide hash aggregate keyed by doc id
(partial aggregation: each map task emits ≤ one row per local doc);
the final draw is TakeOrderedAndProject — never a global sort. No
driver collect anywhere; the model stays a DataFrame.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _HEX

N_BUCKETS = 64          # hashed-unigram feature buckets (B)
SCALE = 10**6           # micro-unit fixed point for the log-ratio
GUMBEL_RES = 256        # Gumbel quantile-table resolution


def token_bucket(tok: Column | str, n_buckets: int = N_BUCKETS) -> Column:
    """Uniform feature bucket 0..n_buckets−1 from md5(token) — the
    first two hex nibbles (instr/substr spelling, engine-portable)
    reduced mod n_buckets."""
    from .sampling import _hex_prefix_long

    c = F.col(tok) if isinstance(tok, str) else tok
    h = F.md5(c.cast("string"))
    return (_hex_prefix_long(h, 2) % n_buckets).cast("long")


def token_bucket_sql(tok_sql: str, n_buckets: int = N_BUCKETS) -> str:
    """DuckDB twin of `token_bucket` (shared spelling)."""
    h = f"md5(CAST({tok_sql} AS VARCHAR))"
    nib = lambda p: f"(instr('{_HEX}', substr({h}, {p}, 1)) - 1)"  # noqa: E731
    return f"(({nib(1)} * 16 + {nib(2)}) % {n_buckets})"


def gumbel_micro_table(resolution: int = GUMBEL_RES) -> list[int]:
    """Standard-Gumbel quantiles at the midpoints (b+0.5)/resolution,
    in micro-units: g[b] = round(−ln(−ln(u))·1e6). Computed once in
    Python and embedded as LITERALS in both engines, so the noise is
    exactly portable — no runtime libm in the draw."""
    return [
        round(-math.log(-math.log((b + 0.5) / resolution)) * SCALE)
        for b in range(resolution)
    ]


def _delta_table(tok: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, delta_micro): smoothed per-bucket log importance ratio
    in micro-units. `tok` must have columns (b, is_target). Collapses
    the corpus to n_buckets rows in one map-side-combined aggregate;
    the int64 products are exact (token counts × token counts stays
    well under 2^63 at any committed SF)."""
    bc = tok.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("long")
        .alias("n_t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1))
        .cast("long")
        .alias("n_r"),
    )
    tot = bc.agg(
        F.sum("n_t").cast("long").alias("nt_tot"),
        F.sum("n_r").cast("long").alias("nr_tot"),
    )
    B = F.lit(n_buckets)
    num = (F.col("n_t") + 1) * (F.col("nr_tot") + B)
    den = (F.col("n_r") + 1) * (F.col("nt_tot") + B)
    return (
        bc.crossJoin(F.broadcast(tot))
        .withColumn(
            "delta_micro",
            F.round(F.log(num / den) * SCALE, 0).cast("long"),
        )
        .select("b", "delta_micro")
    )


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-POOL-document importance score: (id, n_tokens, score_micro)
    where score_micro = Σ_tokens delta_micro[bucket(token)] — the
    smoothed log-weight log(p_target/p_raw) in exact integer
    micro-units. Target rows (is_target) train the target model and
    are excluded from scoring; pool rows train the raw model.

    Scale posture (same as ngramlm.bucketed_stream): the tokenize
    explode is the dominant linear CPU and feeds TWO consumers (the
    delta model and the scoring agg), so the bucketed token frame is
    persisted with the token string dropped, and an under-split
    compact input (one small file ≈ one task) is spread to core width
    first — a no-op on a many-split lake."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    tok = (
        df.select(
            F.col(id_col),
            is_target.alias("is_target"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .withColumn("b", token_bucket("w", n_buckets))
        .select(id_col, "is_target", "b")
        .persist()
    )
    delta = _delta_table(tok, n_buckets)
    return (
        tok.filter(~F.col("is_target"))
        .join(F.broadcast(delta), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("delta_micro").cast("long").alias("score_micro"),
        )
    )


def gumbel_key(key: Column | str, salt: str = "dsir") -> Column:
    """Gumbel noise in micro-units from the precomputed quantile
    table, indexed by a salted md5 bucket of the key (4 hex nibbles
    mod GUMBEL_RES — the `hash_bucket16` spelling). Deterministic in
    the key: reruns, engines, and partitionings draw the same noise."""
    from .sampling import _hex_prefix_long

    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string")))
    idx = _hex_prefix_long(h, 4) % GUMBEL_RES
    table = F.array(*[F.lit(g) for g in gumbel_micro_table()])
    return F.element_at(table, (idx + 1).cast("int")).cast("long")


def gumbel_key_sql(key_sql: str, salt: str = "dsir") -> str:
    """DuckDB twin of `gumbel_key` — same salted bucket spelling, same
    literal table."""
    h = f"md5('{salt}' || ':' || CAST({key_sql} AS VARCHAR))"
    nib = lambda p: f"(instr('{_HEX}', substr({h}, {p}, 1)) - 1)"  # noqa: E731
    idx = f"((({nib(1)} * 16 + {nib(2)}) * 16 + {nib(3)}) * 16 + {nib(4)}) % {GUMBEL_RES}"
    table = "[" + ", ".join(str(g) for g in gumbel_micro_table()) + "]"
    return f"({table})[({idx}) + 1]"


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    k: int,
    n_buckets: int = N_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k DSIR selection: k pool documents drawn with
    probability ∝ importance weight (log-weight + Gumbel noise, take
    the k largest — the standard reparameterization). Returns
    (id, n_tokens, score_micro, gkey_micro) for the selected docs.
    The LIMIT is a TakeOrderedAndProject: per-partition top-k then a
    driver merge of k-row heaps — never a global sort."""
    scored = dsir_scores(df, id_col, text_col, is_target, n_buckets)
    return (
        scored.withColumn(
            "gkey_micro", F.col("score_micro") + gumbel_key(id_col, salt)
        )
        .orderBy(F.col("gkey_micro").desc(), F.col(id_col))
        .limit(k)
    )
