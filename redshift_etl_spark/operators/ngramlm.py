"""Hashed bigram language-model perplexity scoring (CCNet recipe).

CCNet (Wenzek et al., LREC 2020) filters a web crawl by the
perplexity of a small n-gram LM trained on a trusted corpus
(Wikipedia): low-perplexity documents form the "head" of the
distribution and feed pretraining. This module reproduces that
recipe Spark-first with a HASHED bigram model so the LM stays a
bounded, broadcastable table at any corpus size:

- tokens hash into ``C`` context buckets and ``W`` word buckets via
  the md5 instr/substr spelling shared with `operators.dsir`
  (engine-portable, no Spark-internal hash);
- the model is the dense ``C x W`` grid of add-one-smoothed bigram
  negative log-probs ``-ln((c(bc,bw)+1) / (c(bc)+W))`` — at most
  4096 rows at the defaults, built by ONE map-side-combined
  aggregate over the reference corpus and broadcast to the scorer;
- the ONLY libm call is that per-cell log, micro-rounded to int64
  (<= C*W distinct values; the repo's libm policy — a half-ulp
  divergence landing exactly on a rounding midpoint is vanishingly
  unlikely, verified empirically across scale factors);
- a document's total NLL is then an EXACT bigint sum of table
  cells — associative, partitioning-proof; the per-token NLL shown
  for presentation is one IEEE bigint/bigint double division,
  identical in any engine.

Bigram formation is ZERO-shuffle: consecutive pairs come from an
array ``transform`` over the split token array (no per-document
window, no lag shuffle) — each input row expands in place.

Scale posture (the 100 TB question): reference-model agg collapses
the trusted corpus to <= C*W rows (map-side partial agg); the dense
NLL grid rides a broadcast join onto the pool's bigram stream;
scoring is ONE corpus-wide hash aggregate keyed by doc id; the
selection head is TakeOrderedAndProject (per-partition top-k heaps,
never a global sort). No driver collect; the model stays a
DataFrame end to end.

Reference analog: the reference pipelines gate rows with static
quality predicates (e.g. `Salesforce/Task/SP_litify_task.sql`
WHERE clauses); an LM-perplexity gate is the distribution-aware
upgrade a pretraining pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dsir import token_bucket, token_bucket_sql

CTX_BUCKETS = 64        # context-token hash buckets (C)
WORD_BUCKETS = 64       # next-token hash buckets (W)
SCALE = 10**6           # micro-unit fixed point for the NLL table


def bigram_stream(
    df: DataFrame, id_col: str, text_col: str, extra: list[str] | None = None
) -> DataFrame:
    """(id, [extra...], w1, w2) — consecutive whitespace-token pairs
    per document, formed with an array transform (zero shuffle, no
    per-doc window). Documents with < 2 tokens emit nothing."""
    keep = [F.col(id_col)] + [F.col(c) for c in (extra or [])]
    sp = F.split(F.col(text_col), " ")
    pairs = F.transform(
        F.slice(sp, 1, F.greatest(F.size(sp) - 1, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("w1"), F.element_at(sp, i + F.lit(2)).alias("w2")
        ),
    )
    return df.select(*keep, F.explode(pairs).alias("p")).select(
        *[c.alias(a) for c, a in zip(keep, [id_col] + list(extra or []))],
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )


def _bucketed(bg: DataFrame, ctx_buckets: int, word_buckets: int) -> DataFrame:
    return bg.withColumn("bc", token_bucket("w1", ctx_buckets)).withColumn(
        "bw", token_bucket("w2", word_buckets)
    )


def bucketed_stream(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_ref: Column,
    extra: list[str] | None = None,
    ctx_buckets: int = CTX_BUCKETS,
    word_buckets: int = WORD_BUCKETS,
) -> DataFrame:
    """(id, [extra...], __ref, bc, bw) — the tokenize-explode bigram
    stream bucketed and PERSISTED with the token strings dropped.

    Every LM consumer needs the stream twice (once to train the model
    on ``is_ref`` rows, once to score the pool); without pinning, both
    subtrees re-run the full explode — the dominant linear CPU of the
    whole family (measured 2x on the 10x scale rehearsal). Bucketing
    BEFORE the persist shrinks the pinned frame to the id plus two
    ints per bigram.

    The explode does ~100x work per input byte, so a compact text
    corpus the scan under-splits (one small compressed file ≈ one
    task) would serialize it: if the input has fewer partitions than
    cores, spread it first. At lake scale the input already has
    thousands of splits and this is a no-op — never an unconditional
    shuffle of raw text."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    bg = bigram_stream(
        df.withColumn("__ref", is_ref), id_col, text_col,
        extra=(extra or []) + ["__ref"],
    )
    return (
        _bucketed(bg, ctx_buckets, word_buckets)
        .select(id_col, *(extra or []), "__ref", "bc", "bw")
        .persist()
    )


def nll_table_bucketed(
    ref_bucketed: DataFrame,
    ctx_buckets: int = CTX_BUCKETS,
    word_buckets: int = WORD_BUCKETS,
) -> DataFrame:
    """`nll_table` for a frame that already carries (bc, bw) — the
    shared-stream path (`bucketed_stream`). Same grid, same cells."""
    counts = ref_bucketed.groupBy("bc", "bw").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ctx = counts.groupBy("bc").agg(F.sum("c").cast("long").alias("ctx_n"))
    spark = ref_bucketed.sparkSession
    return _nll_grid(spark, counts, ctx, ctx_buckets, word_buckets)


def nll_table(
    ref_bigrams: DataFrame,
    ctx_buckets: int = CTX_BUCKETS,
    word_buckets: int = WORD_BUCKETS,
) -> DataFrame:
    """Dense (bc, bw, nll_micro) grid — the hashed bigram LM. Cells
    never observed in the reference corpus get the smoothed floor
    ``-ln(1/(c(bc)+W))``; wholly unseen contexts degrade to the
    uniform ``-ln(1/W)``. Exactly C*W rows regardless of corpus
    size, so the scorer's join side is always broadcastable."""
    bg = _bucketed(ref_bigrams, ctx_buckets, word_buckets)
    counts = bg.groupBy("bc", "bw").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ctx = counts.groupBy("bc").agg(F.sum("c").cast("long").alias("ctx_n"))
    spark = ref_bigrams.sparkSession
    return _nll_grid(spark, counts, ctx, ctx_buckets, word_buckets)


def _nll_grid(
    spark,
    counts: DataFrame,
    ctx: DataFrame,
    ctx_buckets: int,
    word_buckets: int,
) -> DataFrame:
    grid = spark.range(ctx_buckets).select(
        F.col("id").alias("bc")
    ).crossJoin(spark.range(word_buckets).select(F.col("id").alias("bw")))
    dense = (
        grid.join(counts, ["bc", "bw"], "left")
        .join(ctx, ["bc"], "left")
        .select(
            "bc",
            "bw",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("ctx_n"), F.lit(0)).alias("ctx_n"),
        )
    )
    nll = -F.round(
        F.log((F.col("c") + 1) / (F.col("ctx_n") + F.lit(word_buckets)))
        * SCALE,
        0,
    ).cast("long")
    return dense.select("bc", "bw", nll.alias("nll_micro"))


def perplexity_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_ref: Column,
    ctx_buckets: int = CTX_BUCKETS,
    word_buckets: int = WORD_BUCKETS,
) -> DataFrame:
    """Per-POOL-document LM score: (id, n_bigrams, nll_micro) where
    nll_micro = Σ over the doc's bigrams of the model cell — the
    exact-integer total negative log-likelihood under the hashed
    bigram LM trained on the ``is_ref`` rows. Reference rows train
    the model and are excluded from scoring; pool documents with
    fewer than two tokens have no bigrams and are not scored.

    The bucketed bigram stream is formed ONCE and pinned
    (`bucketed_stream`): model training and pool scoring share it, so
    the tokenize explode — the family's dominant linear CPU — runs a
    single pass over the corpus."""
    bgb = bucketed_stream(
        df, id_col, text_col, is_ref,
        ctx_buckets=ctx_buckets, word_buckets=word_buckets,
    )
    model = nll_table_bucketed(
        bgb.filter(F.col("__ref")), ctx_buckets, word_buckets
    )
    pool = bgb.filter(~F.col("__ref"))
    return (
        pool.join(F.broadcast(model), ["bc", "bw"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("nll_micro").cast("long").alias("nll_micro"),
        )
    )


def nll_table_sql(
    ref_bigrams_cte: str,
    ctx_buckets: int = CTX_BUCKETS,
    word_buckets: int = WORD_BUCKETS,
) -> str:
    """DuckDB twin of `nll_table` over a CTE named ``ref_bigrams_cte``
    with columns (w1, w2) — same bucket spelling, same micro-rounded
    log, same dense grid."""
    bc = token_bucket_sql("w1", ctx_buckets)
    bw = token_bucket_sql("w2", word_buckets)
    return f"""
  SELECT g.bc, g.bw,
         CAST(-ROUND(ln(
           CAST(COALESCE(m.c, 0) + 1 AS DOUBLE)
           / CAST(COALESCE(x.ctx_n, 0) + {word_buckets} AS DOUBLE)
         ) * {SCALE}, 0) AS BIGINT) AS nll_micro
  FROM (SELECT a.range AS bc, b.range AS bw
        FROM range({ctx_buckets}) a CROSS JOIN range({word_buckets}) b) g
  LEFT JOIN (
    SELECT {bc} AS bc, {bw} AS bw, CAST(COUNT(*) AS BIGINT) AS c
    FROM {ref_bigrams_cte} GROUP BY 1, 2
  ) m ON g.bc = m.bc AND g.bw = m.bw
  LEFT JOIN (
    SELECT {bc} AS bc, CAST(COUNT(*) AS BIGINT) AS ctx_n
    FROM {ref_bigrams_cte} GROUP BY 1
  ) x ON g.bc = x.bc
"""
