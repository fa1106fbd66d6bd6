"""Exact distributed heavy hitters — Misra-Gries candidates + recount.

The reference's only frequency tooling is exact GROUP BY counting
(`view_agent_metrics.sql` conditional counts, SURVEY A1/A5); at 100 TB
a full-cardinality groupBy over a token/domain/key stream shuffles the
entire stream. This operator finds every item with frequency strictly
greater than n/d WITHOUT ever shuffling the stream, in two map-heavy
passes:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   ``d - 1`` counters over its local items (`mapInPandas`, Arrow
   batches pre-aggregated with ``value_counts`` so the Python loop is
   per-distinct, not per-row). MG's guarantee: an item with local
   frequency > n_p/d survives the partition's summary. Pigeonhole over
   partitions lifts it globally: if Σ f_ip > (Σ n_p)/d then some
   partition has f_ip > n_p/d, so EVERY global heavy hitter is in the
   candidate union. At most ``(d-1) × numPartitions`` candidate rows
   ever reach a shuffle.
2. **Recount pass** — broadcast the candidate set, semi-join the items
   against it (map-side filter), exact groupBy count of the survivors,
   keep ``freq * d > n``. Partial aggregation bounds the shuffle at
   ``candidates × partitions`` rows.

The output is therefore EXACT and partitioning-independent — the
candidate set varies with the data layout, but it always contains the
true heavy hitters, and the recount filter discards everything else.
That is what makes the operator oracle-checkable (a plain
GROUP BY … HAVING in DuckDB) even though the sketch pass is
approximate.

MG batch-decrement correctness: after merging a batch the summary may
hold m > d-1 counters; subtracting the d-th largest value from all and
dropping non-positives restores the bound. Each unit of decrement hits
≥ d counters-plus-discarded-mass simultaneously, so any single item
loses at most n_p/d total — the per-partition guarantee above.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mg_candidates", "heavy_hitters"]


def mg_merge(counts: dict, series, d: int) -> tuple[dict, int]:
    """Merge one pandas Series of items into a Misra-Gries summary
    bounded at d−1 counters; returns (summary, non-null items seen).
    Shared by the batch kernel and `streaming.heavy` — the
    correctness-critical decrement (subtract the d-th largest, drop the
    non-positive; each unit of decrement hits ≥ d counters at once, so
    any item loses ≤ n/d total) lives in exactly one place."""
    import heapq

    vc = series.dropna().value_counts()
    # per-distinct merge: the Python-side loop is over the batch's
    # value_counts, not its rows
    for item, c in vc.items():
        counts[item] = counts.get(item, 0) + int(c)
    if len(counts) > d - 1:
        cut = heapq.nlargest(d, counts.values())[-1]
        counts = {i: c - cut for i, c in counts.items() if c > cut}
    return counts, int(vc.sum())


def _mg_kernel(d: int):
    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            counts, _ = mg_merge(counts, pdf["item"], d)
        if counts:
            yield pd.DataFrame({"item": list(counts.keys())})

    return fn


def mg_candidates(df: DataFrame, item: Column | str, d: int) -> DataFrame:
    """Per-partition Misra-Gries candidate items (column ``item``):
    a superset of every item with global frequency > n/d, at most
    ``(d-1) × numPartitions`` rows. NULL items are ignored."""
    if d < 2:
        raise ValueError("d must be >= 2 (threshold n/d needs d >= 2)")
    c = F.col(item) if isinstance(item, str) else item
    items = df.select(c.alias("item"))
    dtype = items.schema[0].dataType.simpleString()
    return items.mapInPandas(_mg_kernel(d), f"item {dtype}").distinct()


def heavy_hitters(
    df: DataFrame,
    item: Column | str,
    d: int,
    out_item: str = "item",
    out_freq: str = "freq",
) -> DataFrame:
    """All items with exact frequency strictly greater than n/d, with
    their exact counts (n = number of non-NULL items). Two scans of
    ``df``, no full-cardinality shuffle — see module docstring."""
    c = F.col(item) if isinstance(item, str) else item
    items = df.select(c.alias("item"))
    cands = mg_candidates(df, item, d)
    total = items.agg(F.count("item").alias("__n"))
    return (
        items.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias(out_freq))
        .crossJoin(F.broadcast(total))
        .filter(F.col(out_freq) * d > F.col("__n"))
        .select(F.col("item").alias(out_item), out_freq)
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    rate_per_65536: int = 4096,
    salt: str = "jse",
) -> DataFrame:
    """Equi-join cardinality estimation from a hash-sampled key
    synopsis — the planner question at 100 TB: "how big would A ⋈ B
    be?" answered WITHOUT running the join. |A ⋈_k B| = Σ_v
    cntA(v)·cntB(v); hash-sampling the KEY SPACE (keep v iff
    md5-bucket16(v) < rate) keeps matching keys on both sides
    together — a row-level sample would square the rate on the match —
    and the sampled sum scales by 65536/rate. Deterministic (md5, no
    RNG): the same synopsis every run, on any engine.

    Scale shape: the sample predicate is a map-side projection, so
    only ~rate/65536 of each side's keys reach the count agg and the
    tiny synopsis join; the full tables never shuffle. The TRUE size
    is also computed (two full count aggs + a key join of the count
    frames — still never materializing the join itself) so the report
    carries its own error; at deployment scale a caller reads only
    the estimate columns and skips the truth pass.

    Bias note: hash-sampling keys is exact on the sampled stratum, so
    the estimator is unbiased over the key population; heavy-hitter
    keys landing in/out of the sample dominate the variance — the
    report's rel_error shows exactly that. Returns ONE row:
    (n_keys_sampled, est_join_rows, true_join_rows, rel_error)."""
    from .sampling import hash_bucket16

    rate = int(rate_per_65536)

    def counts(df: DataFrame, key: str, sampled: bool) -> DataFrame:
        kc = F.col(key)
        out = df.select(kc.alias("__k")).where(kc.isNotNull())
        if sampled:
            out = out.where(hash_bucket16(F.col("__k"), salt) < rate)
        return out.groupBy("__k").agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )

    sa = counts(a, a_key, True)
    sb = counts(b, b_key, True).select(
        F.col("__k"), F.col("__c").alias("__c2")
    )
    est = sa.join(sb, "__k").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys_sampled"),
        F.coalesce(F.sum(F.col("__c") * F.col("__c2")), F.lit(0))
        .cast("long")
        .alias("__s"),
    )
    fa = counts(a, a_key, False)
    fb = counts(b, b_key, False).select(
        F.col("__k"), F.col("__c").alias("__c2")
    )
    true = fa.join(fb, "__k").agg(
        F.coalesce(F.sum(F.col("__c") * F.col("__c2")), F.lit(0))
        .cast("long")
        .alias("true_join_rows")
    )
    est_rows = F.col("__s").cast("double") * (65536.0 / rate)
    rel = F.when(
        F.col("true_join_rows") > 0,
        (est_rows - F.col("true_join_rows").cast("double"))
        / F.col("true_join_rows").cast("double"),
    )
    return est.crossJoin(F.broadcast(true)).select(
        "n_keys_sampled",
        est_rows.alias("est_join_rows"),
        "true_join_rows",
        rel.alias("rel_error"),
    )


def distinct_count_estimate(
    df: DataFrame,
    key: str,
    rate_per_65536: int = 4096,
    salt: str = "dce",
) -> DataFrame:
    """NDV (number-of-distinct-values) estimation from the same
    hash-sampled key synopsis as :func:`join_size_estimate` — the
    second planner primitive: "how many groups would GROUP BY k
    produce?" decides agg strategy (hash-agg memory, pre-partition
    width) at 100 TB before paying for the agg. Hash-sampling the KEY
    SPACE makes this exact on the sampled stratum: each distinct value
    v survives iff md5-bucket16(v) < rate — a Bernoulli(rate/65536)
    trial ON THE VALUE, independent of its row frequency — so
    E[d_sampled] = d·rate/65536 and d̂ = d_sampled·65536/rate is
    unbiased with variance d·(65536/rate − 1). (A ROW-level sample
    cannot do this: rare values vanish from it and every classical
    row-sample NDV estimator (GEE, Chao) is provably biased on skewed
    frequency distributions — hashing the value space sidesteps the
    frequency distribution entirely.) Deterministic (md5, no RNG).

    Scale shape: the sample predicate is a map-side projection; only
    ~rate/65536 of the distinct keys reach the count-distinct agg. The
    TRUE NDV rides along (one full distinct agg — still cheaper than
    the group-by being planned, and skippable at deployment) so the
    report grades its own error. Returns ONE row:
    (n_keys_sampled, est_distinct, true_distinct, rel_error)."""
    from .sampling import hash_bucket16

    rate = int(rate_per_65536)
    kc = F.col(key)
    keys = df.select(kc.alias("__k")).where(kc.isNotNull())
    est = keys.where(hash_bucket16(F.col("__k"), salt) < rate).agg(
        F.count_distinct(F.col("__k")).cast("long").alias("n_keys_sampled")
    )
    true = keys.agg(
        F.count_distinct(F.col("__k")).cast("long").alias("true_distinct")
    )
    est_d = F.col("n_keys_sampled").cast("double") * (65536.0 / rate)
    rel = F.when(
        F.col("true_distinct") > 0,
        (est_d - F.col("true_distinct").cast("double"))
        / F.col("true_distinct").cast("double"),
    )
    return est.crossJoin(F.broadcast(true)).select(
        "n_keys_sampled",
        est_d.alias("est_distinct"),
        "true_distinct",
        rel.alias("rel_error"),
    )


def selectivity_estimate(
    df: DataFrame,
    pred_a: Column,
    pred_b: Column,
    id_col: str,
    rate_per_65536: int = 4096,
    salt: str = "sel",
) -> DataFrame:
    """Conjunctive-predicate selectivity estimation from a
    deterministic md5 ROW sample — planner primitive #3 beside
    :func:`join_size_estimate` / :func:`distinct_count_estimate`:
    "how many rows pass A AND B?" decides filter ordering and join
    laterality before the scan runs. Row sampling is CORRECT here
    (unlike NDV/join-size, where the key space must be sampled):
    selectivity is a per-row Bernoulli property, so a uniform row
    sample gives an unbiased estimate of every predicate combination
    at once — one synopsis serves A, B, and A∧B.

    The report also grades the INDEPENDENCE assumption every classical
    optimizer makes (sel(A∧B) = sel(A)·sel(B)): ``indep_est_rows`` is
    the estimate independence would produce from the same sample, and
    ``correlation_factor`` = p̂(A∧B) / (p̂(A)·p̂(B)) says how wrong it
    is (1 = independent; >1 correlated — the planner should not
    multiply). Sampling is md5 on ``id_col`` (deterministic, engine-
    portable; NULL ids excluded — they cannot be sampled stably).

    Scale shape: the sample predicate is a map-side projection; one
    agg over ~rate/65536 of the rows produces all three counts. The
    TRUE joint count rides along (one full agg — the thing being
    avoided at deployment, kept here so the report grades its own
    error). Returns ONE row: (n_sample, est_rows, true_rows,
    rel_error, indep_est_rows, correlation_factor)."""
    from .sampling import hash_bucket16

    rate = int(rate_per_65536)
    scale_up = 65536.0 / rate
    base = df.where(F.col(id_col).isNotNull()).select(
        pred_a.cast("boolean").alias("__a"),
        pred_b.cast("boolean").alias("__b"),
        hash_bucket16(F.col(id_col), salt).alias("__h"),
    )
    samp = base.where(F.col("__h") < rate).agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.coalesce(
            F.sum((F.coalesce(F.col("__a"), F.lit(False))
                   & F.coalesce(F.col("__b"), F.lit(False))).cast("long")),
            F.lit(0),
        ).cast("long").alias("__nab"),
        F.coalesce(
            F.sum(F.coalesce(F.col("__a"), F.lit(False)).cast("long")),
            F.lit(0),
        ).cast("long").alias("__na"),
        F.coalesce(
            F.sum(F.coalesce(F.col("__b"), F.lit(False)).cast("long")),
            F.lit(0),
        ).cast("long").alias("__nb"),
    )
    true = base.agg(
        F.coalesce(
            F.sum((F.coalesce(F.col("__a"), F.lit(False))
                   & F.coalesce(F.col("__b"), F.lit(False))).cast("long")),
            F.lit(0),
        ).cast("long").alias("true_rows")
    )
    ns = F.col("n_sample").cast("double")
    est = F.col("__nab").cast("double") * scale_up
    # independence estimate from the SAME sample: n·p̂(A)·p̂(B), with
    # n = n_sample·scale_up — algebraically (na·nb/n_sample)·scale_up
    indep = F.when(
        F.col("n_sample") > 0,
        F.col("__na").cast("double") * F.col("__nb").cast("double")
        / ns * scale_up,
    )
    corr = F.when(
        (F.col("__na") > 0) & (F.col("__nb") > 0),
        F.col("__nab").cast("double") * ns
        / (F.col("__na").cast("double") * F.col("__nb").cast("double")),
    )
    rel = F.when(
        F.col("true_rows") > 0,
        (est - F.col("true_rows").cast("double"))
        / F.col("true_rows").cast("double"),
    )
    return samp.crossJoin(F.broadcast(true)).select(
        "n_sample",
        est.alias("est_rows"),
        "true_rows",
        rel.alias("rel_error"),
        indep.alias("indep_est_rows"),
        corr.alias("correlation_factor"),
    )


def distinct_set_estimate(
    a: DataFrame,
    b: DataFrame,
    a_key: str,
    b_key: str,
    rate_per_65536: int = 4096,
    salt: str = "dce",
) -> DataFrame:
    """Set-operation NDV estimation — |A ∪ B|, |A ∩ B| and the Jaccard
    of two key columns from the SAME md5 key-space synopsis as
    :func:`distinct_count_estimate` (planner primitive #2b, and the
    classical theta-sketch identity with a fixed threshold): because
    both sides sample the IDENTICAL hash space with the IDENTICAL
    threshold, the union of the samples IS the sample of the union and
    the intersection of the samples IS the sample of the intersection
    — each distinct value of A∪B (resp. A∩B) survives independently
    with p = rate/65536, so scaling by 65536/rate is unbiased for
    every set operation at once. (A row sample cannot do ANY of this:
    the same value sampled on side A and dropped on side B destroys
    the intersection.) Answers the "how many keys do these two fact
    tables share?" question a planner asks before choosing a join
    strategy, and the data-quality question behind referential drift.

    Scale shape: one map-side predicate per side, distinct on
    ~rate/65536 of the keys, one tiny distinct-union agg. The TRUE
    counts ride along (two distincts + one union distinct) so the
    report grades its own error. Returns ONE row:
    (n_a_sampled, n_b_sampled, est_distinct_a, est_distinct_b,
    est_union, est_intersection, est_jaccard, true_union,
    true_intersection, rel_error_union)."""
    from .sampling import hash_bucket16

    rate = int(rate_per_65536)
    up = 65536.0 / rate

    def keys(df: DataFrame, key: str) -> DataFrame:
        kc = F.col(key)
        return (
            df.select(kc.cast("string").alias("__k"))
            .where(kc.isNotNull())
        )

    ka, kb = keys(a, a_key), keys(b, b_key)
    sa = ka.where(hash_bucket16(F.col("__k"), salt) < rate).distinct()
    sb = kb.where(hash_bucket16(F.col("__k"), salt) < rate).distinct()
    # sampled-set algebra: distinct union size + per-side sizes give
    # the intersection by inclusion-exclusion, all inside one plan
    counts = (
        sa.select(F.lit(1).alias("__in_a"), F.lit(0).alias("__in_b"), "__k")
        .unionByName(
            sb.select(
                F.lit(0).alias("__in_a"), F.lit(1).alias("__in_b"), "__k"
            )
        )
        .groupBy("__k")
        .agg(
            F.max("__in_a").alias("__a"),
            F.max("__in_b").alias("__b"),
        )
        .agg(
            F.coalesce(F.sum("__a"), F.lit(0)).cast("long").alias(
                "n_a_sampled"
            ),
            F.coalesce(F.sum("__b"), F.lit(0)).cast("long").alias(
                "n_b_sampled"
            ),
            F.count(F.lit(1)).cast("long").alias("__n_union"),
            F.coalesce(
                F.sum((F.col("__a") + F.col("__b") == 2).cast("long")),
                F.lit(0),
            ).cast("long").alias("__n_inter"),
        )
    )
    tru = (
        ka.distinct()
        .select("__k", F.lit(1).alias("__ta"), F.lit(0).alias("__tb"))
        .unionByName(
            kb.distinct().select(
                "__k", F.lit(0).alias("__ta"), F.lit(1).alias("__tb")
            )
        )
        .groupBy("__k")
        .agg(F.max("__ta").alias("__a"), F.max("__tb").alias("__b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("true_union"),
            F.coalesce(
                F.sum((F.col("__a") + F.col("__b") == 2).cast("long")),
                F.lit(0),
            ).cast("long").alias("true_intersection"),
        )
    )
    est_union = F.col("__n_union").cast("double") * up
    est_inter = F.col("__n_inter").cast("double") * up
    jac = F.when(
        F.col("__n_union") > 0,
        F.col("__n_inter").cast("double") / F.col("__n_union").cast("double"),
    )
    rel = F.when(
        F.col("true_union") > 0,
        (est_union - F.col("true_union").cast("double"))
        / F.col("true_union").cast("double"),
    )
    return counts.crossJoin(F.broadcast(tru)).select(
        "n_a_sampled",
        "n_b_sampled",
        (F.col("n_a_sampled").cast("double") * up).alias("est_distinct_a"),
        (F.col("n_b_sampled").cast("double") * up).alias("est_distinct_b"),
        est_union.alias("est_union"),
        est_inter.alias("est_intersection"),
        jac.alias("est_jaccard"),
        "true_union",
        "true_intersection",
        rel.alias("rel_error_union"),
    )


def histogram_selectivity(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    domain_max: float,
    n_bins: int = 64,
    scale: int = 100,
) -> DataFrame:
    """Range-predicate selectivity from an equi-width histogram —
    planner primitive #4 beside the sampled-synopsis family: "how many
    rows pass lo <= x < hi?" answered from a |bins|-row synopsis built
    in ONE map-side-combined hash agg, the statistic every classical
    optimizer (and Spark's own CBO column stats) keeps per column.
    Complements :func:`selectivity_estimate`: the row sample answers
    arbitrary predicate COMBINATIONS, the histogram answers any future
    RANGE over one column without re-scanning — at 100 TB the
    histogram is built once per column per ingest and consulted for
    free per query.

    Estimation is the textbook uniform-within-bin rule: full interior
    bins contribute their exact counts; the two edge bins contribute
    the overlapping fraction of their width. Exactness discipline:
    values are fixed to the ``scale`` integer grid (cents) BEFORE
    binning, bin counts are exact BIGINTs, the fractional-coverage
    coefficients are nano-fixed integers per bin (an integer sum, so
    partitioning-deterministic), and the estimate is ONE IEEE division
    at the end. Out-of-domain values clamp into the edge bins, which
    is where a real optimizer puts them. The TRUE count rides along
    (one full agg — the scan being avoided at deployment) so the
    report grades its own error. Returns ONE row: (n_bins, n_rows,
    est_rows, true_rows, rel_error)."""
    sc = int(scale)
    lo_i, hi_i = int(round(lo * sc)), int(round(hi * sc))
    dmax_i = int(round(domain_max * sc))
    width = max(1, dmax_i // int(n_bins))
    yi = F.round(F.col(value_col).cast("double") * sc).cast("long")
    b = F.least(
        F.greatest(F.floor(yi / width).cast("long"), F.lit(0)),
        F.lit(int(n_bins) - 1),
    )
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(b.alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    # per-bin overlap fraction of [lo_i, hi_i) with [b*w, (b+1)*w),
    # nano-fixed: frac_nano = round(overlap/width * 1e9) — integer per
    # bin, summed as integers, one final /1e9 division
    b_lo = F.col("__b") * width
    b_hi = (F.col("__b") + 1) * width
    overlap = F.greatest(
        F.least(b_hi, F.lit(hi_i)) - F.greatest(b_lo, F.lit(lo_i)),
        F.lit(0),
    )
    # interior bins (overlap == width) contribute c*1e9 as a PURE
    # integer product — no double in the path, so the count is exact
    # to int64 (c < 9.2e9/bin); only the two EDGE bins take the
    # rounded fractional product, exact while c_edge < 2^53/1e9 ≈ 9e6
    # rows per bin — raise n_bins past that
    contrib_nano = F.when(
        overlap >= width, F.col("__c") * F.lit(1_000_000_000)
    ).otherwise(
        F.round(
            F.col("__c").cast("double")
            * (overlap.cast("double") / float(width))
            * 1e9
        ).cast("long")
    )
    est = hist.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(contrib_nano), F.lit(0))
        .cast("long")
        .alias("__est_nano"),
    )
    true = df.where(
        F.col(value_col).isNotNull() & (yi >= lo_i) & (yi < hi_i)
    ).agg(F.count(F.lit(1)).cast("long").alias("true_rows"))
    est_rows = F.col("__est_nano").cast("double") / 1e9
    rel = F.when(
        F.col("true_rows") > 0,
        (est_rows - F.col("true_rows").cast("double"))
        / F.col("true_rows").cast("double"),
    )
    return est.crossJoin(F.broadcast(true)).select(
        "n_bins",
        "n_rows",
        est_rows.alias("est_rows"),
        "true_rows",
        rel.alias("rel_error"),
    )


def fd_strength(
    df: DataFrame,
    det_col: str,
    dep_col: str,
) -> DataFrame:
    """Functional-dependency strength det → dep — planner primitive
    #5: the fraction of rows consistent with "det determines dep"
    (g3-style error measure from the FD-discovery literature, e.g.
    TANE/Kivinen-Mannila):

        strength = Σ_det max_dep count(det, dep) / n_rows

    i.e. keep each determinant's modal dependent value; the complement
    is the minimum fraction of rows one would have to delete for the
    FD to hold exactly. A planner uses it the way it uses NDV: a
    near-1.0 strength means GROUP BY det ≈ GROUP BY (det, dep) (no
    extra key width needed), join keys carry the dependent for free,
    and a denormalized column is safe to prune. Also the data-quality
    referential-drift screen ("source should determine lang").

    Exactness: (det, dep) cell counts and per-det maxima are exact
    BIGINTs from two hash aggs (the second over the cell frame, which
    is NDV(det,dep)-sized — synopsis-scale, not data-scale); strength
    is ONE IEEE division. NULLs in either column are excluded (SQL
    grouping would conflate NULL dets; an FD over NULL is undefined).
    Returns ONE row: (n_rows, n_determinants, n_cells, n_kept_rows,
    fd_strength)."""
    cells = (
        df.where(F.col(det_col).isNotNull() & F.col(dep_col).isNotNull())
        .groupBy(
            F.col(det_col).alias("__det"), F.col(dep_col).alias("__dep")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    per_det = cells.groupBy("__det").agg(
        F.sum("__c").cast("long").alias("__n"),
        F.max("__c").cast("long").alias("__kept"),
        F.count(F.lit(1)).cast("long").alias("__n_dep"),
    )
    return per_det.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_determinants"),
        F.coalesce(F.sum("__n_dep"), F.lit(0))
        .cast("long")
        .alias("n_cells"),
        F.coalesce(F.sum("__kept"), F.lit(0))
        .cast("long")
        .alias("n_kept_rows"),
    ).select(
        "n_rows",
        "n_determinants",
        "n_cells",
        "n_kept_rows",
        F.when(
            F.col("n_rows") > 0,
            F.col("n_kept_rows").cast("double")
            / F.col("n_rows").cast("double"),
        ).alias("fd_strength"),
    )
