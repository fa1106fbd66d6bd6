"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + execute + count) after a warm-up
of the input file listing. Timings are wall-clock per query.
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINE = (
    "agent_metrics",        # flagship: star join + 20-agg group-by
    "agent_metrics_2",      # rate view
    "pricing_summary",      # TPC-H Q1 shape
    "scd1_merge",           # SCD1 merge (window + anti-join + union)
    "scd1_merge_wide",      # same merge at Matter width (250 columns)
    "dedup_minhash_lsh",    # shingle → minhash → banded LSH pairs (the
                            # scale path; exact all-pairs jaccard is the
                            # verification kernel, benched separately)
    "dedup_exact",          # content-hash groupBy dedup
    "ann_cosine_topk",      # brute-force cosine top-k
    "ann_topk_lsh",         # hyperplane-LSH ANN (the scale path)
    "ann_topk_ivf",         # IVF ANN with k-means-trained codebook
    "asof_prev_order",      # single-shuffle as-of join
    "range_join_incidents", # bucketed point-in-interval join
    "text_stats",           # full text-analysis projection
    "shipping_priority",    # multi-join + agg + top-k (TPC-H Q3 shape)
    "window_frames",        # running/moving frame aggregates, one Window op
    "dedup_embedding_cosine",  # blocked-numpy all-pairs kernel (Arrow path)
    "lsh_bucketed_cosine",  # banded LSH buckets → exact blocked rescoring
                            # (the default embedding-dedup scale path)
    "embedding_dedup_clusters",  # the full recipe: bucketed pairs →
                            # connected components → keep set
    "source_quality_report",  # per-source audit (two-level agg, reduced
                            # Expand)
    "label_centroid_quality",  # label-noise screening over embeddings
    "corpus_prep",          # clean → filter → dedup → split composite
    "decontaminate",        # n-gram overlap vs broadcast benchmark set
    "sequence_packing",     # concat-then-chunk token packing (window cumsum)
    "tfidf_top_terms",      # tf·idf characteristic terms, top-3 per doc
    "zscore_anomalies",     # per-key 3σ outliers from rounded moments
    "lm_quality",           # corpus-trained bigram-LM quality scoring
    "span_dedup",           # sub-document boilerplate span removal
    "fuzzy_pairs_lev1",     # lev-1 fuzzy join (partition-lemma equi-joins)
    "rollup_cascade",       # hypertable minute→hour→day cascade
    "heavy_hitter_tokens",  # MG candidates + recount, no full-stream shuffle
    "trade_pagerank",       # iterative join+agg, exact-integer ranks
    "value_quantile_rollup",  # mergeable fixed-bin quantile rollup
    "pq_adc_topk",          # PQ-compressed ADC search (codes only)
    "url_normalize",        # URL parse + canonicalization (pure projection)
    "bm25_search",          # BM25 ranked retrieval (filtered explode)
    "hybrid_search_rrf",    # keyword ⊕ vector RRF fusion
    "ann_topk_int8",        # compressed-domain integer-dot ANN
    "substring_dedup",      # ExactSubstr sliding-window dedup (5 stages)
    "pack_sequences",       # exact concat-and-chunk shard slicing (r7)
    "zorder_curve",         # Morton z-value layout key (r7)
    "cdc_apply",            # I/U/D change-log collapse with deletes (r7)
    "mv_incremental",       # two delta folds into the aggregate MV (r7)
    "attribution_join",     # interval attribution join, batch form (r7)
    "incremental_near_dups",  # stored-index LSH probe of an increment (r7)
    "chat_sessions",        # session-cut conversation assembly (r7)
    "dsir_select",          # DSIR importance resampling, Gumbel-top-k (r7)
    "preference_pairs",     # RLHF chosen/rejected assembly (r7)
    "ks_drift",             # exact two-sample KS statistic (r7)
    "bitext_margin_pairs",  # margin-based mutual-best mining (r7)
    "ccnet_perplexity",     # hashed bigram LM perplexity filter (r7)
    "hard_negative_mining",  # DPR margin-gated hard negatives (r7)
    "gopher_quality_rules",  # Gopher/C4 integer-exact quality screens (r7)
    "lang_marker_auc",      # exact midrank AUC, one range exchange (r7)
    "corpus_datacard",      # one-scan release summary (r7)
    "hard_negatives_bucketed",  # mining over LSH candidates — the
                            # 100 TB path for hard_negative_mining (r8)
    "bitext_margin_bucketed",  # bipartite-LSH bitext mining (r8)
    "token_budget_waterfill",  # exact integer water-filling (r8)
    "corpus_quality_trend",  # per-epoch Gopher metrics + drift (r8)
    "customer_spend_gini",  # exact Gini off one range exchange (r8)
    "nearest_click_to_error",  # nearest as-of join, one shuffle (r8)
    "ivf_pq_topk",          # IVF-PQ composite ANN (cell-keyed ADC, r8)
    "decontaminate_semantic",  # embedding-space decontamination via
                            # bipartite LSH buckets (r9)
    "semdedup",             # adaptive-k cluster-scoped embedding
                            # dedup, fixture index (r9)
    "phrase_search",        # positional adjacency retrieval (r9)
    "vocab_coverage_curve",  # top-V token coverage, vocab-sized
                            # range exchange (r9)
    "readability_scores",   # Flesch/FK pure projection (r9)
    "source_unigram_kl",    # per-source lexical KL, ln per cell (r9)
    "padding_efficiency",   # serving pad-waste A/B, two ranked
                            # cumsums (r9)
    "ann_index_probe",      # probe of the streaming-maintained IVF
                            # store — search-only over the committed
                            # fixture (r10)
    "decontaminate_spans",  # span-grain benchmark leakage: broadcast
                            # bench grams, map-only corpus probe (r10)
    "bloom_prefilter_join",  # Bloom runtime filter: map-side fact
                            # pruning before the exact join (r10)
    "krippendorff_lang",    # 3-rater reliability with missing data,
                            # exact-integer coincidences (r10)
    "purged_time_split",    # rank-cut time folds + embargo purge (r10)
    "conformal_lang_threshold",  # finite-sample conformal q-hat +
                            # held-out coverage (r10)
    "psi_value_drift",      # binned PSI drift, picounit-exact total (r10)
    "loss_mask_spans",      # SFT mask offsets, one conv window (r10)
    "fim_transform",        # FIM split, pure projection (r10)
    "nb_source_confusion",  # in-engine NB classifier fit+score (r10)
    "zipf_fit_report",      # corpus power-law OLS, decimal-exact (r10)
    "stream_drift_probe",   # PSI from the streaming histogram store (r10)
    "survival_logrank",     # censoring-correct cohort test: user agg +
                            # day-frame folds (r11)
    "cmh_purchase_dow",     # stratified A/B: user agg + 7-stratum
                            # nano-fixed folds (r11)
    "ab_value_welch",       # continuous-outcome A/B: one variant agg
                            # of exact cents moments (r11)
    "mcnemar_lang_baseline",  # paired-classifier discordant agg (r11)
    "join_size_estimate",   # key-sampled synopsis vs truth pass (r11)
    "stream_topk_probe",    # heavy hitters + bounds from the
                            # streaming summary store (r11)
    "sql_regional_revenue",  # the SQL door: literal text through
                            # run_sql, same plan as the DataFrame
                            # original (r11)
    "cuped_value_ab",       # CUPED variance-reduced A/B: user agg +
                            # one moment agg, decimal-exact theta (r12)
    "did_purchase_rate",    # difference-in-differences 4-cell fold (r12)
    "bootstrap_value_ci",   # Poisson-bootstrap CI: 40x map-side md5
                            # weights, zero data shuffle (r12)
    "distinct_count_estimate",  # planner primitive: key-sampled NDV +
                            # truth pass (r12)
    "selectivity_conjunctive",  # planner primitive: row-sampled
                            # conjunctive selectivity + independence
                            # grade (r12)
    "sql_agent_metrics",    # the flagship VIEW text via run_sql —
                            # the literal-SQL capstone (r12)
    "fact_key_overlap",     # planner primitive: shared-synopsis set
                            # NDV (union/intersection/jaccard) (r12)
    "ab_value_trimmed",     # whale-resistant trimmed-mean A/B on the
                            # value histogram (r12)
    "ab_value_ranksum",     # Mann-Whitney rank-sum A/B: doubled
                            # midranks on one range exchange (r13)
    "ab_value_poststrat",   # post-stratified A/B: stratum-cell agg +
                            # nano-fixed fold (r13)
    "price_range_selectivity",  # planner primitive: 64-bin equi-width
                            # histogram range estimate + truth (r13)
    "source_lang_fd",       # planner primitive: FD strength from
                            # (det,dep) cells (r13)
    "ab_value_msprt",       # always-valid mSPRT: micro-rounded
                            # log-likelihood ratio, peeking-proof (r13)
)


def bench_stream_ctr(
    spark, rows_per_second: int = 400_000, window_sec: float = 45.0
) -> dict:
    """Streaming throughput of the full CTR path (synth payload →
    base64/JSON parse → flatten → watermarked stateful dedup) against a
    saturating rate source for a bounded wall window, noop sink.

    The admission cap sits above single-node capacity so the engine
    runs saturated and catch-up batches grow to its true throughput.
    The first two completed batches are warm-up (state-store + codegen
    init takes ~10 s and would understate steady state); throughput is
    completed-rows / trigger-execution-time over the rest. This is the
    one headline axis the batch queries can't gate: a regression in the
    dedup-state path shows up here as rows/sec, not seconds."""
    import shutil
    import tempfile

    from redshift_etl_spark.streaming.ctr import build_ctr_rate_stream

    ckpt = tempfile.mkdtemp(prefix="bench_ctr_ckpt_")
    stream = build_ctr_rate_stream(
        spark, rows_per_second=rows_per_second, dup_every=10,
        num_partitions=8,
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        time.sleep(window_sec)
    finally:
        q.stop()
    done = [p for p in q.recentProgress if p["numInputRows"] > 0]
    # drop the two warm-up batches when we can afford to; on a loaded
    # machine with few completed batches, measure what finished rather
    # than reporting zero
    prog = done[2:] if len(done) > 2 else done
    rows = sum(p["numInputRows"] for p in prog)
    ms = sum(p["durationMs"]["triggerExecution"] for p in prog)
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "stream_ctr_rate_rows_per_sec": (
            round(rows / (ms / 1000.0), 1) if ms else 0.0
        ),
        "stream_ctr_rate_rows": rows,
        "stream_ctr_rate_batches": len(prog),
    }


def time_canary(spark, runs: int = 3) -> float:
    """Machine-load canary: a FIXED synthetic workload (range → hash
    key → shuffle agg → top-100 sort) touching zero repo code, timed
    min-of-N at bench start. Its committed floor (min across recorded
    rounds) turns this round's time into a load factor that scales
    every per-query budget — the gate's answer to sustained VM load,
    which min-of-2 re-runs cannot distinguish from a real regression
    (it false-flagged rounds 4 AND 5). The workload is deterministic
    (hash of a range), wholly JVM-side, and sized to run a few seconds
    so the ratio is stable."""
    from pyspark.sql import functions as F

    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        (
            spark.range(0, 25_000_000)
            .select(
                F.pmod(F.hash(F.col("id")), F.lit(1_000_000)).alias("k"),
                F.col("id").alias("v"),
            )
            .groupBy("k")
            .agg(F.sum("v").alias("s"))
            .orderBy(F.desc("s"), F.asc("k"))
            .limit(100)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 3)


def time_canary_str(spark, runs: int = 3) -> float:
    """Second machine-load canary: a FIXED string-CPU workload (md5
    render → regexp strip → length sum; wholly JVM-side, zero repo
    code). The shuffle canary is blind to string-throughput drift —
    r11 measured the text-family queries at ~1.5-1.6x their floors
    while the shuffle canary read 1.08 — so budgets scale by the WORSE
    of the two ratios. Min-of-N like the shuffle canary."""
    from pyspark.sql import functions as F

    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        (
            spark.range(0, 6_000_000)
            .select(F.md5(F.col("id").cast("string")).alias("s"))
            .agg(
                F.sum(
                    F.length(F.regexp_replace(F.col("s"), "[0-9]", ""))
                ).alias("n")
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 3)


def effective_load(
    shuffle_probes: list[float],
    str_probes: list[float],
    shuffle_floor: float | None,
    str_floor: float | None,
) -> dict:
    """Worst-probe load normalization, pure so it is unit-testable.

    r11 lesson (judge finding #1): ONE canary probe at run start cannot
    represent a 2-minute run under time-varying load — the r11 driver
    capture read 1.235 at start while the whole run executed ~1.26×
    slower than idle, so the gate false-flagged two queries. The canary
    is now probed at start / middle / end, and every budget (and the
    advisory stamp) scales by the WORST probe: a query can have run at
    any point in the window, so only the worst ambient reading bounds
    what load could have cost it. Floors still merge from the BEST
    probe (the run's closest-to-idle evidence — a min can only be
    trusted downward).

    Two DIFFERENT questions get two different aggregations:

    - ``load_factor`` (budget scaling, what the gate uses) = WORST
      probe ratio: a query may have run at the window's worst moment,
      so only the worst reading bounds what load could have cost it.
    - ``load_factor_best`` (evidentiary status) = BEST probe ratio:
      "was the MACHINE loaded?" is answered by the quietest moment —
      if even the best probe sits above the bar, ambient load
      contaminated the whole record. The worst probe is the wrong
      stamp signal because the bench's own JVM ages through a
      ~2-minute 93-query run (first r12 idle runs: start probes
      1.15/0.64 vs end-of-query probes 1.25/0.88 at loadavg ~0) —
      that aging inflates adjacent queries and probes ALIKE, so it
      belongs in budget scaling, but it is not ambient load and must
      not disqualify an idle record.

    Returns canary_sec / canary_str_sec (worst probes), per-canary
    worst ratios, and both load factors, clamped to
    [1, LOAD_FACTOR_CAP]."""

    def ratio(probes: list[float], floor: float | None, agg) -> float:
        if not probes or floor is None:
            return 1.0
        return min(max(1.0, agg(probes) / floor), LOAD_FACTOR_CAP)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2.0

    worst_shuffle = max(shuffle_probes) if shuffle_probes else None
    worst_str = max(str_probes) if str_probes else None
    lf_shuffle = ratio(shuffle_probes, shuffle_floor, max)
    lf_str = ratio(str_probes, str_floor, max)
    return {
        "canary_sec": worst_shuffle,
        "canary_str_sec": worst_str,
        "lf_shuffle": lf_shuffle,
        "lf_str": lf_str,
        "load_factor": round(max(lf_shuffle, lf_str), 3),
        "load_factor_best": round(
            max(
                ratio(shuffle_probes, shuffle_floor, min),
                ratio(str_probes, str_floor, min),
            ),
            3,
        ),
        # the ADVISORY-STAMP signal (r12 verdict item 2): the median
        # probe reflects the window's TYPICAL ambient load — robust to
        # one quiet moment (which made the best-probe stamp blind to a
        # 90%-loaded run: BENCH_r12.json probes [1.219, 2.34, 1.367]
        # stamped advisory=false off the 1.219) AND to one aged/noisy
        # probe (which made the worst-probe stamp disqualify honest
        # idle records via the bench's own JVM aging).
        "load_factor_median": round(
            max(
                ratio(shuffle_probes, shuffle_floor, median),
                ratio(str_probes, str_floor, median),
            ),
            3,
        ),
    }


def bounded_final_line(
    full: dict,
    timings: dict,
    headline,
    q_sig: str,
    full_file: str,
    limit: int = 1900,
) -> str:
    """The FINAL stdout line (what the driver tails, last 2,000 chars):
    totals + canaries + stream + top-5 slowest BY NAME, plus the
    COMPLETE per-query map as a compact millisecond array in HEADLINE
    order (``qms``, ~6 chars/query) with a name-list signature
    (``q_sig``). Degradation order when the limit squeezes: shrink the
    named slice (5→3→0) keeping qms; if the map itself no longer fits,
    drop qms and RETRY the named slices (10→5→3→0) — the capture must
    always carry SOME per-query timings (r12 self-review: the first
    spelling shipped an empty queries dict in that last resort); if
    even THAT overflows, drop the non-essential diagnostic arrays
    (probe series, post-stream probes — the full record on disk keeps
    them) and retry, then finally raise: a silently-oversized line is
    the r09 failure mode (driver tail truncates mid-JSON, commits
    parsed:null) this function exists to prevent, so overflow must be
    loud at capture time (r12 ADVICE item 3)."""
    by_cost = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    bounded = dict(full)
    bounded["queries_full_file"] = full_file
    bounded["qms"] = [
        int(round(timings[n] * 1000)) for n in headline if n in timings
    ]
    bounded["q_sig"] = q_sig
    for n_top in (5, 3, 0):
        bounded["queries"] = dict(by_cost[:n_top])
        line = json.dumps(bounded)
        if len(line) < limit:
            return line
    bounded.pop("qms", None)
    bounded.pop("q_sig", None)
    for n_top in (10, 5, 3, 0):
        bounded["queries"] = dict(by_cost[:n_top])
        line = json.dumps(bounded)
        if len(line) < limit:
            return line
    for k in (
        "canary_probes",
        "canary_str_probes",
        "canary_post_stream_sec",
        "canary_post_stream_str_sec",
    ):
        bounded.pop(k, None)
        line = json.dumps(bounded)
        if len(line) < limit:
            return line
    raise ValueError(
        f"bench final line still {len(line)} chars after every "
        f"degradation step (limit {limit}) — a truncated driver tail "
        "would commit parsed:null; trim the record fields"
    )


def _benchlib(repo: str):
    """scripts/benchlib.py, loaded by path (bench.py lives at the repo
    root, outside any package). Shared with bench_gate.py so the
    adaptive re-run budgets and the gate budgets read identical floors,
    including tail-recovered ones (the r09 parsed:null truncation)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchlib", os.path.join(repo, "scripts", "benchlib.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# A loaded machine inflates the canary and every query alike, so budgets
# scale by the ratio — but only up to this cap: past 3× the numbers are
# meaningless and a real regression could hide under the load, so the
# gate stops excusing and the round should be re-recorded instead.
LOAD_FACTOR_CAP = 3.0

# A run recorded above this ambient load is NOT round evidence: the r10
# round artifact was captured at load 1.76 and 9 of its 80 queries
# passed only via canary-scaled budgets, which the judge flagged. The
# record itself now carries the verdict — stamped at emit time so a
# loaded run can never silently become the committed round artifact —
# and floors never merge from a stamped run (a loaded "new minimum"
# would be noise in the wrong direction anyway).
RECORD_ADVISORY_LOAD = 1.3

# The canary floors in CANARY_FLOOR.json / BENCH_FLOORS.json were all
# recorded at the driver's default 32 cores. A probe taken at a lower
# core count is slower for STRUCTURAL reasons (fewer tasks in flight),
# so dividing it by a 32-core floor fabricates a load factor — the r13
# 8-core scaling run read a bogus 3.0 (judge finding #4). Scaling runs
# are diagnostic by design: stamp them advisory with an explicit
# reason instead of letting them read as hopelessly loaded.
FLOOR_REF_CPUS = 32


def stamp_advisory(full: dict) -> dict:
    """Stamp the bench record with its evidentiary status (in place).

    advisory=True means "numbers recorded under >1.3× ambient load for
    a TYPICAL moment of the window — usable for debugging, NOT as the
    round's committed evidence". The signal is ``load_factor_median``
    (r12 verdict item 2: the previous best-probe stamp keyed off the
    window's QUIETEST moment, so a run loaded 2.4× for most of its
    duration with one quiet probe stamped advisory=false while 20 of
    its queries passed only via 2.4×-scaled budgets). The median is
    robust in both directions: one loaded probe in an otherwise-idle
    window (or the bench's own JVM aging inflating the end probe)
    doesn't disqualify an honest record, and one quiet probe in a
    mostly-loaded window doesn't launder it. Legacy records fall back
    best→overall. Kept a pure function of the record so the stamp is
    unit-testable without a SparkSession."""
    cpus = full.get("cpus")
    if cpus is not None and int(cpus) != FLOOR_REF_CPUS:
        full["advisory"] = True
        full["advisory_reason"] = (
            f"non-default cpus ({cpus} vs floor reference "
            f"{FLOOR_REF_CPUS}) — canary floors are {FLOOR_REF_CPUS}-"
            "core, so the load factor is structurally inflated and not "
            "comparable; scaling runs are diagnostic, never round "
            "evidence"
        )
        return full
    lf = float(
        full.get("load_factor_median")
        or full.get("load_factor_best")
        or full.get("load_factor")
        or 1.0
    )
    full["advisory"] = lf > RECORD_ADVISORY_LOAD
    if full["advisory"]:
        full["advisory_reason"] = (
            f"ambient load {lf:.3f} > {RECORD_ADVISORY_LOAD} at the "
            "window's median probe: re-run on an idle machine before "
            "committing as round evidence"
        )
    return full


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else None

    from redshift_etl_spark import queries as Q
    from redshift_etl_spark.session import get_spark

    spark = get_spark(app_name="redshift_etl_spark_bench")
    all_q = Q.all_queries()

    # JVM/codegen warm-up on a trivial action so q1 isn't charged for it
    spark.range(1).count()

    # Canary JIT warm-up (r13, the verdict-item-2 experiment run):
    # probes through an idle full bench read START 1.313 / middle
    # 1.249 / end 1.194 / post-stream 0.930 vs floor 0.977 — the
    # series DECREASES through the run, so the start probe's ~1.3x is
    # the canary's own codegen/JIT warm-up, not ambient load (aging
    # would increase it). One untimed run of each canary before the
    # first timed probe makes every probe read a warm JVM — the same
    # state the committed floors were recorded in — so an idle machine
    # probes ~1.0x instead of inheriting a structural ~1.25x that kept
    # two rounds of idle records fuzzy (r12 verdict item 4).
    time_canary(spark, runs=1)
    time_canary_str(spark, runs=1)

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    benchlib = _benchlib(repo_dir)
    recorded = benchlib.collect_floors(repo_dir)
    canary_floor = recorded["canary"]
    canary_str_floor = recorded.get("canary_str")

    # INTERLEAVED canary probes (r11 judge finding #1): start, middle,
    # end — one start-of-run reading under-reads sustained load that
    # builds later in the window. Budgets and the advisory stamp scale
    # by the WORST probe across both canaries; mid-run budget decisions
    # use the worst-SO-FAR.
    shuffle_probes: list[float] = []
    str_probes: list[float] = []

    def probe(at: str, runs: int = 2) -> None:
        shuffle_probes.append(time_canary(spark, runs=runs))
        str_probes.append(time_canary_str(spark, runs=runs))
        eff = effective_load(
            shuffle_probes, str_probes, canary_floor, canary_str_floor
        )
        print(
            f"# canary[{at}]: shuffle {shuffle_probes[-1]:.3f}s / str "
            f"{str_probes[-1]:.3f}s -> worst-so-far load_factor "
            f"{eff['load_factor']:.2f}",
            flush=True,
        )

    probe("start", runs=3)

    # Committed per-query floors (best across recorded rounds) — used
    # to ADAPTIVELY re-run: min-of-2 absorbs most local-VM jitter, but
    # a single GC/codegen stall in both runs can still false-flag the
    # gate (it did for scd1_merge in round 4: recorded 1.611 s, fresh
    # re-run 0.774 s). If the min-of-2 exceeds the gate budget for a
    # query with a recorded floor, take up to 2 extra runs before
    # accepting the number — same protocol the judge used to
    # adjudicate, now built in, so the gate needs no manual override.
    floors: dict[str, float] = recorded["queries"]

    def _budget(qname: str) -> float | None:
        if qname not in floors:
            return None
        # canary-scaled by the worst probe SO FAR: under sustained load
        # the adaptive re-runs would otherwise burn 4 runs per query
        # chasing an unreachable idle-machine budget
        lf = effective_load(
            shuffle_probes, str_probes, canary_floor, canary_str_floor
        )["load_factor"]
        return lf * max(1.2 * floors[qname], floors[qname] + 0.5)

    timings: dict[str, float] = {}
    mid_at = len(HEADLINE) // 2
    for qi, name in enumerate(HEADLINE):
        if qi == mid_at:
            probe("middle")
        fn = all_q[name]
        n = fn(spark, sf_dir).count()  # row count for the report (untimed)
        spark.catalog.clearCache()
        best = None
        # min of 2 runs (+ up to 2 adaptive re-runs, above): the local
        # VM shows multi-second jitter from GC and whole-stage-codegen
        # compilation; min is the stable signal
        runs = 0
        while True:
            t0 = time.perf_counter()
            # noop sink: materializes EVERY output column (a bare count()
            # lets Catalyst prune projection-only queries down to a
            # zero-column scan — ReadSchema: struct<> — timing nothing)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            # operators may persist intermediate indices
            # (shingles/signatures); don't let that leak across queries
            spark.catalog.clearCache()
            runs += 1
            budget = _budget(name)
            if runs < 2:
                continue
            if runs >= 4 or budget is None or best <= budget:
                break
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", flush=True)

    # the END probe closes the QUERY window — before the stream bench,
    # because a probe taken after 45 s of saturating streaming measures
    # the stream's own wake (state-store teardown + GC), a state no
    # query ran under: the first r12 idle run read 1.59s/1.06s there
    # (vs 1.09-1.15/0.74 during the query window) and false-stamped an
    # idle run advisory. The post-stream reading is still RECORDED
    # below as a diagnostic, just never budget-scaling.
    probe("end")
    eff = effective_load(
        shuffle_probes, str_probes, canary_floor, canary_str_floor
    )

    stream = bench_stream_ctr(spark)
    print(
        f"# stream_ctr_rate: "
        f"{stream['stream_ctr_rate_rows_per_sec']:.0f} rows/s "
        f"({stream['stream_ctr_rate_rows']} rows, "
        f"{stream['stream_ctr_rate_batches']} batches)",
        flush=True,
    )
    post_shuffle = time_canary(spark, runs=1)
    post_str = time_canary_str(spark, runs=1)
    print(
        f"# canary[post-stream, diagnostic]: shuffle {post_shuffle:.3f}s "
        f"/ str {post_str:.3f}s (recorded, not budget-scaling)",
        flush=True,
    )

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "stream": stream,
        # canary_sec / canary_str_sec carry the WORST probe (what the
        # gate must scale budgets by); the per-probe series is recorded
        # beside them so the capture is audit-complete
        "canary_sec": eff["canary_sec"],
        "canary_probes": shuffle_probes,
        "canary_floor_sec": canary_floor,
        "canary_str_sec": eff["canary_str_sec"],
        "canary_str_probes": str_probes,
        "canary_str_floor_sec": canary_str_floor,
        # post-stream diagnostic probe: reflects the stream bench's own
        # wake, not a state any query ran under — see probe("end") note
        "canary_post_stream_sec": post_shuffle,
        "canary_post_stream_str_sec": post_str,
        "load_factor": eff["load_factor"],
        "load_factor_best": eff["load_factor_best"],
        "load_factor_median": eff["load_factor_median"],
        "sf": sf,
        "cpus": cpus,
    }
    stamp_advisory(full)
    if full["advisory"]:
        print(f"# ADVISORY RUN — {full['advisory_reason']}", flush=True)
    # full per-query record: its own '#' line (human/tail debugging) and
    # a committed file — the gate reads the file, never a driver tail.
    # Non-default core counts write BENCH_FULL_c<cpus>.json (r13 judge
    # finding #3: the 8-core scaling run overwrote the 32-core map)
    full_file = (
        benchlib.FULL_FILE
        if cpus in (None, FLOOR_REF_CPUS)
        else benchlib.FULL_FILE.replace(".json", f"_c{cpus}.json")
    )
    print("# full: " + json.dumps(full), flush=True)
    with open(os.path.join(repo_dir, full_file), "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    if sf == 0.1 and not full["advisory"]:
        # floors merge from the BEST probe: the run's closest-to-idle
        # reading is its only admissible new-minimum evidence
        benchlib.merge_floors_file(
            repo_dir, timings, stream, min(shuffle_probes),
            canary_str_sec=min(str_probes),
        )
        print(f"# floors merged into {benchlib.FLOORS_FILE}", flush=True)
    elif sf == 0.1:
        print("# floors NOT merged (advisory run)", flush=True)

    # the FINAL stdout line is what the driver tails (last 2,000 chars)
    # and must stay parseable no matter how the catalog grows — r09's
    # 68-query line overflowed the capture and committed parsed:null;
    # r11 finding #3: the named top-10 left 77 of 87 timings invisible.
    # See bounded_final_line for the degradation contract.
    line = bounded_final_line(
        full, timings, HEADLINE,
        benchlib.q_sig([n for n in HEADLINE if n in timings]),
        full_file,
    )
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
