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
    "lang_marker_spearman",   # two midrank range exchanges, decimal sums
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
)

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
    print(f"# index fixtures ready in {time.time() - t0:.1f}s", flush=True)

    all_q = Q.all_queries()
    report: dict[str, dict[str, float]] = {}
    for name in REHEARSAL:
        fn = all_q[name]
        times = {}
        for label, d in (("sf0.1", SRC), ("sfbig", OUT)):
            t0 = time.time()
            fn(spark, d).count()
            times[label] = round(time.time() - t0, 3)
        slope = round(times["sfbig"] / max(times["sf0.1"], 1e-9), 2)
        report[name] = {**times, "slope_at_10x": slope}
        print(f"# {name}: {times}  (10x data -> {slope}x time)", flush=True)

    # density-decoupled range-join: replicas shifted +40 days apart so
    # true pairs scale linearly — this isolates the ENGINE's slope from
    # the shared-window workload growth the coupled probe measures
    fn = all_q["range_join_incidents"]
    times = {}
    for label, d in (("sf0.1", SRC), ("sfbig_decoupled", OUT_DECOUPLED)):
        t0 = time.time()
        fn(spark, d).count()
        times[label] = round(time.time() - t0, 3)
    slope = round(times["sfbig_decoupled"] / max(times["sf0.1"], 1e-9), 2)
    report["range_join_incidents_decoupled"] = {
        **times, "slope_at_10x": slope
    }
    print(
        f"# range_join_incidents_decoupled: {times} "
        f"(10x data, ~10x pairs -> {slope}x time)",
        flush=True,
    )

    # density-decoupled semdedup: replica embeddings are dimension-
    # rotated (inner products preserved WITHIN a replica, decorrelated
    # across), so true dup edges grow ~linearly instead of the
    # exact-copy fixture's ~2300x clique growth — the engine's slope,
    # not the workload's. Index fixtures prewarm first (build
    # artifacts, same as the main probes).
    L.semdedup_cells_fixture(spark, OUT_DECOUPLED).count()
    fn = all_q["semdedup"]
    times = {}
    for label, d in (("sf0.1", SRC), ("sfbig_decoupled", OUT_DECOUPLED)):
        t0 = time.time()
        fn(spark, d).count()
        times[label] = round(time.time() - t0, 3)
    slope = round(times["sfbig_decoupled"] / max(times["sf0.1"], 1e-9), 2)
    report["semdedup_decoupled"] = {**times, "slope_at_10x": slope}
    print(
        f"# semdedup_decoupled: {times} "
        f"(10x data, ~10x dup edges -> {slope}x time)",
        flush=True,
    )
    print(json.dumps({"metric": "scale_rehearsal", "replicas": REPLICAS,
                      "queries": report}))


if __name__ == "__main__":
    main()
