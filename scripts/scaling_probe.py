"""Scaling probe — wall-clock of representative headline queries across
the three test scale factors, as evidence that per-query cost grows
sub-linearly in data size on the fixed local[32] box (fixed overheads
amortize; the data-proportional part is the distributed cost that
matters at 100 TB).

Not a gate (wall-clock across SFs is jitter-prone on a shared VM); run
on demand:

    python scripts/scaling_probe.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

PROBES = (
    "agent_metrics",        # star join + grouped aggregates
    "pricing_summary",      # pushed-filter scan + hash agg
    "dedup_minhash_lsh",    # explode + signature agg + banded joins
    "lsh_bucketed_cosine",  # banded LSH + Arrow sweep
    "scd1_merge",           # key shuffle + window + anti-join
    "substring_dedup",      # gram agg + flag join + in-row rebuild
    "bm25_search",          # filtered explode + broadcast stats
    "web_corpus_prep",      # scan-fused curation pipeline
    "customer_pareto",      # ranked_cumsum two-pass range exchange
    "doc_length_cdf",       # percentile-edge CDF over distinct counts
    "rfm_segments",         # distributed percentile_disc edges (r6)
    "trade_pagerank",       # iterative join+agg (r5 join-trimmed)
    "temperature_mixture",  # quota draw, r7 md5-prefix-bounded window
    "vocab_overlap",        # (group,token) frame + per-token join
    "embedding_gram",       # d^2 explode + map-side partial agg
    "leakage_safe_split",   # pure projection on md5(group)
    "pack_sequences",       # ranked_cumsum tape + boundary explode
    "zorder_curve",         # stats pass + pure projection
    "cdc_apply",            # feed window + distinct-key anti-join
    "mv_incremental",       # two partial-aggregate folds
    "incremental_near_dups",  # increment signatures + index equi-probe
    "chat_transcripts",     # collect+in-row sort render, one shuffle
    "ccnet_perplexity",     # bigram stream + 4096-cell model join (r7)
    "gopher_quality_rules",  # pure projection — the linear floor (r7)
    "dsir_select",          # 64-row model + doc-keyed agg + top-k (r7)
    "ks_drift",             # shared range-exchange cumsum (r7)
    "mad_outliers",         # two grouped-percentile passes (r7s2)
    "token_weighted_length",  # weighted + plain edges, one report (r7s2)
    "lang_marker_auc",      # exact midrank AUC (r7s2)
    "corpus_datacard",      # one-scan release summary (r7s2)
)
SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    from redshift_etl_spark import queries as Q
    from redshift_etl_spark.session import get_spark

    spark = get_spark(app_name="scaling_probe")
    spark.range(1).count()
    all_q = Q.all_queries()
    report: dict[str, dict[str, float]] = {}
    for name in PROBES:
        fn = all_q[name]
        per_sf = {}
        for sf_dir in SFS:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per_sf[sf_dir.rsplit("sf", 1)[1]] = round(
                time.perf_counter() - t0, 3
            )
            spark.catalog.clearCache()
        report[name] = per_sf
        ratio = per_sf["0.1"] / per_sf["0.001"]
        print(
            f"# {name}: {per_sf}  (100x data -> {ratio:.1f}x time)",
            flush=True,
        )
    print(json.dumps({"metric": "scaling_probe", "queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
