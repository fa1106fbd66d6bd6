"""Guard: every hard `F.broadcast(...)` hint in the engine is on a
frame that is bounded BY CONSTRUCTION, never on a data-dependent
aggregate whose size an adversarial distribution controls.

A forced broadcast OOMs the driver/executors when the estimate is
wrong; AQE's runtime-measured broadcast degrades to a shuffled hash
join instead. So the rule (round-5 verdict): hints are reserved for
frames whose row count is bounded by a constant, a config, or a LIMIT
— a 1-row aggregate, a k-row top-k, a codebook, one row per shuffle
partition, a small dim at committed scale with a documented cap. The
`sole_source_parts` at-risk list (parts with <=2 recent suppliers — a
filtered fact aggregate that a skewed catalog can blow up) was exactly
the anti-pattern; it now lets AQE decide (asserted below).

The sweep is a SNAPSHOT allowlist: adding a new `F.broadcast` site
requires adding its (file, function) here, i.e. writing down why the
frame is bounded. Entries group by boundedness argument:

- 1-row / O(1) aggregates: stats denominators, drift norms, chi-square
  totals, quantile-edge frames (percentile_disc_edges, rfm_segments,
  quality_decile_lift, doc_length_cdf, customer_pareto offsets, ...)
- LIMIT / top-k heads: domain_lorenz top-50, bm25/tfidf vocab,
  heavy-hitter finalists, farthest-point seeds
- codebooks / models: pq & ivf centroids, bpe merge rules, int8
  scales, query vectors (constant per call), the hashed bigram LM
  (≤ ctx_buckets × word_buckets = 4096 cells by construction)
- dims bounded at committed scale AND joined as the build side of a
  star: nation/region/customer-slice/part-slice in the TPC-H shapes
  (these carry docstring caps; the catalog-scaling ones also have
  plan tests)
- one row per shuffle partition (cluster config): ranked_cumsum
  offsets, skew_report partition stats
"""

from __future__ import annotations

import ast
import pathlib

from pyspark.sql import functions as F

from redshift_etl_spark import queries as Q

from .conftest import SF_ORACLE

SRC_ROOT = pathlib.Path(__file__).resolve().parents[1] / "redshift_etl_spark"

ALLOWED = {
    ("operators/bpe.py", "_apply_rule"),
    ("operators/bpe.py", "bpe_encode"),
    ("operators/dedup.py", "contamination"),
    ("operators/distsort.py", "percentile_disc_edges"),
    ("operators/distsort.py", "weighted_percentile_disc_edges"),
    ("operators/distsort.py", "pr_curve"),
    ("operators/distsort.py", "ranked_cumsums"),
    ("operators/distsort.py", "ks_drift"),
    ("operators/dsir.py", "_delta_table"),
    ("operators/dsir.py", "dsir_scores"),
    ("operators/similarity.py", "hard_negatives"),
    ("operators/similarity.py", "margin_mined_pairs"),
    ("operators/funnel.py", "retention_cohorts"),
    ("operators/funnel.py", "transition_matrix"),
    ("operators/graph.py", "_pagerank_loop"),
    ("operators/heavy.py", "heavy_hitters"),
    ("operators/ngramlm.py", "perplexity_scores"),
    ("operators/pq.py", "_assign"),
    ("operators/pq.py", "pq_adc_topk"),
    ("operators/quality.py", "_entropy"),
    ("operators/quality.py", "audit"),
    ("operators/quality.py", "mutual_information"),
    ("operators/sampling.py", "mixture_sample"),
    ("operators/sampling.py", "temperature_mixture"),
    ("queries/curation.py", "leakage_safe_split"),
    ("operators/sampling.py", "token_budget_sample"),
    ("operators/sampling.py", "winsorize"),
    ("operators/similarity.py", "ann_topk_lsh"),
    ("operators/similarity.py", "assign_clusters"),
    ("operators/similarity.py", "assign_clusters_multi"),
    ("operators/similarity.py", "cosine_topk"),
    ("operators/similarity.py", "farthest_point_sample"),
    ("operators/similarity.py", "int8_topk"),
    ("operators/similarity.py", "ivf_topk"),
    ("operators/skew.py", "skew_report"),
    ("operators/text.py", "bigram_likelihood"),
    ("operators/text.py", "bm25_scores"),
    ("operators/text.py", "encode_ids"),
    ("operators/text.py", "tfidf_top_terms"),
    ("operators/web.py", "blocklist_filter"),
    ("operators/web.py", "domain_share"),
    ("queries/agent_metrics.py", "_events_star"),
    ("queries/curation.py", "domain_lorenz"),
    ("queries/curation.py", "fold_source_balance"),
    ("queries/curation.py", "int8_quantize_stats"),
    ("queries/curation.py", "length_trim"),
    ("queries/llm_data.py", "ccnet_buckets"),
    ("queries/llm_data.py", "corpus_datacard"),
    ("queries/llm_data.py", "doc_length_cdf"),
    ("queries/llm_data.py", "doremi_weights"),
    ("queries/llm_data.py", "embedding_drift"),
    ("queries/llm_data.py", "semdedup"),
    ("queries/llm_data.py", "quality_decile_lift"),
    ("queries/llm_data.py", "token_pmi_top"),
    ("queries/relational.py", "basket_part_pairs"),
    ("queries/relational.py", "customer_pareto"),
    ("queries/relational.py", "dormant_customers"),
    ("queries/relational.py", "event_type_independence"),
    ("queries/relational.py", "gap_fill_daily"),
    ("queries/relational.py", "large_orders"),
    ("queries/relational.py", "rfm_segments"),
    ("queries/relational.py", "shipping_priority"),
    ("queries/relational.py", "small_qty_revenue"),
    ("queries/relational.py", "star_filter_project"),
    ("queries/tpch_shapes.py", "idle_rich_customers"),
    ("queries/tpch_shapes.py", "market_share"),
    ("queries/tpch_shapes.py", "min_cost_supplier"),
    ("queries/tpch_shapes.py", "nation_balance_share"),
    ("queries/tpch_shapes.py", "profit_by_nation_year"),
    ("queries/tpch_shapes.py", "promotion_suppliers"),
    ("queries/tpch_shapes.py", "regional_revenue"),
    ("queries/tpch_shapes.py", "returned_top_customers"),
    ("queries/tpch_shapes.py", "supplier_part_variety"),
    ("queries/tpch_shapes.py", "top_supplier"),
    ("queries/tpch_shapes.py", "volume_shipping"),
    ("queries/tpch_shapes.py", "waiting_suppliers"),
    ("queries/llm_data.py", "mixture_drift"),
    ("streaming/topk.py", "topk_similarity_stream"),
}


def _broadcast_sites(root: pathlib.Path = SRC_ROOT):
    sites = []
    for path in sorted(root.rglob("*.py")):
        rel = str(path.relative_to(root))
        tree = ast.parse(path.read_text())
        spans = [
            (n.lineno, n.end_lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
            ):
                best, fn = None, None
                for lo, hi, name in spans:
                    if lo <= node.lineno <= hi and (
                        best is None or (hi - lo) < best
                    ):
                        best, fn = hi - lo, name
                sites.append((rel, fn, node.lineno))
    return sites


def test_broadcast_hints_only_on_allowlisted_sites():
    offenders = [
        s for s in _broadcast_sites() if (s[0], s[1]) not in ALLOWED
    ]
    assert not offenders, (
        f"new F.broadcast hint outside the allowlist: {offenders} — "
        "either the frame is bounded by construction (add it here with "
        "a justification in the module docstring groups) or it is "
        "data-dependent and must let AQE decide."
    )


def test_broadcast_allowlist_has_no_dead_entries():
    live = {(s[0], s[1]) for s in _broadcast_sites()}
    dead = ALLOWED - live
    assert not dead, f"stale allowlist entries: {dead}"


def test_sole_source_parts_has_no_forced_broadcast():
    # the named anti-pattern stays dead
    live = {
        (f, fn) for f, fn, _ in _broadcast_sites()
    }
    assert ("queries/relational.py", "sole_source_parts") not in live


def test_sole_source_parts_aqe_broadcasts_at_committed_sf(spark):
    """Dropping the hint must not cost the broadcast at committed SFs:
    AQE measures the post-filter at-risk list at the shuffle boundary
    and promotes the join to broadcast at runtime."""
    df = Q.all_queries()["sole_source_parts"](spark, SF_ORACLE)
    rows = df.collect()
    assert rows  # non-vacuous (r4 lesson)
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final_plan, final_plan
