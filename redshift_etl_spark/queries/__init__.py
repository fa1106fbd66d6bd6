from . import agent_metrics, llm_data, relational, tables, tpch_shapes  # noqa: F401

_MODULES = (llm_data, tpch_shapes, agent_metrics, relational)

# Registration order IS the driver's execution order (dicts preserve
# insertion order), and the driver may cap its run — round 1 stopped
# after 50 entries. Priority: everything the driver has NEVER verified
# runs first (module order preserved within each tier), then the
# 50 queries already driver-green in CORRECTNESS_r01 re-verify if the
# budget allows.
_R1_DRIVER_GREEN = frozenset(
    """agent_metrics agent_metrics_2 pricing_summary star_filter_project
    latest_order_per_customer scd1_merge append_new changed_or_new
    quantity_histogram events_pivot scalar_suite json_extract
    type_coercion stream_dedup_batch upsert_if_changed union_slices
    windowed_agg topk_per_group rollup_totals sessionization
    asof_prev_order scalar_suite2 malformed_json_filter
    semi_join_customers full_outer_join ordered_limit salted_aggregation
    percentiles range_join_incidents cube_totals sliding_window_agg
    small_qty_revenue ntile_quartiles window_frames shipping_priority
    salted_join session_window_agg rank_suite array_agg_suite
    grouping_sets_margins lineitem_unpivot null_semantics datetime_suite
    scd2_merge math_suite exists_priority custdist large_orders
    dormant_customers zscore_anomalies""".split()
)


def _prioritized(merged: dict) -> dict:
    fresh = {k: v for k, v in merged.items() if k not in _R1_DRIVER_GREEN}
    seen = {k: v for k, v in merged.items() if k in _R1_DRIVER_GREEN}
    return {**fresh, **seen}


def all_queries() -> dict:
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return _prioritized(out)


def all_oracles() -> dict:
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _prioritized(out)
