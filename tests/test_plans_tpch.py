"""Physical-plan posture for the TPC-H shape suite (tpch_shapes.py).

Only stable properties are pinned: hinted broadcasts, join types,
Expand-absence, filter pushdown, and the top-k operator. Join-strategy
choices that legitimately flip with size estimation (AQE at small SF)
are deliberately NOT asserted.
"""

from __future__ import annotations

from redshift_etl_spark import plans as P
from redshift_etl_spark import queries as Q

from .conftest import SF_ORACLE


def _q(spark, name):
    return Q.all_queries()[name](spark, SF_ORACLE)


def test_regional_revenue_broadcasts_dims(spark):
    # Q5: supplier(+nation+region) side is hint-broadcast; the fact meets
    # an already-filtered build side, never shuffles to reach a dim
    df = _q(spark, "regional_revenue")
    assert P.count_broadcasts(df) >= 2
    pushed = " ".join(P.pushed_filters(df))
    assert "o_orderdate" in pushed
    assert "r_name" in pushed


def test_volume_shipping_prefilters_nation_dims(spark):
    # Q7: both dim sides restricted to the two nations BEFORE meeting the
    # facts — the n_name IN filter reaches the nation scan
    df = _q(spark, "volume_shipping")
    assert P.count_broadcasts(df) >= 2
    pushed = " ".join(P.pushed_filters(df))
    assert "n_name" in pushed
    assert "l_shipdate" in pushed


def test_market_share_single_agg_pass(spark):
    # Q8: conditional-sum / total-sum ratio in ONE aggregate — no Expand,
    # no self-join of the aggregated year grain
    df = _q(spark, "market_share")
    tree = P.plan_tree(df)
    assert "Expand" not in tree
    assert P.count_broadcasts(df) >= 3  # asia nations, part slice, supplier


def test_profit_by_nation_year_part_prune_before_shuffle(spark):
    # Q9: the p_name LIKE filter reaches the part scan, and the filtered
    # part slice broadcasts — lineitem is pruned map-side before any
    # orderkey shuffle
    df = _q(spark, "profit_by_nation_year")
    pushed = " ".join(P.pushed_filters(df))
    assert "p_name" in pushed
    assert P.count_broadcasts(df) >= 2


def test_returned_top_customers_topk_no_global_sort(spark):
    # Q10: LIMIT 20 plans as TakeOrderedAndProject (per-partition top-k),
    # never a range-shuffle global sort
    df = _q(spark, "returned_top_customers")
    tree = P.plan_tree(df)
    assert "TakeOrderedAndProject" in tree
    assert "rangepartitioning" not in tree.lower()
    pushed = " ".join(P.pushed_filters(df))
    assert "o_orderdate" in pushed and "l_returnflag" in pushed


def test_nation_balance_share_scalar_broadcast(spark):
    # Q11: the global threshold is a 1-row broadcast (nested-loop over
    # ONE row) — the per-nation agg is never re-scanned or self-joined
    df = _q(spark, "nation_balance_share")
    tree = P.plan_tree(df)
    assert "BroadcastNestedLoopJoin" in tree
    assert P.tree_count(df, "Window") == 0


def test_priority_shipping_mix_one_pass(spark):
    # Q12: both conditional counts ride one hash aggregate — no Expand
    df = _q(spark, "priority_shipping_mix")
    tree = P.plan_tree(df)
    assert "Expand" not in tree
    assert P.tree_count(df, "HashAggregate") >= 2  # partial + final


def test_promo_revenue_ratio_one_pass(spark):
    # Q14: promo/total ratio in one aggregate; no second scan of the join
    df = _q(spark, "promo_revenue")
    tree = P.plan_tree(df)
    assert "Expand" not in tree
    assert P.tree_count(df, "HashAggregate") >= 2


def test_top_supplier_fact_scanned_once(spark):
    # Q15: the global MAX is a 1-row aggregate broadcast back (no
    # whole-frame window); the two rev branches share one identical
    # groupBy exchange, which AQE's exchange reuse dedupes at runtime —
    # so the fact-side partial aggregation (and its scan) runs once.
    df = _q(spark, "top_supplier")
    df.collect()  # AQE reuse materializes at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "Window" not in plan
    assert P.count_broadcasts(df) >= 2


def test_supplier_part_variety_no_expand_anti_broadcast(spark):
    # Q16: single COUNT(DISTINCT) rewrites to a two-stage aggregate (no
    # Expand); the NOT IN exclusion is a broadcast LEFT ANTI
    df = _q(spark, "supplier_part_variety")
    tree = P.plan_tree(df)
    assert "Expand" not in tree
    assert "LeftAnti" in tree


def test_disjunctive_revenue_stays_hash_join(spark):
    # Q19: the OR-of-conjuncts predicate must NOT degrade the partkey
    # equi-join to a nested-loop / cartesian plan
    df = _q(spark, "disjunctive_revenue")
    tree = P.plan_tree(df)
    assert "BroadcastNestedLoopJoin" not in tree
    assert "CartesianProduct" not in tree


def test_promotion_suppliers_semi_join(spark):
    # Q20: IN-subquery compiles to LEFT SEMI against the broadcast
    # survivor set; the date filter reaches the lineitem scan
    df = _q(spark, "promotion_suppliers")
    tree = P.plan_tree(df)
    assert "LeftSemi" in tree
    pushed = " ".join(P.pushed_filters(df))
    assert "l_shipdate" in pushed


def test_waiting_suppliers_one_lineitem_pass(spark):
    # Q21: EXISTS + NOT EXISTS collapse into ONE order-grain aggregate —
    # lineitem is scanned once, no window, no Expand
    df = _q(spark, "waiting_suppliers")
    scans = P.scanned_columns(df)
    li_scans = [s for s in scans if "l_returnflag" in s]
    assert len(li_scans) == 1
    tree = P.plan_tree(df)
    assert "Expand" not in tree
    assert P.tree_count(df, "Window") == 0


def test_min_cost_supplier_decorrelated_single_lineitem_pass(spark):
    # Q2: the correlated MIN decorrelates to ONE partkey window over the
    # per-(part,supp) cost agg — lineitem is scanned once; part slice and
    # the region-filtered supplier dim broadcast
    df = _q(spark, "min_cost_supplier")
    scans = P.scanned_columns(df)
    li_scans = [s for s in scans if "l_extendedprice" in s]
    assert len(li_scans) == 1
    assert P.count_broadcasts(df) >= 2
    pushed = " ".join(P.pushed_filters(df))
    assert "p_size" in pushed
    assert "r_name" in pushed


def test_forecast_revenue_scan_posture(spark):
    # Q6: every predicate reaches the parquet reader and the scan reads
    # exactly the 4 touched columns — at 100 TB this query IS its scan
    df = _q(spark, "forecast_revenue")
    pushed = " ".join(P.pushed_filters(df))
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed
    scans = P.scanned_columns(df)
    assert scans and all(
        set(s) == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
        for s in scans
    )
    # single global agg: exactly one exchange (the 1-row final agg)
    assert P.tree_count(df, "Exchange") == 1
