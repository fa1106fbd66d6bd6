"""TPC-H-derived query shapes adapted to the driver testdata schema.

The reference's view/report queries (``view_agent_metrics.sql``,
``view_funnel.sql``) exercise the same relational shapes TPC-H
canonicalizes: multi-way star joins, conditional aggregation, global
scalar subqueries, semi/anti chains, disjunctive join predicates.
relational.py already carries Q1/Q3/Q4/Q13/Q17/Q18/Q22; this module
adds the remaining distinctive shapes (Q5 Q7 Q8 Q9 Q10 Q11 Q12 Q14
Q15 Q16 Q19 Q20 Q21), adapted where the testdata lacks a column
(no partsupp / shipmode / receiptdate — lineitem itself stands in as
the part-supplier relation).

Scale posture shared by all entries (100 TB / 1000-executor framing):
- fact⋈fact joins (lineitem⋈orders, orders⋈customer) shuffle on their
  join key once; downstream groupBys reuse that partitioning where the
  grain matches (exchange reuse, no second shuffle).
- dimension sides (region, nation, supplier, filtered part slices) are
  broadcast — never a shuffle of the fact to meet a dim.
- nation/region predicates are pushed INTO the dim before the join so
  the fact side meets an already-filtered build side.

Float policy (queries/agent_metrics.py): aggregate sums rounded at
native decimal granularity; ratios divide already-rounded sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None):
    # Bare dict writes silently shadow an earlier same-name query (this
    # bit three rounds running: shard_manifest, cdc_apply, and two dead
    # module-level defs) — collisions must fail at import time.
    def deco(fn):
        if name in QUERIES:  # raise, not assert: -O must not disable this
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q5 shape — local-supplier revenue by nation inside one region.
# Exercises the 6-way star with a cross-dimension equality
# (c_nationkey = s_nationkey) that is NOT a star edge.
# Join order at scale: orders⋈customer shuffle on custkey (both facts),
# result⋈lineitem shuffle on orderkey, supplier/nation/region broadcast.
# ---------------------------------------------------------------------------

@_q(
    "regional_revenue",
    """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
GROUP BY n_name
""",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    # region predicate pushed into the supplier dim BEFORE it meets the
    # fact: only ASIA suppliers are broadcast.
    sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01 00:00:00")
        & (F.col("o_orderdate") < "2000-01-01 00:00:00")
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    oc = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _revenue().alias("rev")
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q7 shape — bilateral shipping volume between two nations by year.
# The nation-pair disjunction is applied AFTER pre-filtering both dim
# sides to the two nations, so the fact rows that survive the joins are
# already the interesting ones.
# ---------------------------------------------------------------------------

@_q(
    "volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1999-01-01 00:00:00")
        & (F.col("l_shipdate") < "2001-01-01 00:00:00")
    )
    # suppliers of the two nations are a tiny slice — broadcast prunes
    # lineitem to their rows before the big orders⋈customer side joins.
    li2 = li.join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "l_orderkey",
        "supp_nation",
        F.year("l_shipdate").alias("l_year"),
        _revenue().alias("volume"),
    )
    oc = load(spark, sf_dir, "orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    return (
        li2.join(oc, li2.l_orderkey == oc.o_orderkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share: one nation's fraction of regional revenue by
# year. The share is a conditional-sum / total-sum ratio computed in ONE
# aggregate pass (no self-join, no second scan).
# ---------------------------------------------------------------------------

@_q(
    "market_share",
    """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 4)
         / ROUND(SUM(volume), 4) AS mkt_share
FROM (
  SELECT YEAR(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
) t
GROUP BY o_year
""",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    asia_nat = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(asia_nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01 00:00:00")
        & (F.col("o_orderdate") < "2001-01-01 00:00:00")
    )
    oc = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "supp_nation", _revenue().alias("volume"))
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .groupBy("o_year")
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3",
                            F.col("volume"),
                        ).otherwise(F.lit(0.0))
                    ),
                    4,
                )
                / F.round(F.sum("volume"), 4)
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape — profit by supplier nation and order year for a part family
# (no partsupp in the testdata, so profit = discounted revenue).
# ---------------------------------------------------------------------------

@_q(
    "profit_by_nation_year",
    """
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, YEAR(o_orderdate)
""",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    # part filter prunes lineitem ~8× before the orderkey shuffle.
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "nation", _revenue().alias("rev"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("rev"), 4).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned-item reporting: top 20 customers by lost revenue
# in one quarter. LIMIT rides TakeOrderedAndProject (per-partition top-k
# then a 20-row merge on the driver — never a global sort).
# ---------------------------------------------------------------------------

@_q(
    "returned_top_customers",
    """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, ROUND(c_acctbal, 2), n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "2000-01-01 00:00:00")
        & (F.col("o_orderdate") < "2000-04-01 00:00:00")
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", _revenue().alias("rev"))
    cust = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )
    # one quarter of orders is small relative to lineitem: aggregate to
    # customer grain FIRST, then meet the customer dim.
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 shape — groups whose aggregate exceeds a fraction of the GLOBAL
# aggregate (post-aggregation HAVING against a scalar subquery). The
# global total is a 1-row broadcast; no re-scan, no self-join of groups.
# ---------------------------------------------------------------------------

@_q(
    "nation_balance_share",
    """
SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS bal
FROM supplier
GROUP BY s_nationkey
HAVING ROUND(SUM(s_acctbal), 2) >
       (SELECT ROUND(SUM(s_acctbal), 2) * 0.05 FROM supplier)
""",
)
def nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    per_nation = sup.groupBy("s_nationkey").agg(
        F.round(F.sum("s_acctbal"), 2).alias("bal")
    )
    total = sup.agg(
        (F.round(F.sum("s_acctbal"), 2) * F.lit(0.05)).alias("threshold")
    )
    return (
        per_nation.join(F.broadcast(total))
        .filter(F.col("bal") > F.col("threshold"))
        .select("s_nationkey", "bal")
    )


# ---------------------------------------------------------------------------
# Q12 shape — two conditional counts in one pass (high- vs low-priority
# line counts per line status; testdata has no l_shipmode so the group
# key is l_linestatus).
# ---------------------------------------------------------------------------

@_q(
    "priority_shipping_mix",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def priority_shipping_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-01-01 00:00:00")
        & (F.col("l_shipdate") < "2001-01-01 00:00:00")
    ).select("l_orderkey", "l_linestatus")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue percentage: conditional-sum / total-sum in
# one aggregate. part⋈lineitem stays a key shuffle at full scale (part
# is too wide to broadcast at SF where lineitem is 100 TB); AQE converts
# it to broadcast at test scale on its own.
# ---------------------------------------------------------------------------

@_q(
    "promo_revenue",
    """
SELECT 100.00 *
       ROUND(SUM(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END), 4)
       / ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '2000-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-10-01 00:00:00'
""",
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "2000-09-01 00:00:00")
        & (F.col("l_shipdate") < "2000-10-01 00:00:00")
    ).select("l_partkey", _revenue().alias("rev"))
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.00)
                * F.round(F.sum(promo), 4)
                / F.round(F.sum("rev"), 4)
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier: per-supplier revenue for a quarter, keep the
# max. The global max is a 1-row aggregate broadcast back onto the
# supplier-grain revenue table (the same idiom as nation_balance_share)
# — unconditionally scale-safe, unlike a Window.partitionBy() whole-frame
# window which funnels the frame through one task. The two rev branches
# share an identical shuffle, deduped by ReuseExchange (asserted in
# tests/test_plans_tpch.py), so lineitem is scanned once physically.
# ---------------------------------------------------------------------------

@_q(
    "top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01 00:00:00")
            & (F.col("l_shipdate") < "2000-04-01 00:00:00")
            # explicit null-key filter so BOTH consumers of rev see the
            # same scan predicates — without it the final inner join
            # pushes IsNotNull(l_suppkey) into only one branch and the
            # exchanges stop being identical, defeating ReuseExchange
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_revenue()), 4).alias("total_revenue"))
    )
    # 1-row global max, broadcast back — the two rev branches share an
    # identical groupBy exchange, which Spark's ReuseExchange dedupes,
    # so lineitem is still scanned once at the physical level.
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier variety per part bucket with a NOT IN exclusion.
# lineitem stands in for partsupp; the exclusion list (suppliers in
# deficit) is a broadcast anti-join, and the single COUNT(DISTINCT)
# rewrites to a two-stage aggregate — no Expand, no extra shuffle.
# ---------------------------------------------------------------------------

@_q(
    "supplier_part_variety",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 3)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    deficit = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(deficit),
            li.l_suppkey == deficit.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive join predicate (OR of brand/size/quantity
# conjuncts). Expressed as a plain equi-join on partkey with the OR as a
# post-join filter: Catalyst extracts the common sub-predicates to both
# scan sides (p_size/p_brand to part, l_quantity to lineitem), so the
# disjunction never degrades to a nested-loop join.
# ---------------------------------------------------------------------------

@_q(
    "disjunctive_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _revenue().alias("rev")
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    def arm(brand: str, size_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = arm("Brand#12", 5, 1, 11) | arm("Brand#13", 10, 10, 20) | arm(
        "Brand#14", 15, 20, 30
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum("rev"), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — nested semi-join chain: suppliers who moved serious volume
# of a part family in a year. The inner aggregate runs at (suppkey)
# grain over a part-pruned lineitem slice; the supplier table is then
# LEFT SEMI joined against that tiny survivor set.
# ---------------------------------------------------------------------------

@_q(
    "promotion_suppliers",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2001-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 100
)
""",
)
def promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    movers = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01 00:00:00")
            & (F.col("l_shipdate") < "2001-01-01 00:00:00")
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return sup.join(
        F.broadcast(movers),
        sup.s_suppkey == movers.l_suppkey,
        "left_semi",
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who single-handedly "failed" multi-supplier
# orders (the only supplier with returned lines on a finished order).
# The canonical EXISTS + NOT EXISTS double self-join is re-expressed as
# ONE aggregate at order grain: collect_set(supplier) answers EXISTS
# (|set| > 1) and collect_set(returned supplier) answers NOT EXISTS
# (|set| == 1) — one shuffle of lineitem instead of three.
# collect_set (not countDistinct ×2) keeps the plan Expand-free; order
# grain bounds set sizes (≤ lines per order). See spark-agg-expand-trap.
# ---------------------------------------------------------------------------

@_q(
    "waiting_suppliers",
    """
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s_suppkey, s_name
""",
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    finished = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = (
        li.join(finished, li.l_orderkey == finished.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("supps"),
            F.collect_set(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("r_supps"),
            F.count(
                F.when(F.col("l_returnflag") == "R", F.lit(1))
            ).alias("r_lines"),
        )
        .filter((F.size("supps") > 1) & (F.size("r_supps") == 1))
        .select(
            F.element_at("r_supps", 1).alias("suppkey"),
            "r_lines",
        )
    )
    per_supp = per_order.groupBy("suppkey").agg(
        F.sum("r_lines").alias("numwait")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return per_supp.join(
        F.broadcast(sup), per_supp.suppkey == sup.s_suppkey
    ).select("s_suppkey", "s_name", "numwait")


# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part inside one region (correlated
# MIN subquery). The testdata has no partsupp table; the observed
# minimum l_extendedprice per (partkey, suppkey) stands in as the
# supply cost (SURVEY §2.5b note).
# Posture at scale: the per-(part,supp) cost agg is the only lineitem
# shuffle; the correlated MIN decorrelates to a partkey-partitioned
# window over the (much smaller) cost relation; part slice and the
# region-filtered supplier⋈nation dim broadcast.
# ---------------------------------------------------------------------------

@_q(
    "min_cost_supplier",
    """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT p_partkey, p_name, s_name, n_name, s_acctbal, supply_cost
FROM ps
JOIN eu ON ps.l_suppkey = eu.s_suppkey
JOIN part ON p_partkey = l_partkey
WHERE p_size <= 15 AND p_type = 'ECONOMY'
  AND supply_cost = (
    SELECT MIN(ps2.supply_cost)
    FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
    WHERE ps2.l_partkey = ps.l_partkey
  )
""",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation")
                .join(
                    F.broadcast(
                        load(spark, sf_dir, "region").filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part_slice = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_name")
    )
    # the one lineitem shuffle: cost per (part, supplier)
    ps = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    # correlated MIN decorrelated: restrict to EUROPE suppliers first
    # (the subquery is over eu-joined ps), then a partkey window —
    # the agg output is small, this shuffle is cheap
    eu_ps = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        eu_ps.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .join(F.broadcast(part_slice), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            "supply_cost",
        )
    )


# ---------------------------------------------------------------------------
# Q6 shape — forecast-revenue change: single-table scan + tight
# predicate + one global agg. The whole point at 100 TB is the scan:
# every predicate must reach the parquet reader (PushedFilters), the
# ReadSchema must be exactly the 4 touched columns, and the agg is a
# partial/final pair with a 1-row exchange. Plan test pins all three.
# ---------------------------------------------------------------------------

@_q(
    "forecast_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1999-01-01 00:00:00")
        & (F.col("l_shipdate") < "2000-01-01 00:00:00")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q22 shape — global-scalar decorrelation + NOT EXISTS: customers in
# selected segments with an above-average balance (average over the
# POSITIVE balances of those segments — a correlated scalar subquery
# in the original) with no RECENT order (none since 2001-01-01 — the
# dormant-account variant; the synthetic orders table covers every
# customer historically, so the unconditional form is empty).
# Catalyst plan:
# the scalar collapses to a 1-row aggregate broadcast into the filter,
# the NOT EXISTS to a left-anti join — no per-row subquery execution.
# ---------------------------------------------------------------------------

_Q22_SEGMENTS = ("BUILDING", "MACHINERY", "AUTOMOBILE")
_SEG_SQL = ", ".join(f"'{s}'" for s in _Q22_SEGMENTS)


@_q(
    "idle_rich_customers",
    f"""
WITH pos_avg AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS cents_sum,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM customer
  WHERE c_acctbal > 0.00 AND c_mktsegment IN ({_SEG_SQL})
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer, pos_avg
WHERE c_mktsegment IN ({_SEG_SQL})
  AND CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > cents_sum
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2001-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape. The segment-positive average is one scalar
    aggregate folded in by a 1-row cross join (broadcast by size);
    "never ordered" is a LEFT ANTI join on the order keys. Balance
    totals are exact integer cents, and the above-average test is the
    cross-multiplied integer form ``cents·n > Σcents`` — a raw double
    AVG's partial-sum association order is partition-dependent, so a
    balance within ulps of the mean could flip across runs."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*_Q22_SEGMENTS)
    )
    pos_avg = cust.filter(F.col("c_acctbal") > 0.00).agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
        .cast("long")
        .alias("cents_sum"),
        F.count(F.lit(1)).cast("long").alias("n_pos"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(pos_avg))
        .filter(
            F.round(F.col("c_acctbal") * 100).cast("long") * F.col("n_pos")
            > F.col("cents_sum")
        )
        .join(
            orders,
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("totacctbal_cents"),
        )
        .orderBy("c_mktsegment")
    )
