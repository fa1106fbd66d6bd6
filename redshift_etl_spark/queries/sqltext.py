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
