"""The primary correctness gate, run locally at sf0.01: every declared
query must match its DuckDB oracle twin (mimics the driver's
CORRECTNESS check — row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from redshift_etl_spark import queries as Q

from .conftest import SF_ORACLE
from .oracle_compare import compare

ALL = sorted(Q.all_oracles())


@pytest.mark.parametrize("name", ALL)
def test_oracle_parity(spark, duck, name):
    df = Q.all_queries()[name](spark, SF_ORACLE)
    compare(df, duck, Q.all_oracles()[name], name)


def test_every_query_has_oracle_or_is_documented():
    missing = set(Q.all_queries()) - set(Q.all_oracles())
    # queries without oracles get the driver's weaker rows-only check;
    # keep this list explicit and small
    assert missing == set(), f"queries without oracle twins: {missing}"
