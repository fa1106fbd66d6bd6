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


# queries deliberately without oracle twins (driver records rows-only):
# sketch-based ops whose algorithm differs from any oracle by design,
# and zlib compression which no SQL engine can replicate (value-level
# coverage lives in pytest against local zlib instead)
ROWS_ONLY_OK = {"approx_distinct", "compression_signals"}


def test_every_query_has_oracle_or_is_documented():
    missing = set(Q.all_queries()) - set(Q.all_oracles())
    assert missing == ROWS_ONLY_OK, f"undocumented rows-only queries: {missing - ROWS_ONLY_OK}"
