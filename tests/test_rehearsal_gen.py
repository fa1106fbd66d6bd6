"""Scale-rehearsal generator contracts: replica key offsets stay
FK-consistent across tables, replica counts are exact, and document
text stays near-dup (not exact-dup) across replicas."""

from __future__ import annotations

import pathlib

import duckdb
import pytest

from scripts.scale_rehearsal import OFF, OUT, REPLICAS, SRC, generate

pytestmark = pytest.mark.skipif(
    not pathlib.Path(SRC).exists(), reason="testdata absent"
)


@pytest.fixture(scope="module")
def big():
    if not pathlib.Path(f"{OUT}/lineitem.parquet").exists():
        generate()
    return OUT


def test_replica_counts_and_key_ranges(big):
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT COUNT(*) FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    n_big, k = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT o_orderkey) "
        f"FROM '{big}/orders.parquet'"
    ).fetchone()
    assert n_big == REPLICAS * n_src
    assert k == n_big  # offsets never collide


def test_fk_consistency_survives_offsets(big):
    con = duckdb.connect()
    # every replicated order still points at an existing customer
    orphans = con.execute(
        f"""SELECT COUNT(*) FROM '{big}/orders.parquet' o
            WHERE NOT EXISTS (SELECT 1 FROM '{big}/customer.parquet' c
                              WHERE c.c_custkey = o.o_custkey)"""
    ).fetchone()[0]
    assert orphans == 0
    # and each order's replica index matches its customer's
    cross = con.execute(
        f"""SELECT COUNT(*) FROM '{big}/orders.parquet'
            WHERE (o_orderkey // {OFF}) <> (o_custkey // {OFF})"""
    ).fetchone()[0]
    assert cross == 0


def test_documents_near_dup_not_exact(big):
    con = duckdb.connect()
    n, distinct_text = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT text) FROM '{big}/documents.parquet'"
    ).fetchone()
    src_distinct = con.execute(
        f"SELECT COUNT(DISTINCT text) FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    # replica tagging keeps every copy textually distinct: the only
    # exact dups at sfbig are the ones already present at sf0.1
    assert distinct_text == n - (
        con.execute(
            f"SELECT COUNT(*) FROM '{SRC}/documents.parquet'"
        ).fetchone()[0]
        - src_distinct
    )
    # n_chars stays consistent with the tagged text
    bad = con.execute(
        f"SELECT COUNT(*) FROM '{big}/documents.parquet' "
        f"WHERE length(text) <> n_chars"
    ).fetchone()[0]
    assert bad == 0
