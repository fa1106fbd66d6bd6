"""Guard: every oracle-backed catalog query is NON-VACUOUS on the
committed testdata — a green driver row on 0 rows proves the plan
compiles, not that the logic is right (the round-4 verdict's
`sole_source_parts` finding: its predicate matched nothing at any SF,
so its MATCH was meaningless).

The sweep runs each DuckDB oracle (no Spark session needed — the
driver separately proves Spark ≡ oracle, so oracle row counts stand in
for both sides) at sf0.01 AND sf0.001 and asserts > 0 rows, with an
explicit allowlist for queries whose predicate legitimately selects
nothing at the tiniest SF.
"""

import duckdb
import pytest

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Queries allowed to be empty at sf0.001 ONLY (must still be non-empty
# at sf0.01): volume_shipping's nation-pair x year slice has no
# qualifying rows in the 60k-row sample.
EMPTY_OK_SF0001 = {"volume_shipping"}


def _con(sf: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize(
    "sf",
    [
        "sf0.001",
        # the sf0.01 sweep doubles the cost for the same vacuity check;
        # slow tier only (the fast tier keeps the sf0.001 witness)
        pytest.param("sf0.01", marks=pytest.mark.slow),
    ],
)
def test_every_oracle_nonvacuous(sf):
    con = _con(sf)
    empty = []
    for name, sql in E.oracle_sql().items():
        n = con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
        if n == 0 and not (
            sf == "sf0.001" and name in EMPTY_OK_SF0001
        ):
            empty.append(name)
    assert not empty, (
        f"vacuously-green queries (0 rows at {sf}): {empty} — a MATCH "
        "on an empty result proves nothing; adjust the predicate or "
        "fixture so the logic is exercised."
    )


def test_empty_allowlist_is_tight():
    """The sf0.001 allowlist must not rot: entries must actually be
    empty there and non-empty at sf0.01."""
    c1, c2 = _con("sf0.001"), _con("sf0.01")
    for name in EMPTY_OK_SF0001:
        sql = E.oracle_sql()[name]
        assert c1.execute(
            f"SELECT COUNT(*) FROM ({sql})"
        ).fetchone()[0] == 0, f"{name} no longer empty at sf0.001"
        assert c2.execute(
            f"SELECT COUNT(*) FROM ({sql})"
        ).fetchone()[0] > 0, f"{name} vacuous at sf0.01 too"
