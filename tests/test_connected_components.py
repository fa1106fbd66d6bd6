"""Connected components (dedup cluster formation): known graphs,
including the long-path worst case that pointer jumping exists for."""

from __future__ import annotations

from redshift_etl_spark.operators.dedup import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df, **kw).collect()
    return {r.node: r.component for r in rows}


def test_two_components_and_clique(spark):
    got = _cc(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11)],  # triangle + disjoint pair
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # 30-node path: plain hash-min needs 29 rounds; pointer jumping
    # must finish well inside max_iter=8 (≈ log2 doubling per round)
    edges = [(i, i + 1) for i in range(30)]
    got = _cc(spark, edges, max_iter=8)
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_min_id_is_representative_regardless_of_edge_order(spark):
    got = _cc(spark, [(9, 5), (5, 7), (3, 7)])
    assert got == {3: 3, 5: 3, 7: 3, 9: 3}
