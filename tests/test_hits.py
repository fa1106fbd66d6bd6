"""hits_scores — semantics on a planted graph: the hub that points at
everything and the authority everyone points at win; integer scores
are partitioning-deterministic; scale normalization lands max at
exactly `scale`."""

from __future__ import annotations

import pytest

from redshift_etl_spark.operators.graph import hits_scores


def _planted(spark):
    # u0 points at ALL of v0..v4 (super-hub); v0 is pointed at by ALL
    # of u0..u3 (super-authority); the rest is sparse
    edges = [(0, v) for v in range(5)] + [(u, 0) for u in range(4)] + [
        (1, 1),
        (2, 2),
        (3, 3),
    ]
    return spark.createDataFrame(edges, "u: long, v: long")


def test_planted_hub_and_authority_win(spark):
    hubs, auths = hits_scores(_planted(spark), "u", "v", iters=2)
    h = {r["node"]: r["score"] for r in hubs.collect()}
    a = {r["node"]: r["score"] for r in auths.collect()}
    assert max(h, key=h.get) == 0 and h[0] == 10**6
    assert max(a, key=a.get) == 0 and a[0] == 10**6
    assert all(0 <= s <= 10**6 for s in list(h.values()) + list(a.values()))


@pytest.mark.slow
def test_deterministic_under_repartitioning(spark):
    e = _planted(spark)
    h1, a1 = hits_scores(e, "u", "v", iters=2)
    h2, a2 = hits_scores(e.repartition(7), "u", "v", iters=2)
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h2.collect()))
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_hits_refuses_empty_edges_and_zero_iters(spark):
    """Empty or all-NULL edge sets and iters<1 must fail with a clear
    ValueError, not an opaque int(None) TypeError / a=None return
    (r10 ADVICE, graph.py)."""
    import pytest

    from redshift_etl_spark.operators.graph import hits_scores

    empty = spark.createDataFrame([], "s string, d string")
    with pytest.raises(ValueError, match="empty edge set"):
        hits_scores(empty, "s", "d")
    nulls = spark.createDataFrame(
        [(None, "x"), ("y", None)], "s string, d string"
    )
    with pytest.raises(ValueError, match="empty edge set"):
        hits_scores(nulls, "s", "d")
    some = spark.createDataFrame([("a", "b")], "s string, d string")
    with pytest.raises(ValueError, match="iters"):
        hits_scores(some, "s", "d", iters=0)
