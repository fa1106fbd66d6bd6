"""negative_edge_sample — the contract: every sampled pair is a true
non-edge, at most k per source with no duplicate destinations, and the
sample is deterministic under repartitioning."""

from __future__ import annotations

from redshift_etl_spark.operators.graph import negative_edge_sample


def _graph(spark):
    edges = spark.createDataFrame(
        [(u, d) for u in range(20) for d in range(u % 5, 40, 7)],
        "s: long, d: long",
    )
    dsts = spark.createDataFrame([(d,) for d in range(40)], "d: long")
    return edges, dsts


def test_samples_are_nonedges_capped_and_unique(spark):
    edges, dsts = _graph(spark)
    out = negative_edge_sample(edges, "s", "d", dsts, k=3, probes=16).collect()
    true_edges = {(r["s"], r["d"]) for r in edges.collect()}
    per_src: dict = {}
    for r in out:
        assert (r["s"], r["d"]) not in true_edges
        assert 1 <= r["rank"] <= 3
        per_src.setdefault(r["s"], []).append(r["d"])
    assert per_src, "no negatives sampled at all"
    for s, ds in per_src.items():
        assert len(ds) == len(set(ds)) <= 3


def test_deterministic_under_repartitioning(spark):
    edges, dsts = _graph(spark)
    a = sorted(
        map(
            tuple,
            negative_edge_sample(edges, "s", "d", dsts, k=3).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            negative_edge_sample(
                edges.repartition(13), "s", "d", dsts.repartition(7), k=3
            ).collect(),
        )
    )
    assert a == b
