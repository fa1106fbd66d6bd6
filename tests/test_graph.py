"""PageRank (operators/graph.py): recurrence correctness vs a local
reference implementation, partitioning invariance, mass accounting,
and the symmetric-edge guarantee."""

from __future__ import annotations

import pyspark.sql.functions as F

from redshift_etl_spark.operators import graph as G

SCALE = 10**12


def _edges(spark, n_parts=4):
    # two triangles bridged by one edge + a pendant node
    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    df = spark.createDataFrame(raw, "src long, dst long")
    return G.symmetric_edges(df, "src", "dst").repartition(n_parts)


def _reference(edges_rows, iterations):
    """The same integer recurrence, plain Python."""
    from collections import defaultdict

    out = defaultdict(list)
    nodes = set()
    for s, d in edges_rows:
        out[s].append(d)
        nodes.update((s, d))
    n = len(nodes)
    init = SCALE // n
    base = (15 * init) // 100
    rank = {v: init for v in nodes}
    for _ in range(iterations):
        inflow = defaultdict(int)
        for s, targets in out.items():
            c = rank[s] // len(targets)
            for d in targets:
                inflow[d] += c
        rank = {v: base + (85 * inflow[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_reference(spark):
    e = _edges(spark)
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    want = _reference(rows, 3)
    got = {r["node"]: r["rank"] for r in G.pagerank(e, 3).collect()}
    assert got == want


def test_partitioning_invariant(spark):
    a = {tuple(r) for r in G.pagerank(_edges(spark, 1), 2).collect()}
    b = {tuple(r) for r in G.pagerank(_edges(spark, 13), 2).collect()}
    assert a == b


def test_mass_conserved_up_to_rounding(spark):
    e = _edges(spark)
    n = 7
    total = (
        G.pagerank(e, 3).agg(F.sum("rank").alias("t")).collect()[0]["t"]
    )
    # integer floors only ever LOSE mass, and at most a few units per
    # node per iteration term
    assert total <= SCALE
    assert total >= SCALE - 3 * (n * (n + 100))


def test_symmetric_edges_no_dangling(spark):
    e = _edges(spark)
    srcs = {r["src"] for r in e.select("src").distinct().collect()}
    dsts = {r["dst"] for r in e.select("dst").distinct().collect()}
    assert srcs == dsts  # every node has outdegree >= 1


def test_oracle_sql_agrees_with_engine(spark, duck):
    # the generated CTE recurrence IS the operator's contract: run it
    # on the same edge list ad-hoc in DuckDB and compare exactly
    e = _edges(spark)
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    vals = ", ".join(f"({s}, {d})" for s, d in rows)
    sql = G.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iterations=3
    )
    want = {(r[0], r[1]) for r in duck.execute(sql).fetchall()}
    got = {tuple(r) for r in G.pagerank(e, 3).collect()}
    assert got == want


def test_personalized_pagerank_matches_reference_and_localizes(spark):
    e = _edges(spark)
    rows = [(r["src"], r["dst"]) for r in e.collect()]
    from collections import defaultdict

    from redshift_etl_spark.operators.graph import personalized_pagerank

    out = defaultdict(list)
    nodes = set()
    for s, d in rows:
        out[s].append(d)
        nodes.update((s, d))
    srcs = [1]
    init = SCALE // len(srcs)
    base = (15 * init) // 100
    rank = {v: (init if v in srcs else 0) for v in nodes}
    for _ in range(3):
        inflow = defaultdict(int)
        for s, ts in out.items():
            c = rank[s] // len(ts)
            for d in ts:
                inflow[d] += c
        rank = {
            v: (base if v in srcs else 0) + (85 * inflow[v]) // 100
            for v in nodes
        }
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, srcs, 3).collect()
    }
    assert got == rank
    # proximity: nodes in source's triangle outrank the far triangle
    near = got[2] + got[3]
    far = got[5] + got[6]
    assert near > far


def test_triangle_count_matches_brute_force(spark):
    from itertools import combinations

    from redshift_etl_spark.operators.graph import triangle_count

    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (2, 1), (6, 6),
           (5, 4)]
    df = spark.createDataFrame(raw, "src long, dst long")
    und = {tuple(sorted(e)) for e in raw if e[0] != e[1]}
    nodes = {v for e in und for v in e}
    want = {v: 0 for v in nodes}
    n_tri = 0
    for a, b, c in combinations(sorted(nodes), 3):
        if {(a, b), (b, c), (a, c)} <= und:
            n_tri += 1
            for v in (a, b, c):
                want[v] += 1
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {v: c for v, c in want.items() if c > 0}
    total = sum(got.values())
    assert total == 3 * n_tri and n_tri == 2  # (1,2,3) and (3,4,5)


def test_k_core_matches_reference_peel(spark):
    from collections import defaultdict

    from redshift_etl_spark.operators.graph import k_core

    # two triangles sharing node 3 + a path tail: 2-core = the triangles
    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3),
           (5, 6), (6, 7), (7, 8)]
    df = spark.createDataFrame(raw, "src long, dst long")

    und = {tuple(sorted(e)) for e in raw}
    while True:
        deg = defaultdict(int)
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        drop = {v for v, d in deg.items() if d < 2}
        nxt = {e for e in und if drop.isdisjoint(e)}
        if nxt == und:
            break
        und = nxt
    got = {tuple(r) for r in k_core(df, 2).collect()}
    assert got == und
    assert got == {(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)}
    # 3-core of this graph is empty
    assert k_core(df, 3).count() == 0


def test_triangle_count_star_graph_skew_shape(spark):
    """Low-id hub star: zero triangles, and with degree orientation all
    edges point INTO the hub, so the hub's out-degree — the wedge
    fan-out driver — is 0 (orienting by id would give it n−1)."""
    from redshift_etl_spark.operators.graph import triangle_count

    n = 500
    df = spark.createDataFrame(
        [(0, i) for i in range(1, n + 1)], "src long, dst long"
    )
    assert triangle_count(df).count() == 0


def test_graph_stats_profile(spark):
    from redshift_etl_spark.operators.graph import graph_stats

    # two triangles bridged (one component) + one disjoint edge
    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (8, 9), (2, 1)]
    df = spark.createDataFrame(raw, "src long, dst long")
    r = graph_stats(df).collect()[0]
    assert r["n_nodes"] == 7 and r["n_edges"] == 7
    assert r["max_degree"] == 4  # node 3
    assert abs(r["avg_degree"] - 2 * 7 / 7) < 1e-9
    assert r["n_triangles"] == 2
    assert r["n_components"] == 2


def test_label_propagation_finds_planted_communities(spark):
    from redshift_etl_spark.operators import graph as G

    # two dense cliques joined by one weak bridge
    clique_a = [(a, b) for a in range(5) for b in range(5) if a < b]
    clique_b = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    bridge = [(4, 10)]
    df = spark.createDataFrame(clique_a + clique_b + bridge, ["src", "dst"])
    edges = G.symmetric_edges(df, "src", "dst")
    labels = {
        r["node"]: r["lbl"]
        for r in G.label_propagation(edges, iterations=3).collect()
    }
    a_labels = {labels[n] for n in range(5)}
    b_labels = {labels[n] for n in range(10, 15)}
    assert a_labels == {0}          # clique A converges to min label 0
    assert b_labels == {10}         # clique B keeps its own min label
    # deterministic under repartitioning
    labels2 = {
        r["node"]: r["lbl"]
        for r in G.label_propagation(
            G.symmetric_edges(df.repartition(7), "src", "dst"), 3
        ).collect()
    }
    assert labels == labels2
