"""Iterative graph algorithms — PageRank with engine-exact arithmetic.

PageRank over a link graph is a canonical training-data quality signal
(CommonCrawl-style source weighting) and the canonical *iterative*
dataflow: rank(v) ← (1−d)/N + d·Σ_{u→v} rank(u)/outdeg(u), iterated.
The reference has no iterative operator at all (its closest shape is
the recursive plpgsql loop in SURVEY §2.6 territory); Spark expresses
each iteration as join + aggregate and the loop as plan composition.

Determinism contract (same discipline as `dedup.connected_components`
and the k-means codebook): ranks are scaled integers (``scale`` = 1e12
by default) and every step is integer arithmetic — ``rank div outdeg``
per edge, exact integer SUM per target, ``(num·Σ) div den`` damping.
Integer addition is associative/commutative, so the result is
bit-identical across engines, partitionings, and retries — which is
what lets a DuckDB oracle (same recurrence unrolled as CTEs, built by
`pagerank_oracle_sql` from the SAME constants) hash-match exactly.
Float PageRank cannot make that promise: double summation order
differs per shuffle.

Dangling mass: nodes with no out-edges leak their rank (no
redistribution), the common simplification when the graph is built
symmetric (every node then has outdegree ≥ 1, so nothing actually
leaks). Callers wanting classic dangling redistribution should add
reverse edges or a sink node explicitly.

Scale posture: per iteration one shuffle to aggregate contributions on
``dst`` plus a join of the (|V|-sized) rank frame against edges on
``src`` — AQE broadcasts the rank frame automatically when |V| is
small relative to |E|. The loop `localCheckpoint`s every
``checkpoint_every`` rounds (materializing |V| rows each round costs
more than a few extra plan levels), so plan depth is bounded at
``checkpoint_every`` for long runs; at a 100 TB edge list you'd
pre-partition edges by ``src`` once and reuse that layout every round
(the join key never changes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "symmetric_edges",
    "pagerank",
    "personalized_pagerank",
    "pagerank_oracle_sql",
    "triangle_count",
    "k_core",
]

_SCALE = 10**12
_NUM, _DEN = 85, 100  # damping d = 0.85 as an exact rational


def symmetric_edges(
    df: DataFrame,
    src: Column | str,
    dst: Column | str,
    disjoint_domains: bool = False,
) -> DataFrame:
    """Distinct undirected edge set as two directed rows (u→v, v→u);
    guarantees outdeg ≥ 1 for every node so no rank mass dangles.

    ``disjoint_domains=True`` is a caller promise that src and dst ids
    can never collide (a bipartite graph, e.g. customers vs offset
    supplier keys): then fwd ∩ reversed = ∅ by construction, so the
    dedup runs on the HALF-sized forward list and the union is
    map-only — one shuffle of |E| instead of one of 2|E|. Same set
    either way."""
    s = F.col(src) if isinstance(src, str) else src
    d = F.col(dst) if isinstance(dst, str) else dst
    fwd = df.select(s.alias("src"), d.alias("dst"))
    rev = F.col("dst").alias("src"), F.col("src").alias("dst")
    if disjoint_domains:
        fwd = fwd.distinct()
        return fwd.union(fwd.select(*rev))
    return fwd.union(fwd.select(*rev)).distinct()


def _pagerank_loop(
    edges: DataFrame,
    init_col,
    base_col,
    iterations: int,
    damping: tuple[int, int],
    checkpoint_every: int,
    uniform_init: bool = False,
    symmetric: bool = False,
):
    """Shared exact-integer PageRank iteration: callers supply the
    restart vector as two column builders over ``node`` (uniform for
    `pagerank`, source-masked for `personalized_pagerank`); everything
    else — loop-invariant caching, cardinality-gated broadcasts,
    periodic checkpoints — lives once, here.

    Two structure flags cut joins when the caller can promise them:
    ``uniform_init`` (rank₀ is the same constant everywhere, true for
    plain PageRank) lets iteration 1 read contributions straight off
    the edge⋈degree frame — joining ranks there would join against a
    constant. ``symmetric`` (every node has an in-edge, guaranteed by
    `symmetric_edges`) makes the per-iteration nodes LEFT JOIN
    redundant: the contribution aggregate already covers every node,
    so ranks update directly from it. Together they drop 4 of the 6
    joins in a 3-iteration run with identical integer results."""
    num, den = damping
    # The edge list is typically an upstream join + distinct (e.g. the
    # trade graph's orders ⋈ lineitem); THREE derivations consume it
    # (outdegrees, the node set, the cached edge⋈degree frame), so
    # materialize it first — one computation instead of three. This is
    # the "pre-partition/materialize edges once" layout the module
    # docstring prescribes for the 100 TB case.
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # nodes and (edges ⋈ outdeg) are loop-invariant and re-read every
    # iteration — materialize once, LAZILY (r14): the count() below is
    # the first action and materializes edges AND nodes in one job,
    # where the eager spelling ran two blocking checkpoint jobs and
    # then a third for the count
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # one scalar job; the graph's node count
    ranks = nodes.select("node", init_col(n).cast("long").alias("rank"))
    # broadcast the |V|-sized frames only when |V| is MEASURED small
    # (n is already computed above) — a hint gated on actual
    # cardinality, never a forced broadcast of an unbounded frame; at
    # web-graph |V| both joins fall back to shuffles on the key, the
    # classic partition-by-vertex layout
    small = n <= 1_000_000
    edeg = edges.join(deg, "src")
    if small:
        # dst-partition the loop-invariant frame ONCE (r13, guide
        # §2.4): on the broadcast-ranks path every iteration ends in a
        # groupBy(dst) agg, and a broadcast join preserves its child's
        # partitioning — so pre-partitioning the checkpointed frame by
        # dst removes one |E|-row exchange PER ITERATION (the
        # LogicalRDD keeps the partitioning across localCheckpoint).
        # Big graphs keep the plain layout: their per-iteration ranks
        # join shuffles edeg by src anyway, so a dst layout would only
        # add a setup exchange.
        par = edges.sparkSession.sparkContext.defaultParallelism
        edeg = edeg.repartition(par, "dst")
    edeg = edeg.localCheckpoint(eager=False)
    for i in range(iterations):
        if i == 0 and uniform_init:
            # rank₀ is one constant — contributions come straight off
            # the cached edge⋈degree frame, no ranks join at all
            contrib = (
                edeg.withColumn(
                    "__r0", init_col(n).cast("long")
                )
                .select(
                    F.col("dst").alias("node"),
                    F.expr("__r0 div outdeg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
        else:
            r_side = F.broadcast(ranks) if small else ranks
            contrib = (
                r_side.join(edeg, ranks.node == edeg.src)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank div outdeg").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
        new_rank = (
            base_col(n)
            + F.expr(f"({num} * coalesce(inflow, 0)) div {den}")
        ).cast("long")
        if symmetric:
            # every node has an in-edge, so contrib IS node-complete;
            # the nodes left join (and its broadcast) would be a no-op
            ranks = contrib.select("node", new_rank.alias("rank"))
        else:
            c_side = F.broadcast(contrib) if small else contrib
            ranks = nodes.join(c_side, "node", "left").select(
                "node", new_rank.alias("rank")
            )
        # checkpoint periodically, not per round: materializing |V|
        # rows every iteration costs more than a few extra plan levels;
        # every `checkpoint_every` rounds still bounds plan depth and
        # lineage for long runs
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = _SCALE,
    damping: tuple[int, int] = (_NUM, _DEN),
    checkpoint_every: int = 5,
    symmetric: bool = False,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list (columns
    ``src``, ``dst``). Returns (node, rank) with rank in units of
    1/``scale``; Σ ranks ≈ scale (minus integer-division remainders,
    which are themselves deterministic). Pass ``symmetric=True`` when
    the edge list came from `symmetric_edges` (every node then has an
    in-edge) to skip the per-iteration node-completion join — same
    integers, fewer joins."""
    num, den = damping
    return _pagerank_loop(
        edges,
        init_col=lambda n: F.lit(scale // n),
        base_col=lambda n: F.lit(((den - num) * (scale // n)) // den),
        iterations=iterations,
        damping=damping,
        checkpoint_every=checkpoint_every,
        uniform_init=True,
        symmetric=symmetric,
    )


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 3,
    scale: int = _SCALE,
    damping: tuple[int, int] = (_NUM, _DEN),
) -> str:
    """The identical recurrence as unrolled ANSI CTEs (DuckDB oracle):
    ``edges_sql`` must yield columns (src, dst). Built from the same
    constants as `pagerank`, so the integers match bit-for-bit."""
    num, den = damping
    parts = [
        f"WITH edges AS ({edges_sql})",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT src AS node FROM edges UNION "
        "SELECT dst FROM edges)",
        "n AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({scale} // n AS BIGINT) AS rank "
        "FROM nodes CROSS JOIN n)",
    ]
    base = f"(({den - num}) * ({scale} // n)) // {den}"
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"{cur} AS (SELECT nodes.node, CAST({base} + "
            f"({num} * COALESCE(c.inflow, 0)) // {den} AS BIGINT) AS rank "
            "FROM nodes CROSS JOIN n LEFT JOIN ("
            "SELECT e.dst AS node, SUM(pr.rank // d.outdeg) AS inflow "
            f"FROM edges e JOIN {prev} pr ON pr.node = e.src "
            "JOIN deg d ON d.src = e.src GROUP BY e.dst"
            ") c ON c.node = nodes.node)"
        )
    body = ",\n".join(parts)
    return (
        body
        + f"\nSELECT node, rank FROM r{iterations} "
        "ORDER BY rank DESC, node ASC"
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: list,
    iterations: int = 3,
    scale: int = _SCALE,
    damping: tuple[int, int] = (_NUM, _DEN),
    checkpoint_every: int = 5,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns only to ``sources``
    instead of uniformly — rank becomes proximity to the source set
    (the similar-nodes / recommendation primitive). Same exact-integer
    recurrence as `pagerank` (shared `_pagerank_loop`); only the
    restart vector differs: init = scale/|S| on sources (0 elsewhere)
    and the per-iteration base term likewise lands on sources only.
    ``sources`` deduplicates, and ids absent from the graph raise —
    silently accepting them would shrink (or zero) the teleport mass."""
    num, den = damping
    srcs = sorted(set(sources))
    if not srcs:
        raise ValueError("sources must be non-empty")
    present = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .filter(F.col("node").isin(srcs))
        .distinct()
        .count()
    )
    if present != len(srcs):
        raise ValueError(
            f"{len(srcs) - present} source id(s) not present in the graph"
        )
    s_count = len(srcs)
    init = scale // s_count
    base = ((den - num) * init) // den
    is_src = F.col("node").isin(srcs)
    return _pagerank_loop(
        edges,
        init_col=lambda n: F.when(is_src, F.lit(init)).otherwise(F.lit(0)),
        base_col=lambda n: F.when(is_src, F.lit(base)).otherwise(F.lit(0)),
        iterations=iterations,
        damping=damping,
        checkpoint_every=checkpoint_every,
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global and per-node triangle counts over an undirected edge set
    (directed duplicates/self-loops tolerated — canonicalized first).

    Edges orient LOW-DEGREE → HIGH-DEGREE endpoint (id tiebreak) — the
    actual standard skew trick: every node's out-degree is then at most
    O(√m), so the wedge self-join fan-out is O(m^1.5) even on power-law
    graphs (orienting by raw id gives no such bound: a low-id hub keeps
    its full degree). Wedges (v ← u → w) with v ordered before w close
    against the oriented edge (v → w); each triangle is enumerated
    exactly once because all three of its edges are consistently
    oriented by the same total order. Returns (node, triangles); the
    global count is Σ/3."""
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    keyed = canon.join(da, "a").join(db, "b")
    # total order key (degree, id) per endpoint; orient from lower key
    lo_first = F.struct(F.col("da"), F.col("a")) < F.struct(
        F.col("db"), F.col("b")
    )
    oriented = keyed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    e1 = oriented.select(
        F.col("u").alias("x"),
        F.col("v").alias("y"),
        F.col("dv").alias("dy"),
    )
    e2 = oriented.select(
        F.col("u").alias("x"),
        F.col("v").alias("z"),
        F.col("dv").alias("dz"),
    )
    wedges = e1.join(e2, "x").filter(
        F.struct(F.col("dy"), F.col("y")) < F.struct(F.col("dz"), F.col("z"))
    )
    closure = oriented.select(
        F.col("u").alias("y"), F.col("v").alias("z")
    )
    tri = wedges.join(closure, ["y", "z"]).select("x", "y", "z")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )


def k_core(edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """The k-core: the maximal subgraph where every node has degree ≥ k
    (undirected; input direction/duplicates canonicalized away). The
    classic link-graph curation signal — spam farms and orphan pages
    fall out of low cores, dense genuine neighborhoods survive.

    Iterative peel: drop all nodes with degree < k, recompute, repeat
    to fixpoint. Each round is one degree aggregate + two semi-joins —
    no global sort, no driver-side data; only the per-round convergence
    COUNT rides the driver (same control-flow shape as
    `dedup.connected_components`). Rounds are bounded by the graph's
    degeneracy ordering depth, in practice a handful; ``max_rounds``
    is a runaway backstop. Returns the surviving canonical edge set
    (a, b) with a < b."""
    cur = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    before = cur.count()
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .union(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        nxt = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
        after = nxt.count()
        cur = nxt
        if after == before or after == 0:
            break
        before = after
    return cur


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row graph profile — the ANALYZE of the graph toolkit:
    (n_nodes, n_edges, max_degree, avg_degree, n_triangles,
    n_components). Degree stats from one aggregate over the canonical
    undirected edge set; triangles via `triangle_count` (degree-
    oriented wedges); components via `dedup.connected_components`
    (hash-min propagation). The pre-flight a pipeline owner reads
    before pointing PageRank/k-core at an unfamiliar edge dump."""
    from .dedup import connected_components

    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("deg").alias("max_degree"),
        F.avg("deg").alias("avg_degree"),
    ).collect()[0]
    n_edges = canon.count()
    tri = triangle_count(canon.select(F.col("a").alias("src"),
                                      F.col("b").alias("dst")))
    n_tri = (tri.agg(F.sum("triangles")).collect()[0][0] or 0) // 3
    comp = connected_components(
        canon.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        "src",
        "dst",
    )
    n_comp = comp.select("component").distinct().count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [
            (
                int(d["n_nodes"]),
                int(n_edges),
                int(d["max_degree"]),
                float(d["avg_degree"]),
                int(n_tri),
                int(n_comp),
            )
        ],
        "n_nodes long, n_edges long, max_degree long, avg_degree double, "
        "n_triangles long, n_components long",
    )


def label_propagation(
    edges: DataFrame, iterations: int = 3, checkpoint_every: int = 4
) -> DataFrame:
    """Synchronous label-propagation community detection over a
    symmetric edge set (`symmetric_edges`): every node starts labeled
    with its own id; each round it adopts the most frequent label among
    its neighbors, ties broken by the SMALLEST label — so the update is
    a pure function of the graph and the whole run is bit-identical
    across engines, partitionings, and reruns (the same determinism
    discipline as `pagerank`; classic LPA's random tie-break is exactly
    what this replaces). Fixed iteration count, not convergence-polled:
    synchronous LPA can oscillate on bipartite structure, and a bounded
    unrolled recurrence is what an exact cross-engine oracle can
    replay.

    Per round: one join (edges ⋈ labels on src — at scale,
    pre-partition both by the join key once and every round reuses the
    layout) + one hash agg per (dst, label) + one min-struct agg per
    dst. localCheckpoint bounds plan depth like the other iterative
    operators.

    Returns (node, label)."""
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for i in range(iterations):
        counts = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("n2"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # min of (-cnt, lbl) = the most frequent label, smallest on ties
        labels = (
            counts.groupBy(F.col("n2").alias("node"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("neg"), F.col("lbl")
                    )
                ).alias("m")
            )
            .select("node", F.col("m.lbl").alias("lbl"))
        )
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def label_propagation_oracle_sql(edges_sql: str, iterations: int = 3) -> str:
    """DuckDB twin: the same recurrence unrolled as CTEs (row_number
    with (cnt DESC, lbl ASC) ≡ the min-struct pick)."""
    ctes = [
        f"e AS ({edges_sql})",
        "l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""c{i + 1} AS (
  SELECT e.dst AS node, l.lbl, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM e JOIN l{i} l ON e.src = l.node GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""l{i + 1} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl, row_number() OVER (
      PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rk
    FROM c{i + 1}
  ) WHERE rk = 1
)"""
        )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes\n"
        f"FROM l{iterations} GROUP BY lbl"
    )


def negative_edge_sample(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    dst_nodes: DataFrame,
    k: int = 3,
    probes: int = 16,
) -> DataFrame:
    """Deterministic negative-edge sampling for link-prediction
    training data — per source node, up to ``k`` destination nodes it
    has NO edge to, chosen by hashing rather than RNG so the negatives
    are stable across reruns, engines, and partitionings (the
    md5-bucket sampling discipline applied to non-edges).

    Mechanism: destinations land in B ≈ |D| hash buckets (B = the next
    power of two above the destination count, so occupancy ≈ 1); each
    source probes ``probes`` bucket addresses derived from
    md5(src, probe_i); bucket hits become candidates, true edges are
    anti-joined away, and the first ``k`` survivors per source (by
    probe order, then destination id) are the sample. Misses (empty
    buckets) and edge hits are WHY probes > k: with occupancy ~1 and
    sparse graphs, E[hits] ≈ probes·(1−e⁻¹) — size ``probes``
    accordingly; sources can return fewer than k (reported as absent
    rows, never padded).

    Scale shape: |D| is the one collected scalar (a count); the
    bucket table is ~1 row per bucket; probing is an equi-join on the
    bucket address with ~occupancy fan-out (≈ probes rows per source,
    LINEAR in sources — never a cross join against the destination
    set); the anti-join shuffles on the edge key; the final per-source
    top-k window is probe-bounded. Returns (src, dst, probe_i, rank),
    rank 1..≤k."""
    from pyspark.sql import Window

    from .sampling import hash_bucket16

    n_dst = dst_nodes.count()
    b_bits = max(1, (max(1, n_dst - 1)).bit_length())
    b = 1 << b_bits
    # two composed 16-bit md5 buckets = a 32-bit address space; B is a
    # power of two <= 2^32, so the modulo keeps both halves' bits
    if b > (1 << 32):
        raise ValueError(
            "negative_edge_sample: >2^32 buckets — compose a third hash"
        )

    def bucket32(key, salt: str):
        return (
            hash_bucket16(key, salt) * 65536 + hash_bucket16(key, salt + "2")
        ) % b

    dst_b = dst_nodes.select(
        F.col(dst_col).alias("__d"),
        bucket32(dst_col, "negd").alias("__bkt"),
    )
    srcs = edges.select(F.col(src_col).alias("__s")).distinct()
    probe = srcs.select(
        "__s", F.explode(F.array(*[F.lit(i) for i in range(probes)])).alias("__i")
    )
    probe = probe.withColumn(
        "__bkt",
        bucket32(
            F.concat(F.col("__s").cast("string"), F.lit(":"), F.col("__i")),
            "negp",
        ),
    )
    cand = probe.join(dst_b, "__bkt").select("__s", "__i", "__d")
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).distinct()
    non_edges = cand.join(e, ["__s", "__d"], "left_anti")
    first_probe = non_edges.groupBy("__s", "__d").agg(
        F.min("__i").cast("long").alias("probe_i")
    )
    w = Window.partitionBy("__s").orderBy(
        F.col("probe_i").asc(), F.col("__d").asc()
    )
    return (
        first_probe.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__s").alias(src_col),
            F.col("__d").alias(dst_col),
            "probe_i",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hits_scores(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 2,
    scale: int = 10**6,
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs & authorities (Kleinberg 1999) — the second classic
    link-analysis scorer beside :func:`pagerank`: a node is a good
    AUTHORITY if good hubs point at it, a good HUB if it points at
    good authorities. On a bipartite interaction graph
    (customer→product, query→document) the two sides get separately
    meaningful scores, which PageRank's single score conflates.

    Engine-exact arithmetic (the pagerank discipline, adapted):
    scores are ``scale``-scaled integers; each half-iteration is an
    exact integer SUM over edges followed by L∞ normalization
    ``(x·scale) DIV max`` — integral ops only, so results are
    bit-identical across engines/partitionings and the DuckDB twin
    can hash-match. (L∞ instead of the classic L2: normalization
    choice rescales but never reorders a power iteration, and it
    keeps the arithmetic integer-exact; float L2 cannot promise
    cross-engine equality.) Overflow bound: Σ_deg·scale·scale must
    fit int64 — at the default 1e6 scale that is ~9e6 total weighted
    degree per node set; raise to the DECIMAL spelling before raising
    ``scale`` or crossing ~10⁹-edge hubs.

    Per half-iteration: one edge equi-join + one hash agg + a 1-row
    max (bounded scalar). Returns (hubs, authorities) DataFrames:
    (node, score) each, scores in [0, scale] with at least one node
    at exactly ``scale``."""
    if int(iters) < 1:
        raise ValueError(f"hits_scores: iters must be >= 1, got {iters}")
    e = (
        edges.select(
            F.col(src_col).alias("__u"), F.col(dst_col).alias("__v")
        )
        # NULL endpoints never match the score equi-joins — they'd leave
        # phantom nodes whose agg is empty (max=None) — drop them here
        .where(F.col("__u").isNotNull() & F.col("__v").isNotNull())
        .distinct()
    )
    h = e.select("__u").distinct().withColumn(
        "__h", F.lit(int(scale)).cast("long")
    )
    a = None
    for _ in range(int(iters)):
        a_raw = (
            e.join(h, "__u")
            .groupBy("__v")
            .agg(F.sum("__h").cast("long").alias("__a"))
        )
        max_a = a_raw.agg(F.max("__a")).collect()[0][0]
        # empty edge set surfaces here as an empty agg (max=None) — the
        # DIV literal would crash with an opaque int(None). Detected
        # from the iteration's OWN 1-row agg (which runs regardless)
        # instead of an eager isEmpty() probe, so the degenerate-case
        # guard costs zero extra Spark jobs on the hot path (ADVICE r11).
        if max_a is None:
            raise ValueError(
                "hits_scores: empty edge set (no non-null edges)"
            )
        a = a_raw.select(
            "__v",
            F.expr(f"CAST(__a * {int(scale)}L DIV {int(max_a)}L AS LONG)").alias(
                "__a"
            ),
        ).localCheckpoint()
        h_raw = (
            e.join(a, "__v")
            .groupBy("__u")
            .agg(F.sum("__a").cast("long").alias("__h"))
        )
        max_h = h_raw.agg(F.max("__h")).collect()[0][0]
        h = h_raw.select(
            "__u",
            F.expr(f"CAST(__h * {int(scale)}L DIV {int(max_h)}L AS LONG)").alias(
                "__h"
            ),
        ).localCheckpoint()
    hubs = h.select(F.col("__u").alias("node"), F.col("__h").alias("score"))
    auths = a.select(F.col("__v").alias("node"), F.col("__a").alias("score"))
    return hubs, auths
