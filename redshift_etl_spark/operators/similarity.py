"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed variant
(random-hyperplane signatures) is the 100 TB scale path: it prunes the
candidate set per query to one bucket's worth of vectors before the
exact rescoring, turning O(|Q|·|C|) into O(|Q|·bucket).

Arithmetic policy: embeddings are float32 on disk; all math is done in
double (exact float→double widening) with a left-fold accumulation
(`F.aggregate`), and cosine is rounded to 6 decimals so results are
comparable across engines.

The "random" hyperplanes are derived deterministically from md5 — no RNG
state, reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column, dims: int | None = None) -> Column:
    """Σ a_i·b_i in double, accumulated strictly left-to-right (so the
    result is bit-identical to any sequential-fold implementation).

    With ``dims`` known, the sum is unrolled into a static left-assoc
    Add chain — whole-stage-codegen compiles it; the lambda-fold
    fallback is interpreted per element (~10× slower in the hot path).
    """
    if dims is not None:
        # Per-element scalar casts, NOT a whole-array cast: Catalyst
        # inlines projected expressions, so `cast(array<double>)` would
        # re-cast the full array once per element access (O(dims²)).
        terms = [
            F.get(a, i).cast("double") * F.get(b, i).cast("double")
            for i in range(dims)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, dims: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dims))


def cosine(a: Column, b: Column, dims: int | None = None) -> Column:
    return dot(a, b, dims) / (l2_norm(a, dims) * l2_norm(b, dims))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    dims: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine, excluding self-matches.

    The query side is broadcast (the small side by construction); the
    corpus is scanned once with no shuffle until the final per-query
    top-k (a single hash partition on query_id). Norms are computed once
    per vector (not per pair). The default fold-based dot has stable
    cost; pass ``dims`` to unroll it into a static expression — faster
    per row at very large pair counts, but it pays a multi-second
    whole-stage-codegen compile per stage (janino on a ~64-term tree),
    so it only wins when pairs ≫ 10⁶. Ranking uses the rounded cosine
    with id tiebreak → fully deterministic either way (identical
    left-to-right accumulation).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col), dims).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col), dims).alias("__cnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__qvec"), F.col("__cvec"), dims)
                / (F.col("__qnorm") * F.col("__cnorm")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))
    )


# --- LSH-bucketed ANN (scale path) ----------------------------------------

def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from md5(f"{plane}:{dim}") — stable across engines/runs."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()
    return (int(h[:8], 16) / float(0xFFFFFFFF)) * 2.0 - 1.0


def hyperplane_signature(
    vec: Column, dims: int, planes: int = 8
) -> Column:
    """Random-hyperplane LSH signature: bit p = sign(v · plane_p).
    Packed into a long. Planes are literal constants folded by Catalyst —
    zero per-row Python.

    Shape matters for the optimizer: ONE nested higher-order expression
    (transform over an array-of-arrays plane matrix, then a bit-packing
    fold) instead of `planes` chained per-plane folds. The chained form
    builds a tree Catalyst re-walks per rule — and when the signature
    feeds a join key it gets inlined into several operators, multiplying
    that cost (2–3× slower to plan AND execute, measured; same results).
    """
    v = _as_double(vec)
    planes_lit = F.array(*[
        F.array(*[F.lit(_plane_component(p, d)) for d in range(dims)])
        for p in range(planes)
    ])
    weights = F.array(*[F.lit(2 ** p).cast("long") for p in range(planes)])
    projs = F.transform(
        planes_lit,
        lambda plane: F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.aggregate(
        F.zip_with(
            projs,
            weights,
            lambda pr, w: F.when(pr > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 8,
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket, then
    exact cosine rescoring within the bucket. At scale: corpus bucketed/
    persisted by signature once, queries hash-join on signature — no
    cross product anywhere."""
    from pyspark.sql import Window

    sig = lambda df, a, b: df.select(  # noqa: E731
        F.col(id_col).alias(a),
        F.col(vec_col).alias(b),
        hyperplane_signature(F.col(vec_col), dims, planes).alias("__bucket"),
    )
    c = sig(corpus, "neighbor_id", "__cvec")
    q = sig(queries, "query_id", "__qvec")
    scored = (
        c.join(F.broadcast(q), ["__bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("__qvec"), F.col("__cvec"), dims), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))
    )


# --- IVF (inverted-file) ANN ----------------------------------------------

def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int | None = None,
) -> DataFrame:
    """Coarse quantization: each vector joins its argmax-cosine centroid
    (rounded cosine + centroid-id tiebreak → deterministic). Centroids
    are broadcast; the fan-out is |vectors|·K rows of SCALAR scores
    (vectors are not duplicated K times through a shuffle — the window
    that picks the argmax partitions by the vector id, which the
    broadcast join already co-locates)."""
    from pyspark.sql import Window

    cent = centroids.select(
        F.col(id_col).alias("__cent_id"), F.col(vec_col).alias("__cent_vec")
    )
    scored = vectors.join(F.broadcast(cent)).select(
        *vectors.columns,
        "__cent_id",
        F.round(
            cosine(F.col(vec_col), F.col("__cent_vec"), dims), 6
        ).alias("__cent_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__cent_cos").desc(), F.col("__cent_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cent_cos")
        .withColumnRenamed("__cent_id", "cluster")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    k: int = 3,
    dims: int | None = None,
) -> DataFrame:
    """IVF ANN: corpus bucketed by nearest centroid once (at scale:
    persisted/partitioned by `cluster`); each query probes only its own
    centroid's bucket, then exact cosine rescoring + top-k.

    Centroids here are the first ``n_centroids`` corpus vectors by id —
    deterministic and engine-replicable; swap in k-means centroids (or
    any trained codebook) without touching the plan shape. At very
    large K, replace the broadcast-join assignment with a Pandas-UDF
    matrix multiply against the codebook.
    """
    from pyspark.sql import Window

    centroids = (
        corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
    )
    c_assigned = assign_clusters(corpus, centroids, id_col, vec_col, dims)
    q_assigned = assign_clusters(queries, centroids, id_col, vec_col, dims)

    c = c_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        "cluster",
    )
    q = q_assigned.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        "cluster",
    )
    scored = (
        c.join(F.broadcast(q), ["cluster"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("__qvec"), F.col("__cvec"), dims), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))
    )
