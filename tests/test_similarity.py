"""Similarity-search invariants: exact top-k correctness vs a NumPy
reference, and ANN recall sanity for the LSH / IVF scale paths."""

from __future__ import annotations

import numpy as np
import pytest

from redshift_etl_spark.operators import similarity as S
from redshift_etl_spark.queries.tables import load

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    df = load(spark, SF_SMOKE, "embeddings")
    rows = df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return df, ids, mat


def _np_topk(ids, mat, query_ids, k=3):
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for qi in query_ids:
        q = mat[ids == qi][0]
        cos = (mat @ q) / (norms * np.linalg.norm(q))
        order = sorted(
            [(round(c, 6), -i) for i, c in zip(ids, cos) if i != qi],
            reverse=True,
        )[:k]
        out[qi] = [-i for _, i in order]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    df, ids, mat = emb
    queries = df.filter(df.vec_id < 5)
    got = S.cosine_topk(df, queries, k=3).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert by_q == _np_topk(ids, mat, range(5))


def test_ann_recall_sanity(spark, emb):
    """LSH and IVF prune candidates; whatever they return must be real
    corpus ids with correctly-ordered rounded cosines, and bucket
    self-consistency must hold (query's own bucket only)."""
    df, ids, mat = emb
    queries = df.filter(df.vec_id < 5)
    for fn in (
        lambda: S.ann_topk_lsh(df, queries, dims=64, planes=8, k=3),
        lambda: S.ivf_topk(df, queries, n_centroids=8, k=3, dims=64),
    ):
        rows = fn().collect()
        for r in rows:
            assert r["neighbor_id"] in ids
            assert -1.0 <= r["cosine"] <= 1.0
        for q in {r["query_id"] for r in rows}:
            ranked = sorted(
                (r for r in rows if r["query_id"] == q),
                key=lambda r: r["rank"],
            )
            cosines = [r["cosine"] for r in ranked]
            assert cosines == sorted(cosines, reverse=True)


def test_blocked_pairs_partition_invariant(spark):
    """The block-pair applyInPandas kernel must produce the identical
    pair set whatever the physical partitioning of the input — block
    routing decides WHERE a pair is scored, never WHETHER or to WHAT
    value."""
    from redshift_etl_spark.operators import similarity as S
    from .conftest import SF_ORACLE
    from redshift_etl_spark.queries.tables import load

    emb = load(spark, SF_ORACLE, "embeddings")

    def pairs(df):
        return {
            (r["vec_a"], r["vec_b"], round(r["cosine_raw"], 6))
            for r in S.cosine_pairs_blocked(df, threshold=0.4).collect()
        }

    assert pairs(emb.repartition(8)) == pairs(emb.coalesce(1))


def test_blocked_pairs_block_count_invariant(spark):
    """Exactness must not depend on the block count — every unordered
    pair is owned by exactly one block-pair group for ANY n_blocks."""
    from .conftest import SF_ORACLE

    emb = load(spark, SF_ORACLE, "embeddings")

    def pairs(n_blocks):
        return {
            (r["vec_a"], r["vec_b"], round(r["cosine_raw"], 6))
            for r in S.cosine_pairs_blocked(
                emb, threshold=0.4, n_blocks=n_blocks
            ).collect()
        }

    one = pairs(1)
    assert one  # non-empty at this threshold
    assert pairs(3) == one
    assert pairs(7) == one


def test_kmeans_codebook_partition_invariant(spark):
    """Scaled-integer centroid means are associative-exact: the trained
    codebook must be bit-identical under any input partitioning (a
    double SUM would not be)."""
    from .conftest import SF_ORACLE

    emb = load(spark, SF_ORACLE, "embeddings")

    def codebook(df):
        return {
            r["vec_id"]: tuple(r["embedding"])
            for r in S.kmeans_codebook(df, k=8, iters=2, dims=64).collect()
        }

    a = codebook(emb.repartition(16))
    b = codebook(emb.coalesce(1))
    assert a == b
    assert len(a) >= 2  # training kept a real codebook, not one blob


def test_kmeans_improves_quantization(spark):
    """Two Lloyd's iterations must not worsen the quantization error of
    the seed codebook (monotonic non-increase is Lloyd's invariant)."""
    import numpy as np

    from .conftest import SF_ORACLE

    emb = load(spark, SF_ORACLE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}

    def err(centroids):
        cents = {r["vec_id"]: np.array(r["embedding"]) for r in centroids}
        total = 0.0
        for v in vecs.values():
            best = max(
                float(np.dot(v, c) / (np.linalg.norm(v) * np.linalg.norm(c)))
                for c in cents.values()
            )
            total += 1.0 - best
        return total

    seeds = emb.orderBy("vec_id").limit(8).collect()
    trained = S.kmeans_codebook(emb, k=8, iters=2, dims=64).collect()
    assert err(trained) <= err(seeds) + 1e-9


def test_degenerate_sizes_do_not_crash(spark):
    """k > n, tiny corpora, empty frames: every operator degrades
    gracefully instead of raising."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    assert len(S.kmeans_codebook(emb, k=8, iters=2, dims=2).collect()) == 3
    assert (
        S.ivf_topk(emb, emb.limit(1), n_centroids=8, k=2, train_iters=2)
        .count()
        == 0
    )


def test_lsh_bucketed_pairs_subset_of_exact_with_identical_scores(spark):
    """The bucketed path may only MISS pairs (bucket gating), never
    invent or mis-score one: output ⊆ exact all-pairs, scores equal on
    the intersection, and recall is non-trivial on the testdata."""
    df = load(spark, SF_SMOKE, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine_raw"]
        for r in S.cosine_pairs_blocked(df, threshold=0.4).collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"]): r["cosine_raw"]
        for r in S.lsh_bucketed_cosine_pairs(df, threshold=0.4).collect()
    }
    assert set(bucketed) <= set(exact)
    for pair, cos in bucketed.items():
        assert cos == exact[pair]  # bit-identical: same kernel fold
    assert len(bucketed) >= 0.5 * len(exact)


def test_lsh_bucketed_full_recall_on_identical_vectors(spark):
    """Identical vectors agree with every plane, so they collide in
    every band — candidate generation can never drop an exact dup."""
    base = load(spark, SF_SMOKE, "embeddings").limit(20)
    from pyspark.sql import functions as F

    dup = base.withColumn("vec_id", F.col("vec_id") + 1000)
    both = base.unionByName(dup)
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_bucketed_cosine_pairs(
            both, threshold=0.999999
        ).collect()
    }
    for r in base.select("vec_id").collect():
        assert (r["vec_id"], r["vec_id"] + 1000) in pairs


def test_lsh_bucketed_block_count_invariant(spark):
    """n_blocks only tiles the per-bucket sweep — the emitted pair set
    must not depend on it."""
    df = load(spark, SF_SMOKE, "embeddings")
    one = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_bucketed_cosine_pairs(df, threshold=0.4, n_blocks=1).collect()
    }
    three = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_bucketed_cosine_pairs(df, threshold=0.4, n_blocks=3).collect()
    }
    assert one == three


def test_ivf_codebook_fixture_matches_retraining(spark):
    """The committed train-once fixture must equal deterministic
    retraining bit-for-bit (double parquet round-trips are exact); a
    stale fixture also hash-mismatches the ann_topk_ivf oracle, but
    this failure names the cause directly."""
    from redshift_etl_spark.queries.llm_data import ivf_codebook

    fixture = {
        r["vec_id"]: r["embedding"]
        for r in ivf_codebook(spark, SF_SMOKE).collect()
    }
    fresh = {
        r["vec_id"]: r["embedding"]
        for r in S.kmeans_codebook(
            load(spark, SF_SMOKE, "embeddings"), "vec_id", "embedding",
            k=8, iters=2,
        ).collect()
    }
    assert fixture == fresh


def test_label_centroid_quality_flags_planted_outlier(spark):
    """A vector pointing away from its label's tight cluster must drag
    that label's min_cos far below the clean label's."""
    import numpy as np
    from pyspark.sql import Row

    rng = np.random.default_rng(7)
    base0 = rng.normal(0, 1, 8)
    base1 = rng.normal(0, 1, 8)
    rows = []
    vid = 0
    for base, label in ((base0, 0), (base1, 1)):
        for _ in range(10):
            v = base + rng.normal(0, 0.05, 8)
            rows.append(Row(vec_id=vid, label=label, embedding=[float(x) for x in v]))
            vid += 1
    rows.append(Row(vec_id=vid, label=1, embedding=[float(x) for x in -base1]))
    df = spark.createDataFrame(rows)
    got = {r["label"]: r for r in S.label_centroid_quality(df).collect()}
    assert got[0]["n_vecs"] == 10 and got[1]["n_vecs"] == 11
    assert got[0]["min_cos"] > 0.9          # clean label: tight
    assert got[1]["min_cos"] < 0.0          # planted anti-vector caught
    # partition invariance of the scaled-int means
    again = {
        r["label"]: r for r in S.label_centroid_quality(df.repartition(7)).collect()
    }
    for lbl in (0, 1):
        assert again[lbl]["mean_cos"] == got[lbl]["mean_cos"]
        assert again[lbl]["min_cos"] == got[lbl]["min_cos"]


def test_assign_clusters_arrow_matches_exact(spark):
    """The Arrow matrix kernel must assign every vector to the SAME
    cluster as the expression-based broadcast join (same fold order,
    same rounding, same lowest-id tiebreak)."""
    corpus = load(spark, SF_SMOKE, "embeddings")
    cent = S.kmeans_codebook(corpus, "vec_id", "embedding", k=8, iters=1)
    a = {
        r["vec_id"]: r["cluster"]
        for r in S.assign_clusters(corpus, cent, "vec_id", "embedding").collect()
    }
    b = {
        r["vec_id"]: r["cluster"]
        for r in S.assign_clusters_arrow(corpus, cent, "vec_id", "embedding").collect()
    }
    assert a == b


def test_lsh_bucketed_adaptive_blocking_invariant(spark):
    """Skew-adaptive blocking (per-bucket B = ceil(size/target)) must
    emit exactly the pairs of the static-block formulation — blocking
    routes pairs to groups, it can never change the result."""
    df = load(spark, SF_SMOKE, "embeddings")
    static = {
        (r["vec_a"], r["vec_b"], r["cosine_raw"])
        for r in S.lsh_bucketed_cosine_pairs(df, threshold=0.4, n_blocks=2).collect()
    }
    adaptive = {
        (r["vec_a"], r["vec_b"], r["cosine_raw"])
        for r in S.lsh_bucketed_cosine_pairs(
            df, threshold=0.4, target_block_rows=7
        ).collect()
    }
    assert adaptive == static
    # exact baseline too: adaptive sizing with no bucket is ignored
    # (falls back to static n_blocks) — API safety
    base = {
        (r["vec_a"], r["vec_b"], r["cosine_raw"])
        for r in S.cosine_pairs_blocked(
            df, threshold=0.4, n_blocks=3, target_block_rows=7
        ).collect()
    }
    exact = {
        (r["vec_a"], r["vec_b"], r["cosine_raw"])
        for r in S.cosine_pairs_blocked(df, threshold=0.4, n_blocks=3).collect()
    }
    assert base == exact


def test_ivf_multiprobe_recall_dominates_single_probe(spark, emb):
    """probes=2 recall vs brute force is >= probes=1 recall (and the
    probes=1 path is unchanged: identical result to the default)."""
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import similarity as S

    corpus, _, _ = emb
    queries = corpus.filter(F.col("vec_id") < 8)
    cb = S.kmeans_codebook(corpus, "vec_id", "embedding", k=8, iters=1)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(
            corpus, queries, "vec_id", "embedding", k=5
        ).collect()
    }

    def recall(probes):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_topk(
                corpus, queries, k=5, centroids=cb, probes=probes
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    # default path regression guard: probes=1 == unspecified
    a = S.ivf_topk(corpus, queries, k=5, centroids=cb).collect()
    b = S.ivf_topk(corpus, queries, k=5, centroids=cb, probes=1).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_farthest_point_sample_matches_reference(spark, emb):
    """Greedy selection ≡ numpy reference replay; diversity dominates
    a same-size prefix pick (mean pairwise cosine strictly lower)."""
    import numpy as np
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import similarity as S

    df, ids, mat = emb
    k = 6
    got = {
        r["vec_id"]: r["pick_order"]
        for r in S.farthest_point_sample(df, k=k).collect()
    }
    # reference replay with the same rounded-cosine + lowest-id rules
    norms = np.linalg.norm(mat.astype(np.float64), axis=1)
    order = np.argsort(ids)
    sel = [int(ids[order[0]])]
    for _ in range(k - 1):
        best = None
        for j in np.argsort(ids):
            vid = int(ids[j])
            if vid in sel:
                continue
            closest = max(
                round(
                    float(
                        mat[j].astype(np.float64)
                        @ mat[ids == s][0].astype(np.float64)
                    )
                    / (norms[j] * norms[ids == s][0]),
                    6,
                )
                for s in sel
            )
            if best is None or (closest, vid) < best:
                best = (closest, vid)
        sel.append(best[1])
    assert got == {v: i for i, v in enumerate(sel)}

    def mean_pairwise(vids):
        idx = [np.where(ids == v)[0][0] for v in vids]
        tot, cnt = 0.0, 0
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                va, vb = mat[idx[a]].astype(float), mat[idx[b]].astype(float)
                tot += (va @ vb) / (
                    np.linalg.norm(va) * np.linalg.norm(vb)
                )
                cnt += 1
        return tot / cnt

    prefix = sorted(ids)[:k]
    assert mean_pairwise(list(got)) < mean_pairwise(prefix)


def test_farthest_point_sample_edges(spark, emb):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import similarity as S

    df, _, _ = emb
    assert S.farthest_point_sample(df, k=0).count() == 0
    empty = df.filter(F.col("vec_id") < 0)
    assert S.farthest_point_sample(empty, k=3).count() == 0
    one = S.farthest_point_sample(df.limit(1), k=5)
    assert one.count() == 1 and one.first()["pick_order"] == 0


def test_lsh_bucketed_adversarial_single_bucket_skew(spark):
    """Worst-case skew: near-identical vectors all land in ONE band
    bucket. The adaptive blocking must still produce the complete,
    exact pair set (C(n,2) pairs at cosine ~1) while splitting the hot
    bucket into bounded tiles — the grouped-kernel analog of an AQE
    skew split, which applyInPandas cannot get from AQE itself."""
    import pyspark.sql.functions as F

    n, dims = 120, 8
    base = [1.0, 0.3, 0.2, 0.1, 0.05, 0.0, 0.0, 0.0]
    rows = [
        (i, [round(b + 1e-9 * i * (j + 1), 12) for j, b in enumerate(base)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.lsh_bucketed_cosine_pairs(
        df,
        dims=dims,
        bands=4,
        planes_per_band=3,
        threshold=0.99,
        target_block_rows=16,
    )
    pairs = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
    assert len(pairs) == n * (n - 1) // 2  # complete despite the skew
    assert all(a < b for a, b in pairs)
    # invariant vs a static-block run — blocking is routing only
    static = {
        (r["vec_a"], r["vec_b"])
        for r in S.lsh_bucketed_cosine_pairs(
            df, dims=dims, bands=4, planes_per_band=3,
            threshold=0.99, n_blocks=2,
        ).collect()
    }
    assert pairs == static
