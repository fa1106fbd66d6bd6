"""embedding_gram / whiten_embeddings — exactness of the distributed
gramian and the ZCA contract (output covariance ≈ I)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from redshift_etl_spark.operators import similarity as S

D = 8
N = 400


def _emb_df(spark, seed=7):
    rng = np.random.default_rng(seed)
    # correlated dims: random linear mix of independent gaussians
    mix = rng.normal(size=(D, D))
    x = (rng.normal(size=(N, D)) @ mix + rng.normal(size=D)).astype(
        np.float32
    )
    rows = [(i, [float(v) for v in x[i]]) for i in range(N)]
    return (
        spark.createDataFrame(rows, ["vec_id", "embedding"])
        .withColumn("embedding", F.col("embedding").cast("array<float>")),
        x,
    )


def test_embedding_gram_matches_numpy(spark):
    df, x = _emb_df(spark)
    got = {
        (r["i"], r["j"]): r["gram_e6"]
        for r in S.embedding_gram(df, "embedding", dims=D).collect()
    }
    xd = x.astype(np.float64)
    for i in range(D):
        for j in range(i, D):
            # per-term round-then-sum, replayed exactly
            terms = np.round(xd[:, i] * xd[:, j] * 1e6)
            assert got[(i, j)] == int(terms.sum()), (i, j)
    # upper triangle only
    assert all(j >= i for (i, j) in got)
    assert len(got) == D * (D + 1) // 2


def test_embedding_gram_partition_invariant(spark):
    df, _ = _emb_df(spark)
    a = sorted(
        tuple(r) for r in S.embedding_gram(df, "embedding", dims=D).collect()
    )
    b = sorted(
        tuple(r)
        for r in S.embedding_gram(
            df.repartition(13), "embedding", dims=D
        ).collect()
    )
    assert a == b


def test_whitening_decorrelates(spark):
    df, x = _emb_df(spark)
    out = S.whiten_embeddings(df, "embedding", dims=D)
    z = np.stack(
        [np.asarray(r["whitened"]) for r in out.orderBy("vec_id").collect()]
    )
    cov = np.cov(z.T, bias=True)
    # input dims are strongly correlated; output covariance ≈ I
    assert np.abs(cov - np.eye(D)).max() < 0.05, np.abs(cov - np.eye(D)).max()
    # schema: input columns preserved + whitened appended
    assert out.columns == ["vec_id", "embedding", "whitened"]


def test_whitening_deterministic_across_partitionings(spark):
    df, _ = _emb_df(spark)
    z1 = {
        r["vec_id"]: tuple(r["whitened"])
        for r in S.whiten_embeddings(df, "embedding", dims=D).collect()
    }
    z2 = {
        r["vec_id"]: tuple(r["whitened"])
        for r in S.whiten_embeddings(
            df.repartition(11), "embedding", dims=D
        ).collect()
    }
    # gram/means are exact-int or exact-double sums -> identical model;
    # projection is per-row numpy -> identical outputs
    assert z1 == z2
