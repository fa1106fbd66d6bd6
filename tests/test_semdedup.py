"""SemDeDup contracts on an engineered fixture: duplicate groups form
only within a cluster, the keep rule selects the member FARTHEST from
its centroid (ties to lowest id), and group arithmetic holds. The
catalog query's oracle (which retrains the codebook relationally)
covers cross-engine parity; this covers the semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators import dedup as D
from redshift_etl_spark.operators import similarity as S


def test_semdedup_keep_farthest_from_centroid(spark):
    # two orthogonal blobs; ids 1,2,3 are near-dups in blob A where id 3
    # leans furthest off-axis (lowest cosine to the blob centroid);
    # id 10 is alone in blob B — no pair, no group row.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),
        (3, [0.97, 0.24, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = S.kmeans_codebook(emb, "vec_id", "embedding", k=2, iters=2)
    assigned = S.assign_clusters(emb, cb, "vec_id", "embedding")
    cent = cb.select(
        F.col("vec_id").alias("__cent_id"),
        F.col("embedding").alias("__cent_vec"),
    )
    withcos = assigned.join(
        F.broadcast(cent), F.col("cluster") == F.col("__cent_id")
    ).select(
        "vec_id",
        F.round(S.cosine(F.col("embedding"), F.col("__cent_vec")), 6).alias(
            "cent_cos"
        ),
    )
    a = assigned.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("__va"), "cluster"
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("__vb"), "cluster"
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(F.round(S.cosine(F.col("__va"), F.col("__vb")), 6) >= 0.95)
        .select("vec_a", "vec_b")
    )
    cc = D.connected_components(pairs, "vec_a", "vec_b")
    groups = (
        cc.join(withcos, cc["node"] == withcos["vec_id"])
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min_by(
                F.col("node"), F.struct(F.col("cent_cos"), F.col("node"))
            ).alias("keep_id"),
        )
        .collect()
    )
    assert len(groups) == 1  # one dup group; the orthogonal vector untouched
    g = groups[0]
    assert g["component"] == 1 and g["n_members"] == 3
    # farthest from centroid = the off-axis member, id 3 — NOT min id
    assert g["keep_id"] == 3


def test_semdedup_catalog_group_arithmetic(spark):
    from redshift_etl_spark import queries as Q

    from .conftest import SF_ORACLE

    rows = Q.all_queries()["semdedup"](spark, SF_ORACLE).collect()
    assert rows  # fixture corpus has duplicate groups
    for r in rows:
        assert r["n_dropped"] == r["n_members"] - 1
        assert r["n_members"] >= 2  # singletons never emit a group row
