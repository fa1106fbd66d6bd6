"""Bucketed (LSH-candidate) mining vs the exact contracted baselines:
full recall on planted cross-label near pairs, gate-admittance subset
(bucketing can only tighten the margin gate), and stage equivalence —
the factored gate/rank stage fed with the exact all-pairs frame must
reproduce the exact operator row-for-row.

Geometry: two tight clusters ~25° apart (inter-cluster cos ≈ 0.9,
intra ≈ 0.999). With 8 bands × 2 planes the deterministic md5 plane
family routes every inter-cluster pair into at least one shared
bucket (checked empirically here — the planes are constants, so this
is a fixed property of the fixture, not a probabilistic expectation).
"""

from __future__ import annotations

import pytest

import math

import pyspark.sql.functions as F

from redshift_etl_spark.operators import similarity as S

BANDS, PLANES, DIMS = 8, 2, 8


def _fixture(spark):
    def member(base, i):
        # tiny deterministic perturbation, different per member
        return [
            round(b + 0.004 * math.sin(1.7 * (i + 1) * (j + 2)), 6)
            for j, b in enumerate(base)
        ]

    a_axis = [1.0, 0.0, 0.3, 0.1, 0.0, 0.2, 0.0, 0.1]
    # ~25 degrees away from a_axis: cos ≈ 0.9 between cluster means
    b_axis = [0.85, 0.45, 0.3, 0.1, 0.25, 0.2, 0.0, 0.1]
    rows = []
    for i in range(4):
        rows.append((i, member(a_axis, i), 0))
    for i in range(4):
        rows.append((100 + i, member(b_axis, i), 1))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def _pairs(rows):
    return {(r["anchor_id"], r["neg_id"]) for r in rows}


def test_bucketed_full_recall_on_planted_near_pairs(spark):
    df = _fixture(spark)
    out = S.hard_negatives_bucketed(
        df,
        k=50,
        margin_micro=20000,
        dims=DIMS,
        bands=BANDS,
        planes_per_band=PLANES,
    ).collect()
    got = _pairs(out)
    # every planted cross-cluster (cross-label) pair passes the margin
    # gate (cos≈0.9 vs pos_best≈0.999) and must be recovered in BOTH
    # anchor directions — full recall on the planted near-negatives
    want = {(a, 100 + b) for a in range(4) for b in range(4)} | {
        (100 + b, a) for a in range(4) for b in range(4)
    }
    assert want <= got


def test_bucketed_is_subset_of_exact_gate_admittance(spark):
    df = _fixture(spark)
    exact_all = _pairs(
        S.hard_negatives(df, k=10_000, margin_micro=20000).collect()
    )
    bucketed = _pairs(
        S.hard_negatives_bucketed(
            df,
            k=3,
            margin_micro=20000,
            dims=DIMS,
            bands=BANDS,
            planes_per_band=PLANES,
        ).collect()
    )
    # candidates ⊆ all pairs and the bucketed ceiling can only be
    # LOWER (stricter gate), so every bucketed negative is one the
    # exact gate also admits
    assert bucketed <= exact_all


@pytest.mark.slow
def test_stage_fed_with_exact_pairs_reproduces_exact_operator(spark):
    """hard_negative_stage is THE logic of hard_negatives: feeding it
    the exact all-pairs candidate frame must reproduce the exact
    operator row-for-row (the refactor contract)."""
    df = _fixture(spark)
    norm = S.l2_norm(F.col("embedding"))
    a = df.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("__va"),
        norm.alias("__na"),
    )
    b = df.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("embedding").alias("__vb"),
        norm.alias("__nb"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "a_label",
            "b_id",
            "b_label",
            F.round(
                S.dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb"))
                * 1e6,
                0,
            ).cast("long").alias("cos_micro"),
        )
    )
    via_stage = sorted(
        map(tuple, S.hard_negative_stage(pairs, 2, 20000).collect())
    )
    direct = sorted(
        map(tuple, S.hard_negatives(df, k=2, margin_micro=20000).collect())
    )
    assert via_stage == direct


def test_bitext_bucketed_matches_exact_on_covered_candidates(spark):
    """When the bucket join covers ALL cross pairs (tight bipartite
    clusters), the bucketed miner must equal the exact miner exactly —
    same candidates → same denominators → same mutual-best pairs."""
    df = _fixture(spark)
    side_a = df.filter(F.col("label") == 0)
    side_b = df.filter(F.col("label") == 1)
    cand = S.lsh_bucketed_cross_pairs(
        side_a,
        side_b,
        dims=DIMS,
        bands=BANDS,
        planes_per_band=PLANES,
        threshold_micro=-(10**6),
    )
    n_cand = cand.count()
    assert n_cand == 16  # every cross pair is a candidate here
    exact = sorted(
        map(tuple, S.margin_mined_pairs(side_a, side_b, k=2).collect())
    )
    bucketed = sorted(
        map(
            tuple,
            S.margin_mined_pairs_bucketed(
                side_a,
                side_b,
                k=2,
                dims=DIMS,
                bands=BANDS,
                planes_per_band=PLANES,
                threshold_micro=-(10**6),
            ).collect(),
        )
    )
    assert bucketed == exact


def test_bucketed_partition_invariance(spark):
    df = _fixture(spark)
    one = sorted(
        map(
            tuple,
            S.hard_negatives_bucketed(
                df.coalesce(1),
                k=3,
                dims=DIMS,
                bands=BANDS,
                planes_per_band=PLANES,
            ).collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            S.hard_negatives_bucketed(
                df.repartition(7),
                k=3,
                dims=DIMS,
                bands=BANDS,
                planes_per_band=PLANES,
            ).collect(),
        )
    )
    assert one == many and len(one) > 0
