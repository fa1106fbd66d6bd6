"""Embedding-space decontamination (`dedup.semantic_contamination` /
`decontaminate_semantic`): planted-leak recall, threshold gating, and
the keep-set anti-join. A verbatim copy of a benchmark vector shares
EVERY band bucket with it (identical signs on every plane) and has
cosine 1.0, so it must always be flagged — banding can never lose an
exact leak."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from redshift_etl_spark.operators import dedup as D


def _vec(seed: int, dims: int = 64) -> list[float]:
    # deterministic pseudo-vector, no RNG state; md5-derived components
    # are mutually uncorrelated (a linear sawtooth is NOT — its shifted
    # copies have cosine ≈ 1)
    import hashlib

    out = []
    for d in range(dims):
        h = hashlib.md5(f"{seed}:{d}".encode()).digest()
        out.append((int.from_bytes(h[:4], "big") % 2001 - 1000) / 1000.0)
    return out


@pytest.fixture()
def planted(spark):
    bench = spark.createDataFrame(
        [(1000 + i, _vec(900 + i * 7)) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    # corpus: 20 unrelated vectors + one VERBATIM copy of bench 1002
    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20)] + [(99, _vec(900 + 2 * 7))],
        "vec_id long, embedding array<double>",
    )
    return corpus, bench


def test_exact_leak_always_flagged(spark, planted):
    corpus, bench = planted
    rep = D.semantic_contamination(
        corpus, bench, "vec_id", "embedding", tau_micro=990000
    ).collect()
    assert [r.vec_id for r in rep] == [99]
    assert rep[0].max_cos_micro == 1000000
    assert rep[0].nearest_bench_id == 1002


def test_threshold_gates_report(spark, planted):
    corpus, bench = planted
    # tau above 1.0 is unreachable — nothing flagged, even the copy
    rep = D.semantic_contamination(
        corpus, bench, "vec_id", "embedding", tau_micro=1000001
    )
    assert rep.count() == 0


def test_keep_set_drops_exactly_the_flagged(spark, planted):
    corpus, bench = planted
    kept = D.decontaminate_semantic(
        corpus, bench, "vec_id", "embedding", tau_micro=990000
    )
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert 99 not in kept_ids
    assert kept_ids == set(range(20))
    # keep-set preserves the corpus schema untouched
    assert kept.columns == corpus.columns


def test_report_is_partitioning_invariant(spark, planted):
    corpus, bench = planted
    a = D.semantic_contamination(
        corpus.repartition(7), bench, "vec_id", "embedding",
        tau_micro=200000,
    )
    b = D.semantic_contamination(
        corpus.coalesce(1), bench, "vec_id", "embedding",
        tau_micro=200000,
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0


def test_hits_counted_over_qualifying_candidates_only(spark):
    # two benchmark copies of the same corpus vector → n_bench_hits=2,
    # nearest = the lower benchmark id (cosine tie)
    corpus = spark.createDataFrame(
        [(1, _vec(5))], "vec_id long, embedding array<double>"
    )
    bench = spark.createDataFrame(
        [(50, _vec(5)), (40, _vec(5)), (60, _vec(999))],
        "vec_id long, embedding array<double>",
    )
    row = D.semantic_contamination(
        corpus, bench, "vec_id", "embedding", tau_micro=990000
    ).collect()[0]
    assert row.n_bench_hits == 2
    assert row.nearest_bench_id == 40


def test_tiebreak_works_for_string_ids(spark):
    # ADVICE r09: the old unary-minus-on-id tiebreak silently cast
    # string ids to NULL under non-ANSI Spark, making nearest_bench_id
    # nondeterministic on cosine ties; min_by over (-cos, id) orders
    # any id type ascending natively
    corpus = spark.createDataFrame(
        [("doc1", _vec(5))], "vec_id string, embedding array<double>"
    )
    bench = spark.createDataFrame(
        [("bZ", _vec(5)), ("bA", _vec(5)), ("bQ", _vec(999))],
        "vec_id string, embedding array<double>",
    )
    row = D.semantic_contamination(
        corpus, bench, "vec_id", "embedding", tau_micro=990000
    ).collect()[0]
    assert row.n_bench_hits == 2
    assert row.nearest_bench_id == "bA"  # cosine tie → id ASC
