"""Committed index fixtures ≡ retraining — the local fast-fail for a
stale fixture (the driver oracles catch it too, but only at sweep
time: ivf_pq_topk / semdedup SQL retrains from scratch and would
hash-mismatch). Double/long/string parquet round-trips are bit-exact,
so strict equality is the right bar."""

from __future__ import annotations


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pq_codes_fixture_equals_reencoding(spark):
    from redshift_etl_spark.operators import pq as PQ
    from redshift_etl_spark.queries.llm_data import (
        pq_codebook_fixture,
        pq_codes_fixture,
    )
    from redshift_etl_spark.queries.tables import load

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    fresh = PQ.pq_encode(emb, pq_codebook_fixture(spark, SF_SMOKE))
    assert _rows(pq_codes_fixture(spark, SF_SMOKE)) == _rows(fresh)


def test_ivf_cells_fixture_equals_reassignment(spark):
    from redshift_etl_spark.operators import similarity as S
    from redshift_etl_spark.queries.llm_data import (
        ivf_cells_fixture,
        ivf_codebook,
    )
    from redshift_etl_spark.queries.tables import load

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    fresh = S.assign_clusters(
        emb, ivf_codebook(spark, SF_SMOKE), "vec_id", "embedding"
    ).select("vec_id", "cluster")
    assert _rows(ivf_cells_fixture(spark, SF_SMOKE)) == _rows(fresh)


def test_semdedup_fixtures_equal_adaptive_retraining(spark):
    from redshift_etl_spark.operators import similarity as S
    from redshift_etl_spark.queries.llm_data import (
        SEMDEDUP_TARGET_ROWS,
        semdedup_cells_fixture,
        semdedup_codebook_fixture,
    )
    from redshift_etl_spark.queries.tables import load

    from .conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings")
    cb = S.adaptive_kmeans_codebook(
        emb, "vec_id", "embedding",
        target_cluster_rows=SEMDEDUP_TARGET_ROWS,
    )
    assert _rows(semdedup_codebook_fixture(spark, SF_SMOKE)) == _rows(cb)
    fresh = S.assign_clusters(emb, cb, "vec_id", "embedding").select(
        "vec_id", "cluster"
    )
    assert _rows(semdedup_cells_fixture(spark, SF_SMOKE)) == _rows(fresh)
    # adaptive contract: k tracks the corpus size
    n = emb.count()
    k = semdedup_codebook_fixture(spark, SF_SMOKE).count()
    assert k == -(-n // SEMDEDUP_TARGET_ROWS)


def test_ann_index_store_fixture_equals_fresh_two_batch_build(
    spark, tmp_path
):
    # the committed streaming-maintained store ≡ a fresh two-batch
    # ingest into scratch: every embedding exactly once, same cell
    from redshift_etl_spark.queries.llm_data import (
        ann_index_store_fixture,
        semdedup_codebook_fixture,
    )
    from redshift_etl_spark.queries.tables import load
    from redshift_etl_spark.streaming import annindex as AX

    from .conftest import SF_SMOKE

    import pyspark.sql.functions as F

    emb = load(spark, SF_SMOKE, "embeddings")
    # the adaptive codebook is the store's BUILD artifact (r10: fixed
    # k=8 cells densified 10x per 10x data in rehearsal)
    cb = semdedup_codebook_fixture(spark, SF_SMOKE)
    scratch = str(tmp_path / "store")
    AX.index_ingest_batch(emb.filter(F.col("vec_id") % 2 == 0), scratch, cb)
    AX.index_ingest_batch(emb, scratch, cb)
    fresh = spark.read.parquet(scratch)
    cols = ["vec_id", "cluster"]
    committed = ann_index_store_fixture(spark, SF_SMOKE)
    assert _rows(committed.select(*cols)) == _rows(fresh.select(*cols))
    # exactly-once: one row per embedding id
    assert committed.count() == emb.count()
    assert committed.select("vec_id").distinct().count() == emb.count()
