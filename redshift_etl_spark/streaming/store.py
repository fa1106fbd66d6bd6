"""Shared parquet-store probe for the streaming state stores
(heavyhitters / driftmon / annindex — the "batch id as idempotence
ledger" family).

Why not ``os.path.exists``: the store path of a deployed sink is a
cluster URI (``hdfs://``, ``s3a://``) that the driver's local
filesystem has never heard of — ``os.path.exists`` is then ALWAYS
False, the replay guard never fires, and a crash-replayed epoch
appends duplicate summaries and silently double-counts (ADVICE r11,
heavyhitters.py:56). The probe must go THROUGH Spark, which resolves
the path with the session's Hadoop filesystem, exactly like the write
that followed it.

Why catch, not pre-check: the two "no ledger yet" shapes — path absent
(first-ever batch) and path present but footer-less (a failed first
append left an empty directory, which crashed ``spark.read.parquet``
permanently under the old spelling) — both surface as
``AnalysisException`` from eager schema resolution. Any OTHER
``AnalysisException`` (e.g. a corrupt store) also returns None here,
and the subsequent append then recreates/extends the store — the same
recovery a first write would perform."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The store's current contents as a DataFrame, or None when the
    store does not exist yet (missing path OR an empty directory with
    no parquet footer to infer a schema from). Path resolution happens
    in the JVM against the session's Hadoop configuration, so cluster
    URIs behave exactly like local paths."""
    from pyspark.errors import AnalysisException

    try:
        # spark.read.parquet resolves the path and infers the schema
        # EAGERLY, so both no-ledger shapes raise here, not at action time
        return spark.read.parquet(store_path)
    except AnalysisException:
        return None
