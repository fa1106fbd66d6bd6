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
``AnalysisException`` from eager schema resolution.

Why the catch is NARROW (r12 ADVICE item 2): only the two documented
no-store error classes (``PATH_NOT_FOUND``, ``UNABLE_TO_INFER_SCHEMA``,
probed on this Spark build in tests/test_store_probe.py) map to None.
Every other ``AnalysisException`` — an unreadable or access-denied
store, a format-level schema failure — RE-RAISES: for the append-only
ledgers a false None is merely benign double-append risk, but
``ctr.start_merge_sink`` treats None as "empty target" and its SCD1
merge then OVERWRITES target_path — a swallowed error there would
destroy all prior state, the exact data loss this module exists to
prevent, just via a different trigger."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The two (and only two) eager-resolution error classes that mean "no
# store exists yet". Anything else is a real error and must propagate.
_NO_STORE_ERROR_CLASSES = frozenset(
    {"PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"}
)


def read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """The store's current contents as a DataFrame, or None when the
    store does not exist yet (missing path OR an empty directory with
    no parquet footer to infer a schema from). Path resolution happens
    in the JVM against the session's Hadoop configuration, so cluster
    URIs behave exactly like local paths. Any AnalysisException other
    than the two no-store classes re-raises (see module docstring)."""
    from pyspark.errors import AnalysisException

    try:
        # spark.read.parquet resolves the path and infers the schema
        # EAGERLY, so both no-ledger shapes raise here, not at action time
        return spark.read.parquet(store_path)
    except AnalysisException as exc:
        # getCondition is the 4.x name; getErrorClass is the deprecated
        # alias kept for older builds
        get_cls = getattr(exc, "getCondition", None) or exc.getErrorClass
        cls = get_cls()
        # older builds without error classes: fall back to matching the
        # two documented message shapes, still re-raising the rest
        if cls is None:
            msg = str(exc)
            if "Path does not exist" in msg or (
                "Unable to infer schema" in msg
            ):
                return None
            raise
        if cls in _NO_STORE_ERROR_CLASSES:
            return None
        raise
