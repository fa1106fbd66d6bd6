"""redshift_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference `nirevexin/redshift-ETL`
(a Lambda + Redshift stored-procedure ETL system), re-expressed Spark-first.

Architecture (SURVEY.md §7):
- ``session``      — tuned SparkSession factory
- ``schemas``      — explicit StructType registry per ingested object
- ``functions``    — the reference's scalar surface (SURVEY §2.6 F1–F17)
  as composable Column functions
- ``transforms``   — type-coercion / normalize layer (SURVEY §2.7 T1–T7)
- ``operators``    — SCD1 merge, anti-join append, conditional upsert,
  dedup (exact/MinHash/SimHash/Jaccard), similarity search, text analysis
- ``sources``      — batch file readers with incremental checkpointing,
  REST adapters, JDBC sinks
- ``queries``      — the analytics layer (agent-metrics views re-expressed
  over the testdata star schema) and every oracle-checked operator query
- ``streaming``    — Structured Streaming CTR pipeline (watermark dedup),
  stateful CDC, continuous dedup ingest, trending terms, heavy hitters
- ``views``        — materialized views over the versioned store
- ``pipelines``    — the reference's nine pipelines as engine entry points

Everything compiles to Catalyst plans; no RDDs, no row-at-a-time Python
in hot paths.
"""

__version__ = "0.1.0"
