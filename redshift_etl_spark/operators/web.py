"""Web-corpus curation operators — URL parsing, canonicalization,
domain accounting, blocklist filtering.

Web crawls are the dominant source for LLM training corpora, and the
unit of curation policy is the URL: near-identical pages differ only in
tracking parameters, hosts differ only in casing or default ports, and
crawl dominance concentrates in a few registrable domains. These
operators implement the standard canonicalization pipeline (RFC 3986
normalization subset + tracking-parameter strip) and the accounting /
filtering primitives that ride on it.

Every operator is a pure projection or a broadcast-pruned filter —
zero shuffles on the corpus — so at 100 TB they fuse into the scan
stage. The parsing is spelled with portable regex/array built-ins
(identical semantics on any SQL engine) rather than `parse_url`, so the
DuckDB oracle twins replicate the exact expression from the SAME
constants below (the repo's established oracle-generation discipline).

Reference provenance: the reference repo (nirevexin/redshift-ETL) has
no web-curation surface; this extends the north-star LLM-data-pipeline
pack (BASELINE.json) alongside operators/dedup.py and operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared constants: the Spark columns AND the DuckDB oracle SQL are both
# generated from these, so the two engines cannot drift.
SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref_src)="
DEFAULT_PORTS = {"http": "80", "https": "443"}


def _strip_fragment(url: Column) -> Column:
    return F.regexp_replace(url, "#.*", "")


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose a URL column into typed parts: ``scheme``, ``host``
    (lowercased, port stripped), ``port`` ('' when absent), ``path``
    (leading-slash form, '' for bare hosts), ``query`` (after '?',
    fragment excluded), ``registrable_domain`` (last two dot-labels —
    the eTLD+1 approximation for generic TLDs; a full public-suffix
    list is a broadcast-joinable table, out of scope here), and
    ``path_depth``. Pure projection — fuses into the scan."""
    url = F.col(url_col)
    no_frag = _strip_fragment(url)
    rest = F.regexp_replace(no_frag, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    return df.select(
        "*",
        F.lower(F.regexp_extract(no_frag, SCHEME_RE, 1)).alias("scheme"),
        host.alias("host"),
        F.regexp_extract(hostport, ":([0-9]+)$", 1).alias("port"),
        F.regexp_extract(rest, "^[^/?]+(/[^?]*)?", 1).alias("path"),
        F.regexp_extract(rest, "\\?(.*)$", 1).alias("query"),
        F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1).alias(
            "registrable_domain"
        ),
        F.size(
            F.filter(
                F.split(F.regexp_extract(rest, "^[^/?]+(/[^?]*)?", 1), "/"),
                lambda seg: seg != "",
            )
        ).cast("long").alias("path_depth"),
    )


def normalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Canonical URL for dedup keys: lowercase scheme+host, fragment
    dropped, default port stripped (http:80 / https:443), trailing
    path slashes trimmed, tracking query parameters removed (utm_*,
    fbclid, gclid, msclkid, ref_src — the CCNet/RefinedWeb-style strip
    list), surviving parameters kept in original order, '?' dropped
    when nothing survives. Pure projection."""
    return df.withColumn(out_col, canonical_url_col(F.col(url_col)))


def canonical_url_col(url: Column) -> Column:
    """The `normalize_urls` canonicalization as a single Column
    expression (composable into any projection)."""
    no_frag = _strip_fragment(url)
    rest = F.regexp_replace(no_frag, SCHEME_RE, "")
    scheme = F.lower(F.regexp_extract(no_frag, SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]+)", 1))
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    path = F.regexp_extract(rest, "^[^/?]+(/[^?]*)?", 1)
    qs = F.regexp_extract(rest, "\\?(.*)$", 1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
    )
    clean_qs = F.array_join(kept, "&")
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.regexp_replace(path, "/+$", ""),
        F.when(clean_qs != "", F.concat(F.lit("?"), clean_qs)).otherwise(
            F.lit("")
        ),
    )


def blocklist_filter(
    df: DataFrame, host_col: str, blocked: DataFrame | list[str]
) -> DataFrame:
    """Drop rows whose host (or registrable domain) is blocklisted.
    A literal list compiles to an in-scan NOT IN predicate (pushed to
    the parquet reader); a DataFrame blocklist becomes a broadcast
    LEFT ANTI join — at 100 TB the blocklist (even millions of
    domains) is megabytes next to the corpus, so the corpus side never
    shuffles either way."""
    if isinstance(blocked, list):
        return df.filter(~F.col(host_col).isin(blocked))
    other = blocked.select(blocked.columns[0]).toDF(host_col)
    return df.join(F.broadcast(other), host_col, "left_anti")


def domain_share(df: DataFrame, domain_col: str) -> DataFrame:
    """Per-domain document count and corpus share — the crawl-dominance
    report that motivates per-domain caps. One hash aggregation; the
    share divides two BIGINTs through the 1-row broadcast total (a
    single IEEE division, bit-identical on any engine)."""
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    return counts.crossJoin(F.broadcast(total)).select(
        domain_col,
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("__total")).alias("share"),
    )
