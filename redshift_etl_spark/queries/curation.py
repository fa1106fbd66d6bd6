"""Web-corpus curation + retrieval queries: URL canonicalization,
domain accounting, blocklist filtering, per-domain caps, k-fold CV
assignment, BM25 ranked retrieval, and reciprocal-rank-fusion hybrid
search. Each with a DuckDB oracle twin generated from the SAME regex /
arithmetic constants as the Spark operators (the repo's established
no-drift discipline).

The testdata has no URL column, so the URL queries derive a
deterministic messy URL per document from (doc_id, source, lang) via a
SQL expression that parses identically on Spark and DuckDB — the
operators under test are the REAL parsing/normalization expressions in
`operators/web.py`, exercised on inputs with uppercase hosts, default
and explicit ports, trailing slashes, tracking parameters, and
fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling as SA
from ..operators import similarity as S
from ..operators import text as TX
from ..operators import web as W
from ..operators.text import BM25_SCALE
from .tables import load

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None):
    # Bare dict writes silently shadow an earlier same-name query (this
    # bit three rounds running: shard_manifest, cdc_apply, and two dead
    # module-level defs) — collisions must fail at import time.
    def deco(fn):
        if name in QUERIES:  # raise, not assert: -O must not disable this
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Deterministic messy URL per document — valid Spark SQL *and* DuckDB
# SQL, so both engines synthesize bit-identical inputs. Shapes covered:
# http/https, WWW. subdomains, uppercase hosts, default port 443 (to be
# stripped), explicit port 8080 (to be kept), trailing slash, utm_* /
# gclid tracking params mixed with real params, fragments.
URL_SQL = (
    "'HTTP' || CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END || '://' || "
    "CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END || "
    "upper(substr(source, 1, 1)) || substr(source, 2) || '-' || lang || '.COM' || "
    "CASE WHEN doc_id % 2 = 0 THEN ':443' "
    "     WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END || "
    "'/Docs/' || lang || '/page-' || doc_id || "
    "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END || "
    "CASE WHEN doc_id % 3 = 0 THEN "
    "  '?utm_source=crawler&id=' || doc_id || '&utm_medium=rss' "
    "WHEN doc_id % 7 = 0 THEN '?gclid=x' || doc_id || '&ref=' || lang "
    "ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '#sec-2' ELSE '' END"
)

# DuckDB twin of operators/web.py parsing — generated from the same
# SCHEME_RE / TRACKING_PARAM_RE constants; parity pinned by
# tests/test_web.py on adversarial edge cases.
_DUCK_URL_PARSE = f"""
  with_url AS (SELECT doc_id, source, lang, {URL_SQL} AS url FROM documents),
  s AS (
    SELECT *, regexp_replace(url, '#.*', '') AS no_frag,
      regexp_replace(regexp_replace(url, '#.*', ''), '{W.SCHEME_RE}', '') AS rest
    FROM with_url
  ),
  p AS (
    SELECT *, lower(regexp_extract(no_frag, '{W.SCHEME_RE}', 1)) AS scheme,
      lower(regexp_extract(rest, '^([^/?]+)', 1)) AS hostport,
      regexp_extract(rest, '^[^/?]+(/[^?]*)?', 1) AS path,
      regexp_extract(rest, '\\?(.*)$', 1) AS query
    FROM s
  ),
  q AS (
    SELECT *, regexp_replace(hostport, ':[0-9]+$', '') AS host,
      regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      array_to_string(list_filter(str_split(query, '&'),
          kv -> kv <> '' AND NOT regexp_matches(kv, '{W.TRACKING_PARAM_RE}')),
        '&') AS clean_qs
    FROM p
  ),
  parsed AS (
    SELECT *, regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS registrable_domain,
      CAST(len(list_filter(str_split(path, '/'), x -> x <> '')) AS BIGINT)
        AS path_depth,
      scheme || '://' || host ||
      CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                OR (scheme = 'https' AND port = '443'))
           THEN ':' || port ELSE '' END ||
      regexp_replace(path, '/+$', '') ||
      CASE WHEN clean_qs <> '' THEN '?' || clean_qs ELSE '' END
        AS canonical_url
    FROM q
  )
"""


def _with_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", "source", "lang").withColumn(
        "url", F.expr(URL_SQL)
    )


# ---------------------------------------------------------------------------
# URL parse + canonicalization
# ---------------------------------------------------------------------------

@_q(
    "url_normalize",
    f"""
WITH {_DUCK_URL_PARSE}
SELECT doc_id, url, scheme, host, registrable_domain, path_depth,
       canonical_url
FROM parsed
""",
)
def url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition + canonical dedup key for every document —
    pure projections (operators/web.py), fuses into the scan."""
    urls = _with_urls(spark, sf_dir)
    parsed = W.parse_urls(urls, "url")
    return W.normalize_urls(parsed, "url").select(
        "doc_id", "url", "scheme", "host", "registrable_domain",
        "path_depth", "canonical_url",
    )


# ---------------------------------------------------------------------------
# Crawl-dominance report: docs + share per registrable domain
# ---------------------------------------------------------------------------

@_q(
    "domain_stats",
    f"""
WITH {_DUCK_URL_PARSE},
counts AS (
  SELECT registrable_domain, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM parsed GROUP BY 1
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM parsed)
SELECT registrable_domain, n_docs,
       CAST(n_docs AS DOUBLE) / t AS share
FROM counts CROSS JOIN total
""",
)
def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus share — the report that motivates caps. One
    hash agg + 1-row broadcast total."""
    parsed = W.parse_urls(_with_urls(spark, sf_dir), "url")
    return W.domain_share(parsed, "registrable_domain")


# ---------------------------------------------------------------------------
# Domain blocklist filter
# ---------------------------------------------------------------------------

_BLOCKED = ("src0-en.com", "src1-de.com", "src2-es.com", "src3-fr.com")
_BLOCKED_SQL = ", ".join(f"'{d}'" for d in _BLOCKED)


@_q(
    "domain_blocklist",
    f"""
WITH {_DUCK_URL_PARSE}
SELECT doc_id, host, registrable_domain
FROM parsed
WHERE registrable_domain NOT IN ({_BLOCKED_SQL})
""",
)
def domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents surviving a domain blocklist — an in-scan NOT IN
    predicate (literal list compiles into the scan; a DataFrame list
    becomes a broadcast anti-join, corpus never shuffles)."""
    parsed = W.parse_urls(_with_urls(spark, sf_dir), "url")
    return W.blocklist_filter(
        parsed, "registrable_domain", list(_BLOCKED)
    ).select("doc_id", "host", "registrable_domain")


# ---------------------------------------------------------------------------
# Per-domain cap (anti-dominance quota)
# ---------------------------------------------------------------------------

@_q(
    "domain_capped_sample",
    f"""
WITH {_DUCK_URL_PARSE},
ranked AS (
  SELECT doc_id, registrable_domain,
         row_number() OVER (
           PARTITION BY registrable_domain
           ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS rk
  FROM parsed
)
SELECT doc_id, registrable_domain FROM ranked WHERE rk <= 5
""",
)
def domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 5 documents per registrable domain, deterministic
    md5-ordered draw (`exact_cap_sample` keyed by domain) — the
    RefinedWeb-style anti-dominance quota."""
    parsed = W.parse_urls(_with_urls(spark, sf_dir), "url").select(
        "doc_id", "registrable_domain"
    )
    return SA.exact_cap_sample(parsed, "doc_id", "registrable_domain", 5)


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment
# ---------------------------------------------------------------------------

_KFOLD_BUCKET_SQL = (
    "(((instr('0123456789abcdef', substr(md5(':' || doc_id), 1, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(':' || doc_id), 2, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(':' || doc_id), 3, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(':' || doc_id), 4, 1)) - 1"
)


@_q(
    "kfold_split",
    f"""
WITH folds AS (
  SELECT CAST(({_KFOLD_BUCKET_SQL}) % 5 AS BIGINT) AS fold,
         doc_id, source, n_chars
  FROM documents
)
SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM folds GROUP BY fold
""",
)
def kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold CV assignment + per-fold accounting — md5-bucket mod k is
    stable in the key (rows never migrate as data grows), shuffle-free
    on the data path; only the accounting aggregates."""
    docs = load(spark, sf_dir, "documents")
    folds = SA.kfold_assign(docs, "doc_id", 5)
    return folds.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

_TERMS = ("spark", "merge", "window")
_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

# The scoring recurrence, verbatim from operators/text.bm25_scores —
# identical factor association so every IEEE double matches.
_BM25_CTES = f"""
  toks AS (
    SELECT doc_id AS doc, unnest(str_split(text, ' ')) AS token
    FROM documents
  ),
  dl AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
  stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS s_tokens
    FROM dl
  ),
  tf AS (
    SELECT doc, token, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE token IN ({_TERMS_SQL}) GROUP BY 1, 2
  ),
  dft AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY 1),
  scored AS (
    SELECT tf.doc,
      (22.0 * tf * s_tokens * (2 * (n_docs - df_t) + 1))
      / ((10.0 * tf * s_tokens + 3.0 * s_tokens + 9.0 * dl * n_docs)
         * (2 * df_t + 1)) AS sc
    FROM tf JOIN dl USING (doc) JOIN dft USING (token) CROSS JOIN stats
  ),
  bm25 AS (
    SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
      CAST(SUM(CAST(ROUND(sc * {BM25_SCALE}) AS BIGINT)) AS DOUBLE)
        / {BM25_SCALE}.0 AS score
    FROM scored GROUP BY 1
  ),
  kw_ranked AS (
    SELECT doc AS doc_id, n_terms_matched, score,
      CAST(row_number() OVER (ORDER BY score DESC, doc ASC) AS BIGINT)
        AS rank
    FROM bm25
  )
"""


@_q(
    "bm25_search",
    f"""
WITH {_BM25_CTES}
SELECT doc_id, n_terms_matched, score, rank
FROM kw_ranked WHERE rank <= 20
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for an OR term set under BM25 (k1=1.2, b=0.75,
    ratio idf — see operators/text.py for the libm-free contract).
    Explode filtered to query terms before any shuffle; stats and df
    broadcast; top-k is TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    return TX.bm25_topk(docs, "doc_id", "text", _TERMS, k=20)


# ---------------------------------------------------------------------------
# Diversified retrieval — the same BM25 ranking under a per-source
# result quota (operators/distsort.diversified_topk): no source may
# hold more than 2 of the 20 slots.
# ---------------------------------------------------------------------------

@_q(
    "bm25_search_diversified",
    f"""
WITH {_BM25_CTES},
src AS (SELECT doc_id AS doc, source FROM documents),
capped AS (
  SELECT b.doc, s.source, b.n_terms_matched, b.score,
         row_number() OVER (
           PARTITION BY s.source ORDER BY b.score DESC, b.doc ASC
         ) AS gr
  FROM bm25 b JOIN src s USING (doc)
)
SELECT doc AS doc_id, source, n_terms_matched, score, rank
FROM (
  SELECT doc, source, n_terms_matched, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc ASC)
              AS BIGINT) AS rank
  FROM capped WHERE gr <= 2
) WHERE rank <= 20
ORDER BY rank
""",
)
def bm25_search_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 BM25 results with at most 2 per source
    (`distsort.diversified_topk`): a boilerplate-heavy source can't
    monopolize the page. One source-keyed cap window over the scored
    frame, then a TakeOrdered global cut — the survivor set is never
    globally sorted."""
    from ..operators.distsort import diversified_topk

    docs = load(spark, sf_dir, "documents")
    scored = TX.bm25_scores(docs, "doc_id", "text", _TERMS).join(
        docs.select(F.col("doc_id").alias("doc"), "source"), "doc"
    )
    return diversified_topk(
        scored,
        "source",
        [F.col("score").desc(), F.col("doc").asc()],
        k=20,
        per_group=2,
    ).select(
        F.col("doc").alias("doc_id"),
        "source",
        "n_terms_matched",
        "score",
        "rank",
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Hybrid search: BM25 keyword ranks ⊕ cosine vector ranks via RRF
# ---------------------------------------------------------------------------

@_q(
    "hybrid_search_rrf",
    f"""
WITH {_BM25_CTES},
kw AS (SELECT * FROM kw_ranked WHERE rank <= 50),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id, v FROM c WHERE vec_id = 0),
vec_scored AS (
  SELECT c.vec_id AS neighbor_id,
    ROUND(list_dot_product(q.v, c.v)
      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))),
      6) AS cosine
  FROM q JOIN c ON q.vec_id <> c.vec_id
),
vec AS (
  SELECT neighbor_id, CAST(row_number() OVER (
    ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM vec_scored
  QUALIFY rank <= 50
),
fused AS (
  SELECT COALESCE(kw.doc_id, vec.neighbor_id) AS doc_id,
    kw.rank AS kw_rank, vec.rank AS vec_rank,
    COALESCE(1.0 / (60 + kw.rank), 0.0)
      + COALESCE(1.0 / (60 + vec.rank), 0.0) AS rrf
  FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.neighbor_id
)
SELECT doc_id, kw_rank, vec_rank, rrf FROM fused
ORDER BY rrf DESC, doc_id ASC LIMIT 20
""",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of keyword (BM25 top-50) and vector
    (cosine top-50 for query vector 0) retrieval — the standard hybrid
    search combiner (rrf = Σ 1/(60+rank)). Both rank lists are tiny
    (≤50 rows) regardless of corpus size, so the fusion join is a
    driver-free broadcast no matter the scale; sum of two IEEE doubles
    from integer ranks is engine-exact."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    kw = TX.bm25_topk(docs, "doc_id", "text", _TERMS, k=50).select(
        "doc_id", F.col("rank").alias("kw_rank")
    )
    vec = (
        S.cosine_topk(
            emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding",
            k=50,
        )
        .select(
            F.col("neighbor_id").alias("vec_doc"),
            F.col("rank").cast("long").alias("vec_rank"),
        )
    )
    fused = kw.join(
        vec, kw["doc_id"] == vec["vec_doc"], "full_outer"
    ).select(
        F.coalesce("doc_id", "vec_doc").alias("doc_id"),
        "kw_rank",
        "vec_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("kw_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)
            )
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(20)


# ---------------------------------------------------------------------------
# int8 scalar quantization: per-dim stats + reconstruction error
# ---------------------------------------------------------------------------

# Row-form twin of similarity.dim_minmax + scalar_quantize (levels=255):
# code = ROUND((val − lo)·254/(hi − lo)), identical factor association.
_INT8_CTES = """
  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
  rows_ AS (
    SELECT vec_id, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS val
    FROM c
  ),
  dims AS (
    SELECT dim, MIN(val) AS lo, MAX(val) AS hi FROM rows_ GROUP BY 1
  ),
  codes AS (
    SELECT vec_id, rows_.dim, val, lo, hi,
      CASE WHEN hi - lo > 0
           THEN CAST(ROUND((val - lo) * 254 / (hi - lo)) AS BIGINT)
           ELSE 0 END AS code
    FROM rows_ JOIN dims USING (dim)
  )
"""


@_q(
    "int8_quantize_stats",
    f"""
WITH {_INT8_CTES}
SELECT dim, lo, hi,
  CAST(SUM(CAST(ROUND(abs(val - (lo + code * (hi - lo) / 254)) * 1000000000)
      AS BIGINT)) AS DOUBLE) / (1000000000.0 * COUNT(*)) AS mean_abs_err,
  MAX(ROUND(abs(val - (lo + code * (hi - lo) / 254)), 9)) AS max_abs_err
FROM codes
GROUP BY dim, lo, hi
""",
)
def int8_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantizer training stats + reconstruction error per
    dimension — the accuracy report for the 4×-compressed vector
    store. The quantizer params (≤dims rows) broadcast into a map-only
    encode; the error agg shuffles only (dim) groups. Exact-integer
    mean via the scaled-sum pattern; max rounded at 9."""
    emb = load(spark, sf_dir, "embeddings")
    params = S.dim_minmax(emb, "embedding")
    rows = params.select("dim", "lo", "hi")
    e = (
        emb.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "val"
            ),
        )
        .join(F.broadcast(rows), "dim")
        .withColumn(
            "code",
            F.when(
                F.col("hi") - F.col("lo") > 0,
                F.round(
                    (F.col("val") - F.col("lo"))
                    * 254
                    / (F.col("hi") - F.col("lo")),
                    0,
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "err",
            F.abs(
                F.col("val")
                - (
                    F.col("lo")
                    + F.col("code") * (F.col("hi") - F.col("lo")) / 254
                )
            ),
        )
    )
    return e.groupBy("dim", "lo", "hi").agg(
        (
            F.sum(F.round(F.col("err") * 1000000000, 0).cast("long")).cast(
                "double"
            )
            / (F.lit(1000000000.0) * F.count(F.lit(1)))
        ).alias("mean_abs_err"),
        F.max(F.round(F.col("err"), 9)).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Compressed-domain ANN: integer-dot top-k over int8 codes
# ---------------------------------------------------------------------------

@_q(
    "ann_topk_int8",
    f"""
WITH {_INT8_CTES},
m AS (SELECT MAX(abs(val)) AS ma FROM rows_),
sym AS (
  SELECT vec_id, dim, CAST(ROUND(val * 127 / ma) AS BIGINT) AS code
  FROM rows_ CROSS JOIN m
),
q AS (SELECT vec_id, dim, code FROM sym WHERE vec_id < 5),
pairs AS (
  SELECT q.vec_id AS query_id, c2.vec_id AS neighbor_id,
         CAST(SUM(q.code * c2.code) AS BIGINT) AS qdot
  FROM q JOIN sym c2 ON q.dim = c2.dim AND q.vec_id <> c2.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, qdot, rank FROM (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY qdot DESC, neighbor_id ASC
  ) AS BIGINT) AS rank
  FROM pairs
) WHERE rank <= 3
""",
)
def ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 neighbors per query by INTEGER dot product over symmetric
    int8 codes — compressed-domain search: the scan reads 1-byte codes
    instead of 4-byte floats, and the score is exact 64-bit integer
    arithmetic (no rounding policy needed at all). Query side
    broadcast; same plan shape as the float `ann_cosine_topk`."""
    emb = load(spark, sf_dir, "embeddings")
    ma = float(S.global_max_abs(emb, "embedding").collect()[0]["max_abs"])
    codes = S.symmetric_quantize(emb, ma, "vec_id", "embedding")
    queries = codes.filter(F.col("vec_id") < 5)
    return S.int8_topk(codes, queries, "vec_id", k=3)


# ---------------------------------------------------------------------------
# HTML boilerplate strip
# ---------------------------------------------------------------------------

# Deterministic HTML wrapping of each document (both engines build the
# identical markup): nav/script/style boilerplate + entities around the
# real text.
_HTML_WRAP_SQL = (
    "'<html><head><title>D-' || doc_id || '</title>"
    "<style>p { color: red }</style></head><body>' || "
    "CASE WHEN doc_id % 3 = 0 THEN '<script>var x = 1;</script>' ELSE '' END || "
    "'<nav><a href=\"/home\">Home &amp; more</a></nav><p>' || text || '</p>' || "
    "CASE WHEN doc_id % 2 = 0 THEN '<p>1 &lt; 2 &nbsp;ok</p>' ELSE '' END || "
    "'</body></html>'"
)

_DUCK_STRIP = """regexp_replace(regexp_replace(regexp_replace(
      html, '<script[^>]*>.*?</script>', ' ', 'g'),
      '<style[^>]*>.*?</style>', ' ', 'g'),
      '<[^>]*>', ' ', 'g')"""
for _ent, _ch in (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&"),
):
    _DUCK_STRIP = f"replace({_DUCK_STRIP}, '{_ent}', '{_ch}')"
_DUCK_STRIP = f"nullif(trim(regexp_replace({_DUCK_STRIP}, ' +', ' ', 'g')), '')"


@_q(
    "html_strip",
    f"""
WITH h AS (SELECT doc_id, {_HTML_WRAP_SQL} AS html FROM documents)
SELECT doc_id, html, {_DUCK_STRIP} AS text_clean
FROM h
""",
)
def html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text extraction from HTML — drop script/style blocks with
    contents, strip tags, decode core entities (&amp; last, per the
    spec's single-pass order), collapse whitespace. Pure projection
    (operators/text.strip_html); the oracle replays the same regex
    chain with DuckDB's 'g' flag (Spark's regexp_replace is global by
    default)."""
    docs = load(spark, sf_dir, "documents")
    h = docs.select("doc_id", F.expr(_HTML_WRAP_SQL).alias("html"))
    return h.select(
        "doc_id", "html", TX.strip_html("html").alias("text_clean")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (chars per token)
# ---------------------------------------------------------------------------

@_q(
    "tokenizer_fertility",
    """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST(CAST(SUM(len(text)) AS BIGINT) AS DOUBLE)
         / CAST(SUM(len(str_split(text, ' '))) AS BIGINT)
         AS chars_per_token
FROM documents GROUP BY lang
""",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chars-per-token by language — the fertility report that sizes a
    tokenizer's cost per language (high fertility = more tokens per
    character of content). One agg; the ratio divides two exact
    BIGINTs (single IEEE division)."""
    docs = load(spark, sf_dir, "documents")
    from ..operators.dedup import tokens_col

    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_chars"),
        F.sum(F.size(tokens_col("text"))).cast("long").alias("sum_tokens"),
        (
            F.sum(F.length("text")).cast("long").cast("double")
            / F.sum(F.size(tokens_col("text"))).cast("long")
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Corpus length trim: drop docs outside the exact [p05, p95] band
# ---------------------------------------------------------------------------

@_q(
    "length_trim",
    """
WITH bounds AS (
  SELECT quantile_cont(n_chars, 0.05) AS lo,
         quantile_cont(n_chars, 0.95) AS hi
  FROM documents
)
SELECT doc_id, n_chars FROM documents CROSS JOIN bounds
WHERE n_chars >= lo AND n_chars <= hi
""",
)
def length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents within the exact interpolated [p05, p95] length band —
    the outlier TRIM companion to `winsorize` (which CLIPS): too-short
    docs are noise, too-long ones are concatenation artifacts. Bounds
    are a 1-row broadcast; the data path is a pushed filter."""
    docs = load(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("n_chars") >= F.col("lo"))
            & (F.col("n_chars") <= F.col("hi"))
        )
        .select("doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Flagship composition: the full web-corpus curation pipeline
# ---------------------------------------------------------------------------

from ..operators.sampling import oracle_bucket_sql as _bucket_sql  # noqa: E402

_WCP_BUCKET = _bucket_sql("doc_id")


@_q(
    "web_corpus_prep",
    f"""
WITH {_DUCK_URL_PARSE},
with_len AS (
  SELECT p.*, d.n_chars FROM parsed p JOIN documents d USING (doc_id)
),
survived AS (
  SELECT * FROM with_len
  WHERE registrable_domain NOT IN ({_BLOCKED_SQL}) AND n_chars >= 40
),
canon_dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY canonical_url ORDER BY doc_id
    ) AS __rk FROM survived
  ) WHERE __rk = 1
),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY registrable_domain
      ORDER BY md5(CAST(doc_id AS STRING)), doc_id
    ) AS __ck FROM canon_dedup
  ) WHERE __ck <= 5
),
split AS (
  SELECT *, CASE WHEN {_WCP_BUCKET} < 205 THEN 'train'
                 WHEN {_WCP_BUCKET} < 231 THEN 'val'
                 ELSE 'test' END AS split
  FROM capped
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT registrable_domain) AS BIGINT) AS n_domains
FROM split GROUP BY split
""",
)
def web_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full web-curation pipeline as ONE plan: URL synthesis →
    parse → domain blocklist → length floor → canonical-URL dedup →
    per-domain cap → deterministic split → accounting. Composition of
    the pack's operators, nothing bespoke: the projections fuse into
    the scan, then exactly three window shuffles (canonical_url,
    domain, none for the split — it's a projection) and one final agg.
    The per-stage operators are each oracled alone; this query pins
    their composition."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    urls = docs.select("doc_id", "source", "lang", "n_chars").withColumn(
        "url", F.expr(URL_SQL)
    )
    parsed = W.normalize_urls(W.parse_urls(urls, "url"), "url")
    survived = W.blocklist_filter(
        parsed, "registrable_domain", list(_BLOCKED)
    ).filter(F.col("n_chars") >= 40)
    w = Window.partitionBy("canonical_url").orderBy("doc_id")
    canon = (
        survived.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    capped = SA.exact_cap_sample(canon, "doc_id", "registrable_domain", 5)
    split = SA.deterministic_split(capped, "doc_id")
    return split.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.countDistinct("registrable_domain").cast("long").alias(
            "n_domains"
        ),
    )


# ---------------------------------------------------------------------------
# Quality-weighted downsampling (deterministic Bernoulli by weight)
# ---------------------------------------------------------------------------

_W16 = (
    "(((instr('0123456789abcdef', substr(md5(':' || doc_id), 1, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(':' || doc_id), 2, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(':' || doc_id), 3, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(':' || doc_id), 4, 1)) - 1"
)


@_q(
    "quality_weighted_sample",
    f"""
SELECT doc_id, n_chars
FROM documents
WHERE ({_W16}) < CAST(floor(
  least(1.0, greatest(0.0, CAST(n_chars AS DOUBLE) / 300)) * 65536
) AS BIGINT)
""",
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each document with probability ∝ its quality proxy
    (n_chars/300, clamped) — long docs survive with certainty, short
    ones proportionally. Deterministic in doc_id: reruns, engines, and
    data growth never flip a decision. Pure filter projection."""
    docs = load(spark, sf_dir, "documents")
    kept = SA.weighted_sample(
        docs, "doc_id", F.col("n_chars").cast("double") / 300
    )
    return kept.select("doc_id", "n_chars")


# ---------------------------------------------------------------------------
# Index self-evaluation: recall@3 of the compressed int8 index against
# exact float cosine — the report a vector store publishes about its
# own approximation. Both sides are deterministic, so even the recall
# numbers hash-match the oracle.
# ---------------------------------------------------------------------------

@_q(
    "ann_recall_report",
    f"""
WITH {_INT8_CTES},
m AS (SELECT MAX(abs(val)) AS ma FROM rows_),
sym AS (
  SELECT vec_id, dim, CAST(ROUND(val * 127 / ma) AS BIGINT) AS code
  FROM rows_ CROSS JOIN m
),
q8 AS (SELECT vec_id, dim, code FROM sym WHERE vec_id < 10),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q8.vec_id AS query_id, c2.vec_id AS neighbor_id,
      CAST(SUM(q8.code * c2.code) AS BIGINT) AS qdot,
      row_number() OVER (
        PARTITION BY q8.vec_id
        ORDER BY CAST(SUM(q8.code * c2.code) AS BIGINT) DESC, c2.vec_id ASC
      ) AS rk
    FROM q8 JOIN sym c2 ON q8.dim = c2.dim AND q8.vec_id <> c2.vec_id
    GROUP BY q8.vec_id, c2.vec_id
  ) WHERE rk <= 3
),
qf AS (SELECT vec_id, v FROM c WHERE vec_id < 10),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qf.vec_id AS query_id, c.vec_id AS neighbor_id,
      row_number() OVER (
        PARTITION BY qf.vec_id
        ORDER BY ROUND(list_dot_product(qf.v, c.v)
          / (sqrt(list_dot_product(qf.v, qf.v))
             * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
          c.vec_id ASC
      ) AS rk
    FROM qf JOIN c ON qf.vec_id <> c.vec_id
  ) WHERE rk <= 3
)
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
  CAST(COUNT(a.neighbor_id) AS DOUBLE) / 3 AS recall_at_3
FROM exact e
LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
""",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    ).select("query_id", "neighbor_id")
    ma = float(S.global_max_abs(emb, "embedding").collect()[0]["max_abs"])
    codes = S.symmetric_quantize(emb, ma, "vec_id", "embedding")
    approx = S.int8_topk(
        codes, codes.filter(F.col("vec_id") < 10), "vec_id", k=3
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["a_neighbor"]),
        "left",
    ).select(exact["query_id"], "a_neighbor")
    return joined.groupBy("query_id").agg(
        F.count("a_neighbor").cast("long").alias("n_hits"),
        (F.count("a_neighbor").cast("double") / 3).alias("recall_at_3"),
    )


# ---------------------------------------------------------------------------
# Whitened-ANN recall report: ZCA-whiten the embeddings
# (similarity.whiten_embeddings — the PQ/LSH preconditioner), run the
# symmetric-int8 compressed-domain search IN WHITENED SPACE, and score
# its recall@3 against the whitened-space exact cosine top-3, side by
# side with the raw-space int8 recall (the `ann_recall_report`
# numbers).
#
# Oracle shape: the raw-space half is fully portable (same CTEs as
# ann_recall_report), so n_hits_raw hash-matches value-for-value. The
# whitened half cannot be SQL-twinned — eigendecomposition has no
# portable bit-exact contract (eigenvector sign/order is
# implementation-defined) — so it enters the hash through the portable
# contract `whitened_hits_ok` = (whitened n_hits ≥ 1), oracle literal
# TRUE: deterministic at any committed SF (fixed LAPACK +
# partition-invariant einsum projection; verified 1..3 hits per query
# at sf0.001/0.01/0.1, vs ~0 for a random top-3 of N≥500), proving the
# whiten → quantize → integer-dot → rank path end-to-end. The
# "whitening improves recall on CORRELATED dims" property is pinned by
# pytest on a correlated synthetic fixture (this testdata is
# near-isotropic, where whitening is ~neutral by design).
# ---------------------------------------------------------------------------


@_q(
    "whitened_ann_recall",
    f"""
WITH {_INT8_CTES},
m AS (SELECT MAX(abs(val)) AS ma FROM rows_),
sym AS (
  SELECT vec_id, dim, CAST(ROUND(val * 127 / ma) AS BIGINT) AS code
  FROM rows_ CROSS JOIN m
),
q8 AS (SELECT vec_id, dim, code FROM sym WHERE vec_id < 10),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q8.vec_id AS query_id, c2.vec_id AS neighbor_id,
      row_number() OVER (
        PARTITION BY q8.vec_id
        ORDER BY CAST(SUM(q8.code * c2.code) AS BIGINT) DESC, c2.vec_id ASC
      ) AS rk
    FROM q8 JOIN sym c2 ON q8.dim = c2.dim AND q8.vec_id <> c2.vec_id
    GROUP BY q8.vec_id, c2.vec_id
  ) WHERE rk <= 3
),
qf AS (SELECT vec_id, v FROM c WHERE vec_id < 10),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qf.vec_id AS query_id, c.vec_id AS neighbor_id,
      row_number() OVER (
        PARTITION BY qf.vec_id
        ORDER BY ROUND(list_dot_product(qf.v, c.v)
          / (sqrt(list_dot_product(qf.v, qf.v))
             * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
          c.vec_id ASC
      ) AS rk
    FROM qf JOIN c ON qf.vec_id <> c.vec_id
  ) WHERE rk <= 3
)
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits_raw,
  TRUE AS whitened_hits_ok
FROM exact e
LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
""",
)
def whitened_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")

    def int8_hits(frame: DataFrame) -> DataFrame:
        exact = S.cosine_topk(
            frame, frame.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
        ).select("query_id", "neighbor_id")
        ma = float(
            S.global_max_abs(frame, "embedding").collect()[0]["max_abs"]
        )
        codes = S.symmetric_quantize(frame, ma, "vec_id", "embedding")
        approx = S.int8_topk(
            codes, codes.filter(F.col("vec_id") < 10), "vec_id", k=3
        ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
        joined = exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["a_neighbor"]),
            "left",
        ).select(exact["query_id"], "a_neighbor")
        return joined.groupBy("query_id").agg(
            F.count("a_neighbor").cast("long").alias("n_hits")
        )

    raw = int8_hits(emb.select("vec_id", "embedding"))
    wh = S.whiten_embeddings(emb, "embedding", 64).select(
        "vec_id", F.col("whitened").alias("embedding")
    )
    whitened = int8_hits(wh)
    return raw.join(whitened, "query_id").select(
        "query_id",
        raw["n_hits"].alias("n_hits_raw"),
        (whitened["n_hits"] >= 1).alias("whitened_hits_ok"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve of crawl dominance — cumulative doc share by domain
# rank over the TOP-K head plus one "(other)" tail bucket, the Pareto
# view behind per-domain caps. Exact integer cumsums divided by the
# BIGINT total (single IEEE division per row).
#
# Scale note (replaces the r4 full-table formulation): a real crawl
# has 10^8+ registrable domains, and a global rank + running sum over
# all of them is a single-partition window. The curve is read at the
# head anyway, so this computes it over the top K=50 domains (small
# enough that the tail bucket is exercised on the ~100-domain
# testdata, so its branch is oracle-proven, not vacuous) —
# obtained via orderBy().limit() which Spark plans as
# TakeOrderedAndProject (per-partition top-K, driver merge; no global
# sort shuffle) — and folds the remainder into one "(other)" row whose
# cum_share is exactly 1. The rank/cumsum window then spans ≤K rows, a
# bounded frame on the guard-test allowlist.
# ---------------------------------------------------------------------------

_LORENZ_K = 50

@_q(
    "domain_lorenz",
    f"""
WITH {_DUCK_URL_PARSE},
counts AS (
  SELECT registrable_domain, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM parsed GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t FROM counts),
topk AS (
  SELECT registrable_domain, n_docs FROM counts
  ORDER BY n_docs DESC, registrable_domain ASC LIMIT {_LORENZ_K}
),
ranked AS (
  SELECT registrable_domain, n_docs,
    CAST(row_number() OVER (
      ORDER BY n_docs DESC, registrable_domain ASC) AS BIGINT) AS rank,
    CAST(SUM(n_docs) OVER (
      ORDER BY n_docs DESC, registrable_domain ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_docs
  FROM topk
),
head AS (
  SELECT rank, registrable_domain, n_docs, cum_docs,
         CAST(cum_docs AS DOUBLE) / t AS cum_share
  FROM ranked CROSS JOIN tot
),
tail AS (
  SELECT CAST((SELECT COUNT(*) FROM topk) + 1 AS BIGINT) AS rank,
         '(other)' AS registrable_domain,
         CAST(t - (SELECT SUM(n_docs) FROM topk) AS BIGINT) AS n_docs,
         t AS cum_docs,
         CAST(1.0 AS DOUBLE) AS cum_share
  FROM tot
  WHERE t > (SELECT SUM(n_docs) FROM topk)
)
SELECT * FROM head UNION ALL SELECT * FROM tail
""",
)
def domain_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    parsed = W.parse_urls(_with_urls(spark, sf_dir), "url")
    counts = parsed.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").cast("long").alias("t"))
    # TakeOrderedAndProject: per-partition top-K + driver merge, no
    # global sort shuffle.
    topk = counts.orderBy(
        F.desc("n_docs"), F.asc("registrable_domain")
    ).limit(_LORENZ_K)
    w = Window.orderBy(
        F.desc("n_docs"), F.asc("registrable_domain")
    )
    # Bounded-frame window: <= _LORENZ_K rows (guard-test allowlist).
    ranked = topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "registrable_domain",
        "n_docs",
        F.sum("n_docs")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum_docs"),
    )
    head = ranked.crossJoin(F.broadcast(tot)).select(
        "rank",
        "registrable_domain",
        "n_docs",
        "cum_docs",
        (F.col("cum_docs").cast("double") / F.col("t")).alias("cum_share"),
    )
    top_sum = topk.agg(
        F.sum("n_docs").cast("long").alias("top_docs"),
        F.count(F.lit(1)).cast("long").alias("n_top"),
    )
    tail = (
        tot.crossJoin(F.broadcast(top_sum))
        .filter(F.col("t") > F.col("top_docs"))
        .select(
            (F.col("n_top") + 1).cast("long").alias("rank"),
            F.lit("(other)").alias("registrable_domain"),
            (F.col("t") - F.col("top_docs")).cast("long").alias("n_docs"),
            F.col("t").cast("long").alias("cum_docs"),
            F.lit(1.0).cast("double").alias("cum_share"),
        )
    )
    return head.unionByName(tail)


# ---------------------------------------------------------------------------
# Fold balance audit — chi-square of fold × source over the k-fold
# assignment: a fold system is usable only if every fold carries the
# same source mix (a hot fold leaks distribution shift into CV). Same
# contingency arithmetic as event_type_independence, composed over
# kfold_assign.
# ---------------------------------------------------------------------------

@_q(
    "fold_source_balance",
    f"""
WITH folds AS (
  SELECT CAST(({_KFOLD_BUCKET_SQL}) % 5 AS BIGINT) AS fold, source
  FROM documents
),
cells AS (
  SELECT fold, source, CAST(COUNT(*) AS BIGINT) AS obs
  FROM folds GROUP BY 1, 2
),
rows_ AS (SELECT fold, CAST(SUM(obs) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
cols_ AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_tot FROM cells),
contrib AS (
  -- factors cast to DOUBLE BEFORE multiplying (the _CORR_EXPR
  -- discipline): int64 obs*n_tot overflows (throws under Spark ANSI)
  -- once totals pass ~3e9 rows; double products are exact below 2^53
  -- so the result is bit-identical on the committed SFs
  SELECT (CAST(obs AS DOUBLE) * CAST(n_tot AS DOUBLE)
        - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE))
       * (CAST(obs AS DOUBLE) * CAST(n_tot AS DOUBLE)
        - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE))
       / (CAST(n_tot AS DOUBLE) * row_tot * col_tot) AS c,
         CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
           / CAST(n_tot AS DOUBLE) AS rc_over_n,
         n_tot
  FROM cells JOIN rows_ USING (fold) JOIN cols_ USING (source)
  CROSS JOIN tot
)
SELECT
  CAST(SUM(CAST(ROUND(c * 1000000) AS BIGINT))
       + ANY_VALUE(n_tot) * 1000000
       - SUM(CAST(ROUND(rc_over_n * 1000000) AS BIGINT))
       AS DOUBLE) / 1000000.0
    AS chi_square,
  (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM rows_)
    * (SELECT CAST((COUNT(*) - 1) AS BIGINT) FROM cols_) AS dof
FROM contrib
""",
)
def fold_source_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    folds = SA.kfold_assign(docs, "doc_id", 5).select("fold", "source")
    cells = folds.groupBy("fold", "source").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    rows_ = cells.groupBy("fold").agg(
        F.sum("obs").cast("long").alias("row_tot")
    )
    cols_ = cells.groupBy("source").agg(
        F.sum("obs").cast("long").alias("col_tot")
    )
    tot = cells.agg(F.sum("obs").cast("long").alias("n_tot"))
    dof = (
        rows_.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(cols_.agg(F.count(F.lit(1)).alias("nc")))
        .select(
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof")
        )
    )
    contrib = (
        cells.join(F.broadcast(rows_), "fold")
        .join(F.broadcast(cols_), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            # factors cast to DOUBLE before multiplying — int64
            # obs*n_tot throws under ANSI past ~3e9 total rows; exact
            # below 2^53 so values are unchanged at committed SFs
            (
                (
                    F.col("obs").cast("double")
                    * F.col("n_tot").cast("double")
                    - F.col("row_tot").cast("double")
                    * F.col("col_tot").cast("double")
                )
                * (
                    F.col("obs").cast("double")
                    * F.col("n_tot").cast("double")
                    - F.col("row_tot").cast("double")
                    * F.col("col_tot").cast("double")
                )
                / (
                    F.col("n_tot").cast("double")
                    * F.col("row_tot")
                    * F.col("col_tot")
                )
            ).alias("c"),
            # structurally-zero cells owe their expected mass
            # row*col/N (Σ_all r*c = N² closed form — see
            # quality.cramers_v); dense grids make this a no-op
            (
                F.col("row_tot").cast("double")
                * F.col("col_tot").cast("double")
                / F.col("n_tot").cast("double")
            ).alias("rc_over_n"),
            "n_tot",
        )
    )
    chi = contrib.agg(
        (
            (
                F.sum(F.round(F.col("c") * 1000000, 0).cast("long"))
                + F.first("n_tot") * F.lit(1_000_000)
                - F.sum(
                    F.round(F.col("rc_over_n") * 1000000, 0).cast("long")
                )
            ).cast("double")
            / 1000000.0
        ).alias("chi_square")
    )
    return chi.crossJoin(F.broadcast(dof))


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split — assignment hashed on the
# REGISTRABLE DOMAIN, not the document, so near-duplicate pages from
# one site can never straddle train and eval (GroupKFold semantics).
# Output: per-split document and domain counts + a structural
# leakage check (domains appearing in >1 split — zero by construction,
# computed rather than asserted so the oracle proves it too).
# ---------------------------------------------------------------------------

def _leakage_split_oracle() -> str:
    lo, hi = SA.grouped_split_edges()
    bucket = SA.oracle_bucket_sql("registrable_domain")
    return f"""
WITH {_DUCK_URL_PARSE},
assigned AS (
  SELECT doc_id, registrable_domain,
         CASE WHEN {bucket} < {lo} THEN 'train'
              WHEN {bucket} < {hi} THEN 'val'
              ELSE 'test' END AS split
  FROM parsed
),
per_split AS (
  SELECT split,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT registrable_domain) AS BIGINT) AS n_domains
  FROM assigned GROUP BY 1
),
leak AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_leaked_domains FROM (
    SELECT registrable_domain FROM assigned
    GROUP BY 1 HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT split, n_docs, n_domains, n_leaked_domains
FROM per_split CROSS JOIN leak
"""


@_q("leakage_safe_split", _leakage_split_oracle())
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    urls = _with_urls(spark, sf_dir)
    parsed = W.parse_urls(urls, "url")
    assigned = SA.grouped_split(parsed, "registrable_domain")
    per_split = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("registrable_domain")
        .cast("long")
        .alias("n_domains"),
    )
    leak = (
        assigned.groupBy("registrable_domain")
        .agg(F.countDistinct("split").alias("__s"))
        .filter(F.col("__s") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked_domains"))
    )
    return per_split.crossJoin(F.broadcast(leak))


# ---------------------------------------------------------------------------
# Truncated-dimension (matryoshka-style) recall: search with only the
# FIRST half of each embedding and score recall@3 against the full-dim
# exact top-3 — the dimension-reduction honesty number beside the int8
# (`ann_recall_report`) and whitening (`whitened_ann_recall`) axes: MRL
# serving keeps a prefix of the vector, and this is what that costs.
# ---------------------------------------------------------------------------

@_q(
    "truncated_dim_recall",
    """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d2 AS (SELECT CAST(MIN(len(v)) // 2 AS BIGINT) AS h FROM c),
ct AS (
  SELECT vec_id, list_slice(v, 1, h) AS v FROM c CROSS JOIN d2
),
qf AS (SELECT vec_id, v FROM c WHERE vec_id < 10),
qt AS (SELECT vec_id, v FROM ct WHERE vec_id < 10),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qf.vec_id AS query_id, c.vec_id AS neighbor_id,
      row_number() OVER (
        PARTITION BY qf.vec_id
        ORDER BY ROUND(list_dot_product(qf.v, c.v)
          / (sqrt(list_dot_product(qf.v, qf.v))
             * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
          c.vec_id ASC
      ) AS rk
    FROM qf JOIN c ON qf.vec_id <> c.vec_id
  ) WHERE rk <= 3
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qt.vec_id AS query_id, ct.vec_id AS neighbor_id,
      row_number() OVER (
        PARTITION BY qt.vec_id
        ORDER BY ROUND(list_dot_product(qt.v, ct.v)
          / (sqrt(list_dot_product(qt.v, qt.v))
             * sqrt(list_dot_product(ct.v, ct.v))), 6) DESC,
          ct.vec_id ASC
      ) AS rk
    FROM qt JOIN ct ON qt.vec_id <> ct.vec_id
  ) WHERE rk <= 3
)
SELECT e.query_id,
  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
  CAST(COUNT(a.neighbor_id) AS DOUBLE) / 3 AS recall_at_3
FROM exact e
LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
""",
)
def truncated_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of half-dimension (prefix-truncated) cosine search vs
    the full-dimension exact top-3 — the matryoshka serving trade-off
    measured on this corpus; both sides deterministic (rounded-cosine
    rank with id tiebreak), so even the recall numbers hash-match."""
    emb = load(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").head()[0])
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, d // 2).alias("embedding")
    )
    exact = S.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    ).select("query_id", "neighbor_id")
    approx = S.cosine_topk(
        trunc, trunc.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    ).select("query_id", F.col("neighbor_id").alias("a_neighbor"))
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["a_neighbor"]),
        "left",
    ).select(exact["query_id"], "a_neighbor")
    return joined.groupBy("query_id").agg(
        F.count("a_neighbor").cast("long").alias("n_hits"),
        (F.count("a_neighbor").cast("double") / 3).alias("recall_at_3"),
    )
