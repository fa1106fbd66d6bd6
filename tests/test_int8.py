"""int8 scalar quantization: code range/error bounds, determinism, and
compressed-domain search recall vs exact float cosine; strip_html
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators import similarity as S
from redshift_etl_spark.operators import text as TX

from .conftest import SF_ORACLE


def _emb(spark):
    from redshift_etl_spark.queries.tables import load

    return load(spark, SF_ORACLE, "embeddings")


def test_codes_in_range_and_error_bounded(spark):
    emb = _emb(spark)
    params = S.dim_minmax(emb, "embedding")
    codes = S.scalar_quantize(emb, params, "vec_id", "embedding")
    mm = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("d"),
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] <= 254 and mm["d"] == 64
    # reconstruction error ≤ half a quantization step per dim
    p = {r["dim"]: (r["lo"], r["hi"]) for r in params.collect()}
    row = emb.filter(F.col("vec_id") == 7).collect()[0]
    crow = codes.filter(F.col("vec_id") == 7).collect()[0]
    for i, (v, c) in enumerate(zip(row["embedding"], crow["codes"])):
        lo, hi = p[i]
        step = (hi - lo) / 254 if hi > lo else 0.0
        deq = lo + c * step
        assert abs(float(v) - deq) <= step / 2 + 1e-12


def test_quantize_partition_invariant(spark):
    emb = _emb(spark)
    params = S.dim_minmax(emb, "embedding")
    a = {
        r["vec_id"]: r["codes"]
        for r in S.scalar_quantize(emb, params).collect()
    }
    b = {
        r["vec_id"]: r["codes"]
        for r in S.scalar_quantize(emb.repartition(13), params).collect()
    }
    assert a == b


def test_int8_search_recall_vs_exact_dot(spark):
    import numpy as np

    emb = _emb(spark)
    k = 5
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    truth = {}
    for qi in range(len(rows)):
        if ids[qi] >= 10:
            continue
        d = mat @ mat[qi]
        order = sorted(
            (i for i in range(len(rows)) if i != qi),
            key=lambda i: (-d[i], ids[i]),
        )[:k]
        truth[int(ids[qi])] = {int(ids[i]) for i in order}
    ma = float(S.global_max_abs(emb, "embedding").collect()[0]["max_abs"])
    codes = S.symmetric_quantize(emb, ma)
    got = {}
    for r in S.int8_topk(codes, codes.filter(F.col("vec_id") < 10),
                         "vec_id", k=k).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # symmetric quantization preserves dot ranking up to quantization
    # noise — demand high overlap with the exact float dot top-k
    hits = sum(len(truth[q] & got[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_symmetric_codes_in_range(spark):
    emb = _emb(spark)
    ma = float(S.global_max_abs(emb, "embedding").collect()[0]["max_abs"])
    codes = S.symmetric_quantize(emb, ma)
    mm = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).collect()[0]
    assert -127 <= mm["lo"] and mm["hi"] <= 127
    assert abs(mm["lo"]) == 127 or mm["hi"] == 127  # scale is tight


def test_strip_html_semantics(spark):
    cases = [
        (
            "<html><head><style>p{x}</style></head><body>"
            "<script>var x = '<b>';</script><p>Hello &amp; goodbye</p>"
            "<nav>menu</nav></body></html>",
            "Hello & goodbye menu",
        ),
        ("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b", "a <tag> \"q\" 's' b"),
        # &amp; decodes LAST: escaped entity yields literal entity text
        ("x &amp;lt; y", "x &lt; y"),
        ("<p></p>", None),  # empty after strip → NULL
        ("plain text", "plain text"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", TX.strip_html("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_whitening_improves_int8_recall_on_correlated_dims(spark):
    """The ZCA preconditioner's reason to exist: when a few correlated
    directions dominate the variance, the single global int8 scale
    spends its 8 bits on them and starves the rest, wrecking
    compressed-domain ranking; whitening equalizes the spectrum first.
    Fixture: 3 dominant latent directions mixed into 16 dims + small
    noise (numpy-prototyped: raw ~3/30 hits vs whitened ~16/30).
    Recall is measured per space — int8 top-3 vs exact cosine top-3 of
    the SAME vectors — i.e. pure quantization fidelity."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, d, klat = 240, 16, 3
    z = rng.randn(n, klat)
    mix = rng.randn(klat, d) * np.array([12.0, 5.0, 2.0])[:, None]
    x = z @ mix + 0.15 * rng.randn(n, d)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )

    def int8_hits(frame):
        exact = S.cosine_topk(
            frame, frame.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
        ).select("query_id", "neighbor_id")
        ma = float(
            S.global_max_abs(frame, "embedding").collect()[0]["max_abs"]
        )
        codes = S.symmetric_quantize(frame, ma, "vec_id", "embedding")
        approx = S.int8_topk(
            codes, codes.filter(F.col("vec_id") < 10), "vec_id", k=3
        ).select("query_id", F.col("neighbor_id").alias("a"))
        j = exact.join(
            approx,
            (exact["query_id"] == approx["query_id"])
            & (exact["neighbor_id"] == approx["a"]),
            "left",
        )
        return sum(
            r["n"]
            for r in j.groupBy(exact["query_id"])
            .agg(F.count("a").alias("n"))
            .collect()
        )

    raw_hits = int8_hits(df)
    wh = S.whiten_embeddings(df, "embedding", d).select(
        "vec_id", F.col("whitened").alias("embedding")
    )
    wh_hits = int8_hits(wh)
    assert wh_hits > raw_hits, (raw_hits, wh_hits)
    assert wh_hits >= 10  # not just "slightly less broken"
