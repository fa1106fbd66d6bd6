"""zipf_fit — exact-match vs an independent pure-python OLS of the
same nano-rounded formula, plus the degenerate variance-0 case."""

from __future__ import annotations

import math
from collections import Counter

from redshift_etl_spark.operators.text import zipf_fit


def _slope_local(texts):
    cnt = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [round(math.log(i + 1) * 1e9) for i in range(len(ranked))]
    ys = [round(math.log(c) * 1e9) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    return (
        n,
        sum(cnt.values()),
        None if den == 0 else (n * sxy - sx * sy) / den,
    )


def test_zipf_matches_independent_reference(spark):
    texts = [
        "the quick brown fox the lazy dog the end",
        "the dog and the fox ran and ran",
        "quick quick brown end",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    row = zipf_fit(df, "text").collect()[0]
    n_types, n_tokens, slope = _slope_local(texts)
    assert row["n_types"] == n_types
    assert row["n_tokens"] == n_tokens
    assert row["slope"] == slope  # same integers, one division


def test_zipf_single_type_is_null(spark):
    df = spark.createDataFrame([("x x x",), ("x",)], "text: string")
    row = zipf_fit(df, "text").collect()[0]
    assert row["n_types"] == 1 and row["slope"] is None
