"""Naive-Bayes classifier (`operators/nbayes.py`) — semantics the
sf-oracle parity can't isolate: a separable planted corpus classifies
perfectly, OOV handling is vocabulary-check-free, integer tie-breaks
are by class name, and the fit matches a hand computation."""

from __future__ import annotations

import math

from redshift_etl_spark.operators.nbayes import NANO, nb_classify, nb_fit


def _fit(spark, rows):
    df = spark.createDataFrame(rows, "cls: string, text: string")
    return df, *nb_fit(df, "cls", "text")


def test_separable_corpus_classifies_perfectly(spark):
    train = [("cat", "meow purr fur")] * 10 + [("dog", "woof bark tail")] * 10
    df, model, classes = _fit(spark, train)
    test = spark.createDataFrame(
        [(1, "meow meow fur"), (2, "bark woof woof"), (3, "purr meow")],
        "id: long, text: string",
    )
    pred = {r["id"]: r["predicted"] for r in nb_classify(test, "id", "text", model, classes).collect()}
    assert pred == {1: "cat", 2: "dog", 3: "cat"}


def test_fit_matches_hand_computation(spark):
    # train: class a = "x x y", class b = "y z" -> V = {x,y,z}, |V|=3
    df, model, classes = _fit(spark, [("a", "x x y"), ("b", "y z")])
    m = {(r["tok"], r["class"]): r["lp_nano"] for r in model.collect()}
    # class a: n_tok=3 -> p(x|a) = (2+1)/(3+3)
    assert m[("x", "a")] == round(math.log(3 / 6) * NANO)
    assert m[("y", "a")] == round(math.log(2 / 6) * NANO)
    assert ("z", "a") not in m  # only observed cells
    c = {r["class"]: r for r in classes.collect()}
    assert c["a"]["prior_nano"] == round(math.log(1 / 2) * NANO)
    assert c["a"]["default_nano"] == round(math.log(1 / 6) * NANO)
    assert c["b"]["default_nano"] == round(math.log(1 / 5) * NANO)


def test_oov_scoring_uses_default_mass(spark):
    df, model, classes = _fit(spark, [("a", "x x y"), ("b", "y z")])
    # "q q" is fully OOV: score_c = prior_c + 2*default_c exactly
    test = spark.createDataFrame([(1, "q q")], "id: long, text: string")
    row = nb_classify(test, "id", "text", model, classes).collect()[0]
    c = {r["class"]: r for r in classes.collect()}
    expect = {
        k: v["prior_nano"] + 2 * v["default_nano"] for k, v in c.items()
    }
    best = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (row["predicted"], row["score_nano"]) == best


def test_exact_tie_breaks_by_class_name(spark):
    # perfectly symmetric classes -> identical integer scores -> 'a' wins
    df, model, classes = _fit(spark, [("b", "x"), ("a", "x")])
    test = spark.createDataFrame([(1, "x")], "id: long, text: string")
    row = nb_classify(test, "id", "text", model, classes).collect()[0]
    assert row["predicted"] == "a"


def test_per_class_prf_hand_check(spark):
    from redshift_etl_spark.operators.quality import per_class_prf

    # conf cells: truth a: (a,a)=8, (a,b)=2 ; truth b: (b,b)=3, (b,a)=1
    # class c appears in truth only, never predicted -> precision NULL
    conf = spark.createDataFrame(
        [("a", "a", 8), ("a", "b", 2), ("b", "b", 3), ("b", "a", 1),
         ("c", "a", 2)],
        "t: string, p: string, n: long",
    )
    out = {r["class"]: r for r in per_class_prf(conf, "t", "p", "n").collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["tp"], a["fp"], a["fn"]) == (8, 3, 2)
    assert a["precision"] == 8 / 11 and a["recall"] == 8 / 10
    assert (b["tp"], b["fp"], b["fn"]) == (3, 2, 1)
    assert (c["tp"], c["fp"], c["fn"]) == (0, 0, 2)
    assert c["precision"] is None and c["f1"] is None
    assert out["a"]["n_undefined_f1"] == 1
    import math
    f1a = 2 * (8 / 11) * (8 / 10) / ((8 / 11) + (8 / 10))
    f1b = 2 * (3 / 5) * (3 / 4) / ((3 / 5) + (3 / 4))
    expect_macro = (round(f1a * 1e9) + round(f1b * 1e9)) / (1e9 * 2)
    assert math.isclose(out["a"]["macro_f1"], expect_macro, rel_tol=0, abs_tol=0)
