

def test_vocab_richness_hand_computed(spark):
    from redshift_etl_spark.operators.text import vocab_richness

    df = spark.createDataFrame(
        [
            ("s1", "a a a b b c"),      # tf: a=3 b=2 c=1
            ("s2", "x y"),              # tf: x=1 y=1
        ],
        "source string, text string",
    )
    out = {
        r["source"]: r.asDict()
        for r in vocab_richness(df, "source", "text").collect()
    }
    s1 = out["s1"]
    assert (s1["n_tokens"], s1["n_types"], s1["f1"], s1["f2"]) == (6, 3, 1, 1)
    # chao1 = 3 + 1*0/(2*2) = 3.0 ; simpson = (3*2 + 2*1)/ (6*5)
    assert s1["chao1"] == 3.0
    assert abs(s1["simpson"] - 8 / 30) < 1e-15
    s2 = out["s2"]
    # all hapax: chao1 = 2 + 1*0/2 = 2? f1=2 -> 2 + 2*1/(2*1) = 3.0
    assert (s2["f1"], s2["f2"]) == (2, 0)
    assert s2["chao1"] == 2 + (2 * 1) / 2.0
    assert s2["simpson"] == 0.0


def test_bigram_likelihood_hint_free_equivalence(spark):
    """broadcast_model=False (the unbounded-web-vocabulary path) must
    produce identical rows — the hint is strategy, not semantics."""
    from redshift_etl_spark.operators.text import bigram_likelihood

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} w{(i * 2) % 5} w{i % 3} end") for i in range(30)],
        "doc_id long, text string",
    )
    hinted = sorted(map(tuple, bigram_likelihood(docs).collect()))
    free = sorted(
        map(tuple, bigram_likelihood(docs, broadcast_model=False).collect())
    )
    assert hinted == free and len(hinted) == 30
