"""BPE merge training (operators/bpe.py) vs a plain-Python reference
implementation of classic greedy BPE."""

from __future__ import annotations

from collections import Counter

from redshift_etl_spark.operators.bpe import bpe_merges


def _reference_bpe(words: Counter, iterations: int):
    """Classic imperative BPE with (cnt DESC, lhs, rhs) tie-break."""
    vocab = {w: list(w) for w in words}
    rules = []
    for step in range(1, iterations + 1):
        pairs: Counter = Counter()
        for w, freq in words.items():
            t = vocab[w]
            for a, b in zip(t, t[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        rules.append((step, l, r, l + r, cnt))
        for w in vocab:
            t, out, i = vocab[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            vocab[w] = out
    return rules


def test_bpe_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lower",
        "aaaa aa aaa abab ab",
    ]
    words = Counter(w for t in texts for w in t.split(" "))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in bpe_merges(df, "text", 6).orderBy("step").collect()]
    want = _reference_bpe(words, 6)
    assert got == want


def test_bpe_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [("banana bandana ban " * 3,), ("ananas banana bans " * 2,)],
        "text string",
    )
    a = [tuple(r) for r in bpe_merges(df.repartition(1), "text", 4).collect()]
    b = [tuple(r) for r in bpe_merges(df.repartition(9), "text", 4).collect()]
    assert sorted(a) == sorted(b)


def test_bpe_encode_matches_reference(spark):
    from redshift_etl_spark.operators.bpe import bpe_encode, bpe_merges

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest lower",
    ]
    words = Counter(w for t in texts for w in t.split(" "))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    k = 6
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(df, "text", k).orderBy("step").collect()
    ]
    # reference: replay the same rules over each word
    vocab = {w: list(w) for w in words}
    for l, r in rules:
        for w in vocab:
            t, out, i = vocab[w], [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            vocab[w] = out
    want = {
        i: [tok for w in t.split(" ") for tok in vocab[w]]
        for i, t in enumerate(texts)
    }
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(df, "doc_id", "text", rules).collect()
    }
    assert got == want


def test_bpe_encode_on_real_corpus_shrinks_symbols(spark):
    """Applying trained rules to the sf0.001 documents corpus: every
    merge rule strictly reduces the total symbol count (each
    application replaces two symbols with one somewhere), and no
    document's token sequence reconstructs to different text."""
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.bpe import bpe_encode, bpe_merges
    from redshift_etl_spark.queries.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(100)
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merges(docs, "text", 3).orderBy("step").collect()
    ]
    enc0 = bpe_encode(docs, "doc_id", "text", [])
    enc3 = bpe_encode(docs, "doc_id", "text", rules)
    n0 = enc0.agg(F.sum(F.size("tokens"))).collect()[0][0]
    n3 = enc3.agg(F.sum(F.size("tokens"))).collect()[0][0]
    assert n3 < n0
    # lossless: concatenating a doc's symbols reproduces its text
    # modulo the word boundaries (symbols of each word concatenate to
    # the word)
    joined = enc3.select(
        "doc_id", F.concat_ws("", F.col("tokens")).alias("glued")
    )
    orig = docs.select(
        "doc_id", F.regexp_replace("text", " ", "").alias("glued")
    )
    assert (
        joined.join(orig, "doc_id")
        .filter(joined.glued != orig.glued)
        .count()
        == 0
    )
