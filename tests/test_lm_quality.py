"""Bigram-LM quality scoring (operators/text.bigram_likelihood)."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators import text as TX


def _corpus(spark):
    # 20 in-distribution docs from a tiny grammar + 1 garbled outlier
    rows = [
        (i, "the cat sat on the mat and the dog sat on the rug")
        for i in range(10)
    ] + [
        (10 + i, "the dog ran to the cat and the cat ran to the mat")
        for i in range(10)
    ] + [(99, "zqx vbn wfg plk zqx mjr tyu")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_outlier_scores_lowest(spark):
    docs = _corpus(spark)
    out = {
        r["doc_id"]: r["avg_bigram_likelihood"]
        for r in TX.bigram_likelihood(docs).collect()
    }
    assert len(out) == 21
    outlier = out.pop(99)
    assert outlier < min(out.values())


def test_likelihood_partition_invariant(spark):
    """Scaled-integer mean: identical bits under any partitioning."""
    docs = _corpus(spark)

    def snap(df):
        return {
            (r["doc_id"], r["n_bigrams"], r["avg_bigram_likelihood"],
             r["min_bigram_likelihood"])
            for r in TX.bigram_likelihood(df).collect()
        }

    assert snap(docs.repartition(13)) == snap(docs.coalesce(1))


def test_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")],
        "doc_id long, text string",
    )
    out = TX.bigram_likelihood(docs).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert out[0]["n_bigrams"] == 1


def test_model_relations_broadcast(spark):
    """Scoring joins must broadcast the model, not shuffle the bigram
    stream (the corpus-sized side)."""
    from redshift_etl_spark import plans as P

    docs = _corpus(spark)
    df = TX.bigram_likelihood(docs)
    assert P.tree_count(df, "BroadcastHashJoin") >= 2


def test_degenerate_uniform_text(spark):
    # one repeated token: c12 = c1 = n-1, V = 1 → p = n/(n-1+1) = 1.0
    docs = spark.createDataFrame(
        [(1, "a a a a a")], "doc_id long, text string"
    )
    r = TX.bigram_likelihood(docs).collect()[0]
    assert r["n_bigrams"] == 4
    assert r["avg_bigram_likelihood"] == 1.0


# --- span-level boilerplate dedup ------------------------------------------


def test_dedup_spans_removes_shared_keeps_unique(spark):
    docs = spark.createDataFrame(
        [
            (1, ["COPYRIGHT FOOTER", "alpha beta", "gamma delta"]),
            (2, ["COPYRIGHT FOOTER", "epsilon zeta"]),
            (3, ["unique only here"]),
        ],
        "doc_id long, spans array<string>",
    )
    out = {
        r["doc_id"]: r
        for r in TX.dedup_spans(docs, "doc_id", "spans").collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_spans_removed"] == 1
    assert out[2]["clean_text"] == "epsilon zeta"
    assert out[3]["clean_text"] == "unique only here"
    assert out[3]["n_spans_removed"] == 0


def test_dedup_spans_fully_boilerplate_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, ["SAME"]), (2, ["SAME"]), (3, ["SAME", "extra"])],
        "doc_id long, spans array<string>",
    )
    out = {
        r["doc_id"]: r
        for r in TX.dedup_spans(docs, "doc_id", "spans").collect()
    }
    assert out[1]["clean_text"] == "" and out[1]["n_spans_kept"] == 0
    assert out[3]["clean_text"] == "extra"


def test_dedup_spans_order_restored(spark):
    # within-doc duplicates are NOT boilerplate (1 distinct doc) and
    # order restoration must be by position, not value
    docs = spark.createDataFrame(
        [(1, ["z end", "a start", "z end"])],
        "doc_id long, spans array<string>",
    )
    out = TX.dedup_spans(docs, "doc_id", "spans").collect()[0]
    assert out["clean_text"] == "z end a start z end"


# --- compression signals ----------------------------------------------------


def test_compression_signals_match_local_zlib(spark):
    import zlib

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "spam " * 200),          # repetitive → tiny ratio
        (3, ""),                      # empty → ratio 1.0 by convention
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TX.compression_signals(docs).collect()}
    for i, t in texts:
        b = t.encode()
        assert out[i]["raw_bytes"] == len(b)
        assert out[i]["compressed_bytes"] == len(zlib.compress(b, 6))
    assert out[2]["deflate_ratio"] < 0.05 < out[1]["deflate_ratio"]
    assert out[3]["deflate_ratio"] == 1.0


def test_approx_distinct_within_hll_error_bound(spark):
    """The catalog query emits the portable contract (exact count +
    within_tol); this test pins the underlying sketch directly: at
    rsd=0.02 the estimate must sit well inside ±5 standard deviations
    (catches a silently mis-wired sketch), which is exactly the
    within_tol=TRUE the oracle asserts."""
    from redshift_etl_spark.queries import llm_data as L  # noqa: F401
    from redshift_etl_spark.queries import relational as R  # noqa: F401
    from redshift_etl_spark import queries as Q

    from .conftest import SF_ORACLE

    rows = Q.all_queries()["approx_distinct"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["within_tol"] is True, r
        assert r["exact_users"] > 0


def test_token_chunks_column_overload_matches_string_overload(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    ws = df.withColumn("w", F.split("text", " "))
    by_name = ws.select("doc_id", TX.token_chunks("w", 3).alias("c"))
    by_col = ws.select("doc_id", TX.token_chunks(F.col("w"), 3).alias("c"))
    got_name = {r["doc_id"]: r["c"] for r in by_name.collect()}
    got_col = {r["doc_id"]: r["c"] for r in by_col.collect()}
    assert got_name == got_col
    assert got_name[1] == ["a b c", "d e f", "g"]
    assert got_name[2] == ["x y"]
    assert got_name[3] == ["solo"]


def test_assemble_conversations_order_and_render(spark):
    rows = [
        (1, 2, "assistant", "hi there"),
        (1, 1, "user", "hello"),
        (1, 3, "user", "bye"),
        (2, 1, "user", "solo"),
    ]
    df = spark.createDataFrame(rows, ["conv", "turn", "role", "content"])
    out = {
        r["conv"]: (r["text"], r["n_turns"], r["n_chars"])
        for r in TX.assemble_conversations(
            df, "conv", ["turn"], "role", "content"
        ).collect()
    }
    t1 = "<|user|>hello\n<|assistant|>hi there\n<|user|>bye"
    assert out[1] == (t1, 3, len(t1))
    assert out[2] == ("<|user|>solo", 1, len("<|user|>solo"))
    # partition-invariant
    out2 = {
        r["conv"]: r["text"]
        for r in TX.assemble_conversations(
            df.repartition(5), "conv", ["turn"], "role", "content"
        ).collect()
    }
    assert out2 == {c: t for c, (t, _n, _ch) in out.items()}
