"""span_corruption — structural contract on real strings (the catalog
row only sees md5s): sentinels number 0..k-1 in order, inputs/targets
reassemble to the original token stream, and zero-corruption docs get
an empty target."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from redshift_etl_spark.operators.text import span_corruption, tokens_col
from redshift_etl_spark.queries.tables import load

from .conftest import SF_SMOKE


def _rendered(spark, docs):
    """Rerun the operator's own assembly but WITHOUT the md5, by
    patching the projection — cheapest: recompute inputs/targets with
    the same HOF expressions via a tiny local copy."""
    from redshift_etl_spark.operators.sampling import hash_bucket16

    L = 3
    toks = tokens_col("text")
    n = F.size(toks)
    nblocks = F.ceil(n / F.lit(L)).cast("int")
    doc = F.col("doc_id").cast("string")

    def corrupt(b):
        return (
            hash_bucket16(F.concat(doc, F.lit(":"), b.cast("string")), "t5")
            < 9830
        )

    blocks = F.sequence(F.lit(0), nblocks - 1)
    cblocks = F.filter(blocks, corrupt)

    def sentinel(b):
        return F.concat(
            F.lit("<X_"),
            (F.array_position(cblocks, b) - 1).cast("string"),
            F.lit(">"),
        )

    def block_toks(b):
        return F.slice(toks, b * L + 1, L)

    inputs = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                blocks,
                lambda b: F.when(corrupt(b), F.array(sentinel(b))).otherwise(
                    block_toks(b)
                ),
            )
        ),
    )
    targets = F.concat_ws(
        " ",
        F.flatten(
            F.transform(
                cblocks,
                lambda b: F.concat(F.array(sentinel(b)), block_toks(b)),
            )
        ),
    )
    return docs.select("doc_id", "text", inputs.alias("i"), targets.alias("t"))


def test_sentinels_pair_and_reassemble(spark):
    docs = load(spark, SF_SMOKE, "documents")
    rows = _rendered(spark, docs).collect()
    corrupted = 0
    for r in rows:
        in_sents = re.findall(r"<X_(\d+)>", r["i"])
        tg_sents = re.findall(r"<X_(\d+)>", r["t"])
        assert in_sents == tg_sents  # same ids, same order
        assert in_sents == [str(j) for j in range(len(in_sents))]
        if not in_sents:
            assert r["t"] == ""
            assert r["i"] == " ".join(r["text"].split(" "))
            continue
        corrupted += 1
        # splice the target spans back into the input -> original
        spans = re.split(r"<X_\d+> ?", r["t"])[1:]
        out = r["i"]
        for j, span in enumerate(spans):
            out = out.replace(f"<X_{j}>", span.rstrip(), 1)
        assert out == " ".join(r["text"].split(" ")), r["doc_id"]
    assert corrupted > 0  # the rate actually fires on this corpus


def test_md5_form_matches_rendered(spark):
    docs = load(spark, SF_SMOKE, "documents")
    md5s = {
        r["doc_id"]: (r["inputs_md5"], r["targets_md5"])
        for r in span_corruption(docs, "doc_id", "text").collect()
    }
    import hashlib

    for r in _rendered(spark, docs).collect():
        want = (
            hashlib.md5(r["i"].encode()).hexdigest(),
            hashlib.md5(r["t"].encode()).hexdigest(),
        )
        assert md5s[r["doc_id"]] == want


def test_zero_token_stream_yields_no_blocks(spark):
    """sequence(0, -1) in Spark is the descending [0, -1]; a tokenizer
    that ever emits an empty token array must produce ZERO blocks (like
    the oracle's range()), not two phantom ones (r10 ADVICE). Exercised
    through the real transform by patching tokens to filter empties."""
    from unittest import mock

    from pyspark.sql import functions as F

    from redshift_etl_spark.operators import text as TX

    def filtering_tokens(col):
        return F.filter(F.split(F.col(col), " "), lambda t: t != "")

    df = spark.createDataFrame([("d1", ""), ("d2", "a b c d")],
                               "doc_id string, text string")
    with mock.patch.object(TX, "tokens_col", filtering_tokens):
        out = {r["doc_id"]: r for r in
               TX.span_corruption(df, "doc_id", "text").collect()}
    assert out["d1"]["n_tokens"] == 0
    assert out["d1"]["n_corrupt_blocks"] == 0
    assert out["d2"]["n_tokens"] == 4
