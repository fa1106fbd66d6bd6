"""loss_mask_spans / fim_split (wave-4 r10): the span-offset contract
(slicing the ASSEMBLED document with the reported offsets reproduces
each turn verbatim) and the FIM reconstruction invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from redshift_etl_spark.operators.text import (
    assemble_conversations,
    fim_split,
    loss_mask_spans,
)
from redshift_etl_spark.queries.tables import load

from .conftest import SF_SMOKE


def test_spans_slice_back_to_turns(spark):
    ev = load(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("conv_id"), "ts", "event_id", "event_type", "props"
    )
    assembled = {
        r["conv_id"]: r["text"]
        for r in assemble_conversations(
            ev, "conv_id", ["ts", "event_id"], "event_type", "props"
        ).collect()
    }
    spans = loss_mask_spans(
        ev, "conv_id", ["ts", "event_id"], "event_type", "props",
        train_roles=("purchase", "signup"),
    ).collect()
    assert len(spans) > 0
    for s in spans:
        text = assembled[s["conv_id"]]
        turn = text[s["start_char"] : s["end_char"]]
        assert turn.startswith(f"<|{s['role']}|>"), (s, turn[:40])
        # a turn never spills into the separator or the next turn
        if s["end_char"] < len(text):
            assert text[s["end_char"]] == "\n"
        assert s["masked"] == (s["role"] not in ("purchase", "signup"))


def test_spans_cover_document_exactly(spark):
    ev = load(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("conv_id"), "ts", "event_id", "event_type", "props"
    )
    assembled = assemble_conversations(
        ev, "conv_id", ["ts", "event_id"], "event_type", "props"
    )
    spans = loss_mask_spans(
        ev, "conv_id", ["ts", "event_id"], "event_type", "props", ("purchase",)
    )
    per_conv = spans.groupBy("conv_id").agg(
        F.max("end_char").alias("last_end"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    j = per_conv.join(assembled, "conv_id").collect()
    for r in j:
        assert r["last_end"] == r["n_chars"]
        assert r["n_turns"] == r["n_turns"]


def test_fim_pieces_reassemble(spark):
    docs = load(spark, SF_SMOKE, "documents")
    out = fim_split(docs, "doc_id", "text", min_chars=30)
    j = out.join(docs, "doc_id").select(
        "doc_id", "text", "n_chars_doc", "cut1", "cut2"
    ).collect()
    assert len(j) > 0
    for r in j:
        t, c1, c2 = r["text"], r["cut1"], r["cut2"]
        assert 1 <= c1 < c2 < len(t) == r["n_chars_doc"]
        assert t[:c1] + t[c1:c2] + t[c2:] == t
        # all three pieces non-empty by the cut-range construction
        assert c1 >= 1 and c2 - c1 >= 1 and len(t) - c2 >= 1


def test_fim_short_docs_filtered(spark):
    df = spark.createDataFrame(
        [(1, "x" * 29), (2, "y" * 30)], "doc_id: long, text: string"
    )
    ids = [r["doc_id"] for r in fim_split(df, "doc_id", "text").collect()]
    assert ids == [2]
