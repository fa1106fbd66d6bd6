"""Span-level exact-substring decontamination
(`dedup.contamination_spans`): planted-leak boundary exactness,
maximal-span merging (overlapping alignments AND exact adjacency),
window gating, and the scale-plan contract — the benchmark gram set is
a broadcast probe, so no gram-grain exchange exists anywhere."""

from __future__ import annotations

from redshift_etl_spark.operators import dedup as D


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _w(prefix, n):
    return [f"{prefix}{j}" for j in range(n)]


def test_planted_leak_exact_boundaries(spark):
    bench_words = _w("b", 8)
    corpus_words = _w("c", 5) + bench_words + _w("d", 4)
    rows = D.contamination_spans(
        _df(spark, [(1, " ".join(corpus_words))]),
        _df(spark, [(100, " ".join(bench_words))]),
        "doc_id", "text", window=8,
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.span_start, r.span_end, r.span_tokens) == (5, 13, 8)
    assert r.span_text == " ".join(bench_words)


def test_overlapping_alignments_merge_to_one_maximal_span(spark):
    # a 12-token leak of w=8 flags 5 overlapping alignments — they
    # must merge to ONE maximal span covering exactly the leak
    bench_words = _w("b", 12)
    corpus_words = _w("c", 3) + bench_words + _w("d", 2)
    rows = D.contamination_spans(
        _df(spark, [(1, " ".join(corpus_words))]),
        _df(spark, [(100, " ".join(bench_words))]),
        "doc_id", "text", window=8,
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.span_start, r.span_end, r.span_tokens) == (3, 15, 12)
    assert r.span_text == " ".join(bench_words)


def test_adjacent_leaks_merge_separated_leaks_do_not(spark):
    # two different benchmark docs leaked back-to-back: the junction
    # 8-grams (mixing x and y tokens) are NOT benchmark grams, so the
    # flagged starts are exactly {3, 11} — distance w merges them into
    # one 16-token span. With a gap token between the leaks the starts
    # are {3, 12} — distance w+1, two spans.
    bx, by = _w("x", 8), _w("y", 8)
    bench = _df(spark, [(100, " ".join(bx)), (101, " ".join(by))])
    adjacent = _w("c", 3) + bx + by + _w("d", 2)
    rows = D.contamination_spans(
        _df(spark, [(1, " ".join(adjacent))]), bench,
        "doc_id", "text", window=8,
    ).collect()
    assert [(r.span_start, r.span_end) for r in rows] == [(3, 19)]
    gapped = _w("c", 3) + bx + ["GAP"] + by + _w("d", 2)
    rows = (
        D.contamination_spans(
            _df(spark, [(1, " ".join(gapped))]), bench,
            "doc_id", "text", window=8,
        )
        .orderBy("span_start")
        .collect()
    )
    assert [(r.span_start, r.span_end) for r in rows] == [(3, 11), (12, 20)]
    assert rows[0].span_text == " ".join(bx)
    assert rows[1].span_text == " ".join(by)


def test_window_gates_short_overlaps_and_short_docs(spark):
    # 7 shared consecutive tokens < w=8: nothing flagged; a corpus doc
    # shorter than the window yields no grams at all
    bench_words = _w("b", 8)
    rows = D.contamination_spans(
        _df(
            spark,
            [
                (1, " ".join(_w("c", 4) + bench_words[:7] + _w("d", 3))),
                (2, " ".join(bench_words[:5])),  # shorter than w
            ],
        ),
        _df(spark, [(100, " ".join(bench_words))]),
        "doc_id", "text", window=8,
    ).collect()
    assert rows == []


def test_gram_probe_is_broadcast_and_gram_grain_never_shuffles(spark):
    from redshift_etl_spark import plans as P

    bench_words = _w("b", 8)
    df = D.contamination_spans(
        _df(spark, [(1, " ".join(_w("c", 5) + bench_words))]),
        _df(spark, [(100, " ".join(bench_words))]),
        "doc_id", "text", window=8,
    )
    plan = P.physical_plan(df)
    # the gh probe is the broadcast join — the CORPUS gram slide is
    # map-only. The one gram-keyed exchange allowed is the
    # BENCHMARK-side distinct (eval-suite-sized, not corpus-sized).
    assert "BroadcastHashJoin" in plan
    assert plan.count("hashpartitioning(gh") <= 1
    # remaining exchanges are doc-grain (flagged-start agg + the token
    # rejoin's two sides) — never token- or corpus-gram-grain
    assert P.count_shuffles(df) <= 6
