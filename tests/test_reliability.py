"""Krippendorff's alpha and WOE/IV (`operators/quality.py`) — edge
semantics the sf-oracle parity can't isolate: missing ratings, >3
raters (general L = lcm(1..R−1)), degenerate margins, zero-count bins.
The alpha cross-check is an independent pure-python implementation of
the same exact-integer formula — identical integers must give the
IDENTICAL double."""

from __future__ import annotations

import math

import pytest

from redshift_etl_spark.operators.quality import krippendorff_alpha, woe_iv


def _alpha_local(triples):
    """Pure-python exact-integer Krippendorff (nominal)."""
    from collections import Counter, defaultdict

    by_item = defaultdict(list)
    raters = set()
    for item, rater, val in triples:
        if val is None:
            continue
        raters.add(rater)
        by_item[item].append(val)
    L = 1
    for d in range(2, max(2, len(raters))):
        L = math.lcm(L, d)
    margins: Counter = Counter()
    n = 0
    d_l = 0
    items = 0
    for vals in by_item.values():
        m = len(vals)
        if m < 2:
            continue
        items += 1
        n += m
        margins.update(vals)
        disagree = sum(
            1
            for i, a in enumerate(vals)
            for j, b in enumerate(vals)
            if i != j and a != b
        )
        d_l += disagree * (L // (m - 1))
    sum_nc2 = sum(c * c for c in margins.values())
    de_num = n * n - sum_nc2
    alpha = None if de_num == 0 else 1.0 - (d_l * (n - 1)) / (L * de_num)
    return items, n, alpha


def _run(spark, triples):
    df = spark.createDataFrame(triples, "item: string, rater: string, val: string")
    return krippendorff_alpha(df, "item", "rater", "val").collect()[0]


def test_alpha_matches_independent_reference_four_raters(spark):
    # 4 raters → m−1 ∈ {1,2,3} → L = 6: exercises the general lcm
    # scaling, with missing ratings sprinkled in
    triples = []
    vals = ["a", "b", "c"]
    for i in range(40):
        item = f"i{i}"
        for r in range(4):
            if (i + r) % 5 == 0:
                continue  # missing rating
            triples.append((item, f"r{r}", vals[(i * (r + 1)) % 3]))
    row = _run(spark, triples)
    items, n, alpha = _alpha_local(triples)
    assert row["n_items"] == items
    assert row["n_values"] == n
    assert row["alpha"] == alpha  # exact: same integers, one division


def test_alpha_perfect_agreement_is_one(spark):
    triples = [(f"i{i}", f"r{r}", f"v{i % 4}") for i in range(20) for r in range(3)]
    row = _run(spark, triples)
    assert row["alpha"] == 1.0
    assert row["do_rate"] == 0.0


def test_alpha_degenerate_single_category_is_null(spark):
    triples = [(f"i{i}", f"r{r}", "only") for i in range(5) for r in range(2)]
    row = _run(spark, triples)
    assert row["alpha"] is None


def test_alpha_unpairable_items_drop(spark):
    base = [(f"i{i}", f"r{r}", f"v{(i + r) % 2}") for i in range(10) for r in range(2)]
    solo = [(f"solo{i}", "r0", "v0") for i in range(7)]
    assert _run(spark, base) == _run(spark, base + solo)


def test_woe_iv_hand_check_and_null_bins(spark):
    # bin A: 30 good / 10 bad; bin B: 10 good / 30 bad; bin C: 20 good /
    # 0 bad (NULL woe — zero-count signal, not ±inf)
    rows = (
        [("A", False)] * 30 + [("A", True)] * 10
        + [("B", False)] * 10 + [("B", True)] * 30
        + [("C", False)] * 20
    )
    df = spark.createDataFrame(rows, "bin: string, bad: boolean")
    out = {r["bin"]: r for r in woe_iv(df, "bin", "bad").collect()}
    tg, tb = 60, 40
    woe_a = math.log((30 / tg) / (10 / tb))
    assert out["A"]["woe"] == woe_a
    assert out["A"]["iv"] == (30 / tg - 10 / tb) * woe_a
    assert out["B"]["woe"] == math.log((10 / tg) / (30 / tb))
    assert out["C"]["woe"] is None and out["C"]["iv"] is None
    assert out["A"]["n"] == 40 and out["A"]["n_bad"] == 10 and out["A"]["n_good"] == 30


def test_alpha_refuses_rater_pool_past_int64_lcm(spark):
    """lcm(1..R−1) overflows int64 at R=44: the scaled-integer fold
    cannot be represented, so the operator must refuse loudly instead
    of emitting an overflowed SQL literal (r10 ADVICE, quality.py)."""
    import pytest

    from redshift_etl_spark.operators.quality import krippendorff_alpha

    rows = [("item", f"r{i}", "x") for i in range(44)]
    df = spark.createDataFrame(rows, "i string, r string, v string")
    with pytest.raises(ValueError, match="rater pool"):
        krippendorff_alpha(df, "i", "r", "v").collect()
    # 43 raters is the last representable pool — must still compute
    ok = krippendorff_alpha(
        df.where("r <> 'r43'"), "i", "r", "v"
    ).first()
    assert ok["alpha"] is None  # single category: degenerate margins


def test_specific_agreement_hand_check(spark):
    """2 raters (L=1): item1 both 'x' (agree), item2 split x/y, item3
    both 'y'. Margins: x=3, y=3. o_xx = 2 ordered agreeing pairs / 1;
    SA_x = 2/3. Same for y."""
    from redshift_etl_spark.operators.quality import specific_agreement

    rows = [
        ("i1", "r1", "x"), ("i1", "r2", "x"),
        ("i2", "r1", "x"), ("i2", "r2", "y"),
        ("i3", "r1", "y"), ("i3", "r2", "y"),
    ]
    df = spark.createDataFrame(rows, "i string, r string, v string")
    out = {r["val"]: r for r in
           specific_agreement(df, "i", "r", "v").collect()}
    assert out["x"]["n_ratings"] == 3 and out["y"]["n_ratings"] == 3
    assert abs(out["x"]["agreement"] - 2 / 3) < 1e-12
    assert abs(out["y"]["agreement"] - 2 / 3) < 1e-12


def test_specific_agreement_never_agreed_category_is_zero(spark):
    from redshift_etl_spark.operators.quality import specific_agreement

    rows = [("i1", "r1", "x"), ("i1", "r2", "z")]
    df = spark.createDataFrame(rows, "i string, r string, v string")
    out = {r["val"]: r["agreement"] for r in
           specific_agreement(df, "i", "r", "v").collect()}
    assert out == {"x": 0.0, "z": 0.0}
