"""Deterministic-sampling contracts: run-to-run stability, growth
stability (new data never moves an existing row), and the stratified
cap semantics. These are the invariants training pipelines rely on to
avoid train/test leakage across re-runs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from redshift_etl_spark.operators import sampling as SP


def _docs(spark, n=400, groups=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % groups).cast("string").alias("src"),
    )


def test_split_is_deterministic_and_total(spark):
    df = _docs(spark)
    s1 = {r["doc_id"]: r["split"] for r in SP.deterministic_split(df, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"] for r in SP.deterministic_split(df, "doc_id").collect()}
    assert s1 == s2
    assert set(s1.values()) == {"train", "val", "test"}
    assert len(s1) == 400  # every row in exactly one split


def test_split_stable_under_growth(spark):
    small = SP.deterministic_split(_docs(spark, 100), "doc_id")
    big = SP.deterministic_split(_docs(spark, 400), "doc_id")
    small_map = {r["doc_id"]: r["split"] for r in small.collect()}
    big_map = {r["doc_id"]: r["split"] for r in big.collect()}
    # the original 100 rows keep their assignment exactly
    assert all(big_map[k] == v for k, v in small_map.items())


def test_hash_sample_is_subset_monotone(spark):
    df = _docs(spark)
    keep10 = {r["doc_id"] for r in SP.hash_sample(df, "doc_id", 0.1).collect()}
    keep30 = {r["doc_id"] for r in SP.hash_sample(df, "doc_id", 0.3).collect()}
    assert keep10 <= keep30  # growing the rate only ADDS rows


def test_stratified_cap_keeps_small_groups_whole(spark):
    df = _docs(spark, n=120, groups=3)  # 40 rows per group
    # cap far above the group size → edge = 256 → everything kept
    out = SP.stratified_cap_sample(df, key="doc_id", group="src", cap=1000)
    assert out.count() == 120
    # cap below group size → each group shrinks, deterministically
    sampled = SP.stratified_cap_sample(df, key="doc_id", group="src", cap=10)
    again = SP.stratified_cap_sample(df, key="doc_id", group="src", cap=10)
    a = sorted(r["doc_id"] for r in sampled.collect())
    b = sorted(r["doc_id"] for r in again.collect())
    assert a == b and 0 < len(a) < 120


def test_sequence_packs_chunk_boundaries(spark):
    # docs of 100 tokens each, cap 250: first-token offsets 0,100,200,
    # 300,400 → packs 0,0,0,1,1 (doc 3 starts at 300 → pack 1; the
    # boundary doc 2 spills pack 0 to 300 tokens — concat-then-chunk)
    df = spark.createDataFrame(
        [("s", i, 100) for i in range(5)], "src string, doc_id long, tok int"
    )
    out = {
        (r["pack_group"], r["pack_id"]): (r["n_docs"], r["total_tokens"])
        for r in SP.sequence_packs(
            df, "src", "doc_id", F.col("tok").cast("long"), cap=250
        ).collect()
    }
    assert out == {("s", 0): (3, 300), ("s", 1): (2, 200)}


def test_sequence_packs_groups_independent(spark):
    # each group restarts its token stream at pack 0
    df = spark.createDataFrame(
        [("a", 0, 600), ("a", 1, 600), ("b", 0, 10)],
        "src string, doc_id long, tok int",
    )
    rows = SP.sequence_packs(
        df, "src", "doc_id", F.col("tok").cast("long"), cap=512
    ).collect()
    packs = {(r["pack_group"], r["pack_id"]) for r in rows}
    assert packs == {("a", 0), ("a", 1), ("b", 0)}


def test_contamination_hits_and_ratio(spark):
    from redshift_etl_spark.operators import dedup as D

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 'the quick brown'
            (2, "totally unrelated words here novel"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown cat")], "doc_id long, text string"
    )
    rows = D.contamination(corpus, bench, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    # doc 1 has 3 shingles, 1 overlapping
    assert rows[0]["n_shingles"] == 3 and rows[0]["n_hits"] == 1
    assert abs(rows[0]["hit_ratio"] - 1 / 3) < 1e-12


def test_mixture_concentration_metrics(spark):
    from redshift_etl_spark.operators import sampling as SA

    df = spark.createDataFrame(
        [("s1", "en")] * 8 + [("s1", "fr")] * 2 + [("s2", "en")] * 5,
        "source string, lang string",
    )
    got = {
        r["source"]: r
        for r in SA.mixture_concentration(df, "source", "lang").collect()
    }
    s1 = got["s1"]  # shares 0.8/0.2 → HHI 0.68
    assert s1["n_categories"] == 2
    assert abs(s1["hhi"] - 0.68) < 1e-12
    assert abs(s1["gini_impurity"] - 0.32) < 1e-12
    assert s1["top_share"] == 0.8
    s2 = got["s2"]  # pure group
    assert s2["hhi"] == 1.0 and s2["gini_impurity"] == 0.0


def test_training_shuffle_is_a_stable_permutation(spark):
    from redshift_etl_spark.operators import sampling as SP2

    df = _docs(spark, 300)
    out = SP2.training_shuffle(df, "doc_id")
    rows = out.collect()
    assert len(rows) == 300
    # positions are contiguous 1..n within each bucket
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["shuffle_bucket"], []).append(r["bucket_pos"])
    for bucket, ps in by_bucket.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), bucket
    # stable under repartitioning
    again = {
        r["doc_id"]: (r["shuffle_bucket"], r["bucket_pos"])
        for r in SP2.training_shuffle(df.repartition(13), "doc_id").collect()
    }
    assert again == {
        r["doc_id"]: (r["shuffle_bucket"], r["bucket_pos"]) for r in rows
    }


def test_training_shuffle_salt_gives_independent_permutation(spark):
    from redshift_etl_spark.operators import sampling as SP2

    df = _docs(spark, 200)
    a = {
        r["doc_id"]: (r["shuffle_bucket"], r["bucket_pos"])
        for r in SP2.training_shuffle(df, "doc_id", salt="epoch0").collect()
    }
    b = {
        r["doc_id"]: (r["shuffle_bucket"], r["bucket_pos"])
        for r in SP2.training_shuffle(df, "doc_id", salt="epoch1").collect()
    }
    assert a != b                       # different epoch, different order
    assert set(a) == set(b)             # same membership


def test_exact_cap_sample_quota_and_stability(spark):
    from pyspark.sql import functions as F

    from redshift_etl_spark.operators import sampling as SP2

    df = _docs(spark, 300).withColumn(
        "grp", (F.col("doc_id") % 4).cast("string")
    )
    out = SP2.exact_cap_sample(df, "doc_id", "grp", 20)
    sizes = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(n == 20 for n in sizes.values())  # 75/group, capped to 20
    # stable under repartitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in SP2.exact_cap_sample(df.repartition(17), "doc_id", "grp", 20).collect()
    }
    assert a == b
    # small groups survive whole
    tiny = df.filter(F.col("doc_id") < 8)
    assert SP2.exact_cap_sample(tiny, "doc_id", "grp", 20).count() == 8


def test_token_budget_sample_budgets_and_determinism(spark):
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(f"d{i}", "web" if i % 2 else "code", 100 + (i * 37) % 400)
         for i in range(200)],
        "doc_id string, source string, n_tokens long",
    )
    budgets = {"web": 3000, "code": 1500}
    out = token_budget_sample(df, "source", "doc_id", "n_tokens", budgets)
    sums = {
        r["source"]: r["t"]
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    max_doc = 499
    for g, budget in budgets.items():
        assert budget <= sums[g] < budget + max_doc  # crosses once, <1 doc over
    # deterministic under repartitioning
    a = {tuple(r) for r in out.collect()}
    b = {
        tuple(r)
        for r in token_budget_sample(
            df.repartition(13), "source", "doc_id", "n_tokens", budgets
        ).collect()
    }
    assert a == b
    # unknown groups drop; tiny budget still yields >= 1 doc
    one = token_budget_sample(df, "source", "doc_id", "n_tokens", {"web": 1})
    assert one.count() == 1


def test_pack_sequences_properties(spark):
    """Concat-and-chunk invariants: (a) every shard except the last is
    exactly full; (b) each document's slices tile [0, tok) without gap
    or overlap; (c) shard-internal layout is gap-free; (d) the packing
    is independent of input partitioning."""
    import pyspark.sql.functions as F

    cap = 64
    rows = [(i, (i * 7) % 150 + 1) for i in range(200)] + [(999, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "tok"])
    out = SP.pack_sequences(df, "doc_id", F.col("tok"), cap).collect()

    total_tok = sum(t for _i, t in rows)
    by_shard, by_doc = {}, {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)

    assert 999 not in by_doc  # zero-token doc occupies no tape
    last = max(by_shard)
    assert sorted(by_shard) == list(range(last + 1))  # no empty shards
    for sid, srows in by_shard.items():
        tokens = sum(r["tok_end"] - r["tok_start"] for r in srows)
        if sid < last:
            assert tokens == cap, sid  # (a) full
        else:
            assert 0 < tokens <= cap
        # (c) gap-free layout inside the shard
        spans = sorted(
            (r["shard_offset"], r["shard_offset"] + r["tok_end"] - r["tok_start"])
            for r in srows
        )
        assert spans[0][0] == 0
        for (_s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert e1 == s2, (sid, spans)
    assert sum(t for _i, t in rows) == sum(
        r["tok_end"] - r["tok_start"] for r in out
    )
    for did, drows in by_doc.items():
        tok = dict(rows)[did]
        slices = sorted((r["tok_start"], r["tok_end"]) for r in drows)
        assert slices[0][0] == 0 and slices[-1][1] == tok
        for (_s1, e1), (s2, _e2) in zip(slices, slices[1:]):
            assert e1 == s2, (did, slices)  # (b) tile exactly
        # straddling docs sit in consecutive shards
        sids = sorted(r["shard_id"] for r in drows)
        assert sids == list(range(sids[0], sids[0] + len(sids)))

    # (d) partition invariance
    out2 = SP.pack_sequences(
        df.repartition(13), "doc_id", F.col("tok"), cap
    ).collect()
    key = lambda r: (r["shard_id"], r["doc_id"], r["tok_start"])  # noqa: E731
    assert sorted(map(lambda r: tuple(r), sorted(out, key=key))) == sorted(
        map(lambda r: tuple(r), sorted(out2, key=key))
    )


@pytest.mark.slow
def test_pack_sequences_matches_python_reference(spark):
    """Property check vs a brute-force Python packer across several
    capacities and size mixes (zero-token docs, giant docs spanning
    many shards, singleton corpus)."""
    import hashlib

    cases = [
        (7, [3, 0, 10, 7, 1, 25, 7, 7]),
        (16, [16, 16, 16]),
        (5, [1] * 23),
        (64, [200]),          # one doc spanning 4 shards
        (8, [9, 9, 9, 9]),    # every doc straddles
    ]
    for cap, sizes in cases:
        rows = [(i, t) for i, t in enumerate(sizes)]
        df = spark.createDataFrame(rows, ["doc_id", "tok"])
        got = sorted(
            (r["shard_id"], r["doc_id"], r["seq"], r["tok_start"],
             r["tok_end"], r["shard_offset"])
            for r in SP.pack_sequences(df, "doc_id", F.col("tok"), cap).collect()
        )
        # python reference: md5 tape order, running offsets, chunk cuts
        order = sorted(
            (i for i, t in rows if t > 0),
            key=lambda i: (
                hashlib.md5(f"pack:{i}".encode()).hexdigest(),
                i,
            ),
        )
        want, pos = [], 0
        for seq, i in enumerate(order, start=1):
            t = sizes[i]
            start = pos
            for sid in range(start // cap, (start + t - 1) // cap + 1):
                ts = max(0, sid * cap - start)
                te = min(t, sid * cap + cap - start)
                want.append((sid, i, seq, ts, te, max(0, start - sid * cap)))
            pos += t
        assert got == sorted(want), (cap, sizes)


def test_budget_waterfill_exact_allocation(spark):
    from redshift_etl_spark.operators.sampling import budget_waterfill

    counts = spark.createDataFrame(
        [("a", 100), ("b", 10), ("c", 50), ("d", 7)],
        "g string, n long",
    )
    out = {
        r["g"]: r.asDict()
        for r in budget_waterfill(counts, "g", "n", budget=80).collect()
    }
    # sorted (n, g): d(7) b(10) c(50) a(100); prefix 7,17,67,167
    # fund d,b fully (17); level = (80-17) div 2 = 31 rem 1 -> c gets
    # 32 (first capped in order), a gets 31
    assert out["d"]["alloc"] == 7 and not out["d"]["capped"]
    assert out["b"]["alloc"] == 10 and not out["b"]["capped"]
    assert out["c"]["alloc"] == 32 and out["c"]["capped"]
    assert out["a"]["alloc"] == 31 and out["a"]["capped"]
    assert sum(r["alloc"] for r in out.values()) == 80


def test_budget_waterfill_budget_exceeds_total(spark):
    from redshift_etl_spark.operators.sampling import budget_waterfill

    counts = spark.createDataFrame(
        [("a", 5), ("b", 3)], "g string, n long"
    )
    out = {
        r["g"]: r.asDict()
        for r in budget_waterfill(counts, "g", "n", budget=1000).collect()
    }
    assert out["a"]["alloc"] == 5 and out["b"]["alloc"] == 3
    assert not any(r["capped"] for r in out.values())


def test_budget_waterfill_tiny_budget_and_frac(spark):
    from redshift_etl_spark.operators.sampling import budget_waterfill

    counts = spark.createDataFrame(
        [("a", 100), ("b", 100), ("c", 100)], "g string, n long"
    )
    # budget below m * min(n): nobody fully funded, level = 7 div 3
    out = {
        r["g"]: r.asDict()
        for r in budget_waterfill(counts, "g", "n", budget=7).collect()
    }
    assert sorted(r["alloc"] for r in out.values()) == [2, 2, 3]
    assert all(r["capped"] for r in out.values())
    # the extra token goes to the FIRST capped group in (n, g) order
    assert out["a"]["alloc"] == 3
    # fraction form: 50% of 300
    half = budget_waterfill(
        counts, "g", "n", budget_frac=(1, 2)
    ).collect()
    assert sum(r["alloc"] for r in half) == 150


def test_budget_waterfill_partition_invariance_and_args(spark):
    import pytest

    from redshift_etl_spark.operators.sampling import budget_waterfill

    counts = spark.createDataFrame(
        [(f"g{i:02d}", (i * 13) % 47 + 1) for i in range(30)],
        "g string, n long",
    )
    one = sorted(
        map(tuple, budget_waterfill(counts.coalesce(1), "g", "n", 200).collect())
    )
    many = sorted(
        map(
            tuple,
            budget_waterfill(counts.repartition(7), "g", "n", 200).collect(),
        )
    )
    assert one == many
    assert sum(r[2] for r in one) == 200
    with pytest.raises(ValueError):
        budget_waterfill(counts, "g", "n")
    with pytest.raises(ValueError):
        budget_waterfill(counts, "g", "n", budget=5, budget_frac=(1, 2))


@pytest.mark.slow
def test_budget_waterfill_properties(spark):
    """Property sweep: Σalloc = min(B, Σn) exactly, 0 ≤ alloc ≤ n,
    allocation monotone in n (a bigger group never receives less),
    and uncapped ⇔ alloc = n."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from redshift_etl_spark.operators.sampling import budget_waterfill

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ns=st.lists(st.integers(0, 10_000), min_size=1, max_size=12),
        budget=st.integers(0, 60_000),
    )
    def run(ns, budget):
        counts = spark.createDataFrame(
            [(f"g{i:02d}", n) for i, n in enumerate(ns)],
            "g string, n long",
        )
        rows = budget_waterfill(counts, "g", "n", budget=budget).collect()
        total = sum(ns)
        assert sum(r["alloc"] for r in rows) == min(budget, total)
        by_g = {r["g"]: r for r in rows}
        for i, n in enumerate(ns):
            r = by_g[f"g{i:02d}"]
            assert 0 <= r["alloc"] <= n
            assert r["capped"] == (r["alloc"] < n) or r["alloc"] == n
        # monotone: sort by n; allocations must be non-decreasing in n
        # except the +1 remainder granularity
        srt = sorted(rows, key=lambda r: (r["n"], r["g"]))
        for a, b in zip(srt, srt[1:]):
            assert b["alloc"] >= a["alloc"] - 1

    run()
