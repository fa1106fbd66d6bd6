"""operators/distsort — distributed global rank/cumsum must equal the
single-window formulation exactly, across partition counts, orders,
ties, and negatives, and its plan must never contain an unpartitioned
window over the data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from redshift_etl_spark.operators import distsort as DS


def _reference(df, order_by, value_col):
    w = Window.orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.select(
        "*",
        F.count(F.lit(1)).over(w).cast("long").alias("rank"),
        F.sum(value_col).over(w).alias("cum_value"),
    )


@pytest.mark.parametrize("num_partitions", [None, 1, 3, 16])
def test_ranked_cumsum_equals_single_window(spark, num_partitions):
    rows = [
        (i, (i * 37) % 11, ((-1) ** i) * (i % 7))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["id", "k", "v"]).repartition(8)
    order = [F.desc("k"), F.asc("id")]
    got = {
        r["id"]: (r["rank"], r["cum_value"])
        for r in DS.ranked_cumsum(
            df, order, "v", num_partitions=num_partitions
        ).collect()
    }
    want = {
        r["id"]: (r["rank"], r["cum_value"])
        for r in _reference(df, order, "v").collect()
    }
    assert got == want


def test_ranked_cumsum_ties_are_total_ordered(spark):
    # heavy ties on the primary key; the tiebreak column makes the
    # order total, so results are exact regardless of where range
    # boundaries fall
    df = spark.createDataFrame(
        [(i, i % 3, 1) for i in range(300)], ["id", "k", "v"]
    ).repartition(7)
    order = [F.asc("k"), F.asc("id")]
    got = DS.ranked_cumsum(df, order, "v").collect()
    want = _reference(df, order, "v").collect()
    assert sorted((r["id"], r["rank"], r["cum_value"]) for r in got) == \
        sorted((r["id"], r["rank"], r["cum_value"]) for r in want)


def test_global_row_number(spark):
    df = spark.createDataFrame(
        [(i, (i * 13) % 50) for i in range(200)], ["id", "k"]
    ).repartition(5)
    got = {
        r["id"]: r["rank"]
        for r in DS.global_row_number(
            df, [F.asc("k"), F.asc("id")]
        ).collect()
    }
    ordered = sorted(range(200), key=lambda i: ((i * 13) % 50, i))
    want = {i: pos + 1 for pos, i in enumerate(ordered)}
    assert got == want
    # helper columns must not leak
    cols = DS.global_row_number(df, [F.asc("k"), F.asc("id")]).columns
    assert cols == ["id", "k", "rank"]


def test_no_single_partition_window_over_data(spark):
    """The ONLY unpartitioned window is over the partition-totals frame
    (bounded by the shuffle-partition count): every Window node whose
    input is the ranged data must carry a partition spec."""
    df = spark.createDataFrame(
        [(i, i % 5, i) for i in range(100)], ["id", "k", "v"]
    )
    out = DS.ranked_cumsum(df, [F.asc("k"), F.asc("id")], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    # spec lists: [exprs], [partition], [order] — the data-side window
    # partitions by __pid; the offsets window has an empty partition
    # spec but consumes the totals aggregate (one row per partition)
    assert any("__pid" in w for w in windows)
    # The range exchange lives INSIDE the localCheckpoint boundary
    # (the checkpoint pins ONE physical range partitioning that both
    # consumers read — see ranked_cumsum docstring), so the downstream
    # executed plan shows Scan ExistingRDD, not the exchange itself.
    # Assert the checkpoint boundary is actually there: without it the
    # two consumers would plan independent range exchanges whose
    # sampled boundaries may disagree.
    assert "existingrdd" in plan.lower()
    # and the staging subtree (pre-checkpoint) does range-exchange:
    import pyspark.sql.functions as F2

    staged_plan = (
        df.repartitionByRange(F2.asc("k"), F2.asc("id"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in staged_plan.lower()


@pytest.mark.parametrize(
    "gen",
    [
        # high-cardinality continuous-ish: distinct ~ rows (the case
        # the built-in aggregate funnels on)
        lambda i: i * 7919 % 100003,
        # heavy skew: half the mass on one value, long tail
        lambda i: 0 if i % 2 == 0 else i,
        # negatives + duplicates
        lambda i: ((-1) ** i) * (i % 13),
    ],
)
@pytest.mark.parametrize("ps", [[0.2, 0.4, 0.6, 0.8], [0.01, 0.5, 0.99]])
def test_percentile_disc_edges_equal_builtin(spark, gen, ps):
    """Distributed edge extraction must equal Spark's built-in
    percentile_disc aggregate exactly — the contract that lets
    rfm_segments keep its unchanged DuckDB oracle."""
    df = spark.createDataFrame(
        [(i, gen(i)) for i in range(2000)], ["id", "v"]
    ).repartition(9)
    got = DS.percentile_disc_edges(df, "v", ps, prefix="e").collect()[0]
    want = df.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"e{round(p * 100)}")
            for p in ps
        ]
    ).collect()[0]
    assert got.asDict() == want.asDict()


def test_percentile_disc_edges_no_single_task_value_merge(spark):
    """The plan must carry the distinct-value frame through a range
    exchange + partitioned windows — not the built-in percentile_disc
    ObjectHashAggregate whose final merge holds every distinct value
    on one task."""
    df = spark.createDataFrame([(i, i) for i in range(100)], ["id", "v"])
    out = DS.percentile_disc_edges(df, "v", [0.5])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile_disc" not in plan.lower()
    # the cumulative pass is ranked_cumsum's partitioned window over
    # the checkpointed range-staged distinct-value frame
    assert "windowspecdefinition(__pid" in plan


def test_empty_frame(spark):
    df = spark.createDataFrame([], "id long, k long, v long")
    assert DS.ranked_cumsum(df, [F.asc("k")], "v").count() == 0


def test_percentile_disc_edges_ignore_nulls_like_builtin(spark):
    """ADVICE r06: NULL inputs must not inflate N or shift any edge —
    the built-in aggregate ignores NULLs, so must the distributed
    edges. Fixture skews a third of rows to NULL so a NULL-counting
    bug moves every threshold."""
    rows = [(i, None if i % 3 == 0 else i % 17) for i in range(2001)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    ps = [0.2, 0.5, 0.8, 0.99]
    got = DS.percentile_disc_edges(df, "v", ps, prefix="e").collect()[0]
    want = df.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"e{round(p * 100)}")
            for p in ps
        ]
    ).collect()[0]
    assert got.asDict() == want.asDict()
    # and the all-NULL frame yields all-NULL edges, like the built-in
    nulls = spark.createDataFrame([(1, None), (2, None)], "id long, v long")
    out = DS.percentile_disc_edges(nulls, "v", [0.5], prefix="e").collect()[0]
    assert out["e50"] is None


def test_ranked_cumsum_reliable_checkpoint_path(spark, tmp_path):
    """reliable=True pins the staged frame with a replicated reliable
    checkpoint (cluster-survivable) instead of executor-local blocks;
    results identical."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.createDataFrame(
        [(i, i % 7, (i * 13) % 101) for i in range(500)], ["id", "k", "v"]
    ).repartition(5)
    order = lambda: [F.asc("k"), F.asc("id")]  # noqa: E731
    base = sorted(
        (r["id"], r["rank"], r["cum_value"])
        for r in DS.ranked_cumsum(df, order(), "v").collect()
    )
    rel = sorted(
        (r["id"], r["rank"], r["cum_value"])
        for r in DS.ranked_cumsum(df, order(), "v", reliable=True).collect()
    )
    assert base == rel


@pytest.mark.parametrize(
    "gen",
    [
        lambda i: i * 7919 % 100003,          # distinct ~ rows
        lambda i: 0 if i % 2 == 0 else i,     # heavy value skew
        lambda i: ((-1) ** i) * (i % 13),     # negatives + duplicates
    ],
)
@pytest.mark.parametrize("ps", [[0.25, 0.5, 0.75], [0.01, 0.99]])
def test_grouped_percentile_disc_equal_builtin(spark, gen, ps):
    """Per-group distributed percentile_disc must equal the built-in
    grouped aggregate exactly, including NULL skipping per group and
    wildly skewed group sizes (one group holds ~90% of rows)."""
    rows = []
    for i in range(2000):
        g = "big" if i % 10 else ("mid" if i % 2 else "tiny")
        v = None if i % 97 == 0 else gen(i)
        rows.append((i, g, v))
    df = spark.createDataFrame(rows, ["id", "g", "v"]).repartition(7)
    got = {
        r["g"]: r.asDict()
        for r in DS.grouped_percentile_disc(df, "g", "v", ps, prefix="e").collect()
    }
    want = {
        r["g"]: r.asDict()
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
                ).alias(f"e{round(p * 100)}")
                for p in ps
            ]
        )
        .collect()
    }
    assert got == want


def test_grouped_percentile_disc_single_group_matches_edges(spark):
    df = spark.createDataFrame(
        [(i, "only", i * 31 % 997) for i in range(500)], ["id", "g", "v"]
    )
    grouped = DS.grouped_percentile_disc(df, "g", "v", [0.5], prefix="e")
    edges = DS.percentile_disc_edges(df, "v", [0.5], prefix="e")
    assert grouped.collect()[0]["e50"] == edges.collect()[0]["e50"]


def test_weighted_percentile_unit_weights_equal_plain(spark):
    df = spark.createDataFrame(
        [(i, i * 37 % 211, 1) for i in range(800)], ["id", "v", "w"]
    ).repartition(5)
    w = DS.weighted_percentile_disc_edges(
        df, "v", "w", [0.25, 0.5, 0.9], prefix="e"
    ).collect()[0]
    p = DS.percentile_disc_edges(df, "v", [0.25, 0.5, 0.9], prefix="e").collect()[0]
    assert w.asDict() == p.asDict()


def test_weighted_percentile_matches_python_replay(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.randint(1, 9)) for i in range(600)]
    # a few NULLs and zero-weights must drop out
    rows += [(1000, None, 5), (1001, 3, None)]
    df = spark.createDataFrame(rows, "id long, v long, w long").repartition(7)
    got = DS.weighted_percentile_disc_edges(
        df, "v", "w", [0.5, 0.9], prefix="e"
    ).collect()[0]

    clean = [(v, w) for _, v, w in rows if v is not None and w is not None]
    total = sum(w for _, w in clean)
    by_v: dict[int, int] = {}
    for v, w in clean:
        by_v[v] = by_v.get(v, 0) + w

    def edge(p_num, p_den):
        c = 0
        for v in sorted(by_v):
            c += by_v[v]
            if c * p_den >= p_num * total:
                return v

    assert got["e50"] == edge(1, 2)
    assert got["e90"] == edge(9, 10)


def test_auc_exact_matches_pairwise_definition(spark):
    """Midrank AUC must equal the brute pairwise statistic
    P(s+ > s-) + 0.5*P(s+ = s-), including heavy ties and NULLs."""
    import random

    rng = random.Random(11)
    rows = [(rng.randint(0, 6) + (3 if rng.random() < 0.4 else 0),
             rng.random() < 0.4) for _ in range(400)]
    # label correlation: boost scores of positives
    rows = [(s + (2 if y else 0), y) for s, y in rows]
    rows += [(None, True), (5, None)]  # dropped
    df = spark.createDataFrame(rows, "s int, y boolean").repartition(6)
    got = DS.auc_exact(df, "s", "y").collect()[0]

    clean = [(s, y) for s, y in rows if s is not None and y is not None]
    pos = [s for s, y in clean if y]
    neg = [s for s, y in clean if not y]
    num = sum(1.0 if p > n else (0.5 if p == n else 0.0)
              for p in pos for n in neg)
    want = num / (len(pos) * len(neg))
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - want) < 1e-12


def test_auc_extremes(spark):
    perfect = spark.createDataFrame(
        [(i, i >= 50) for i in range(100)], "s int, y boolean"
    )
    assert DS.auc_exact(perfect, "s", "y").collect()[0]["auc"] == 1.0
    # all scores tied -> AUC exactly 0.5 by midrank
    tied = spark.createDataFrame(
        [(7, i % 3 == 0) for i in range(90)], "s int, y boolean"
    )
    assert DS.auc_exact(tied, "s", "y").collect()[0]["auc"] == 0.5


def test_pr_curve_matches_brute_force(spark):
    import random

    rng = random.Random(3)
    rows = [(rng.randint(0, 8), rng.random() < 0.3) for _ in range(300)]
    df = spark.createDataFrame(rows, "s int, y boolean").repartition(5)
    got = {r["threshold"]: r.asDict() for r in DS.pr_curve(df, "s", "y").collect()}

    npos = sum(1 for _, y in rows if y)
    for t in {s for s, _ in rows}:
        tp = sum(1 for s, y in rows if y and s >= t)
        fp = sum(1 for s, y in rows if not y and s >= t)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, npos - tp)
        assert abs(r["precision"] - tp / (tp + fp)) < 1e-12
        assert abs(r["recall"] - tp / npos) < 1e-12
    # recall is monotone non-increasing in the threshold
    recalls = [got[t]["recall"] for t in sorted(got)]
    assert recalls == sorted(recalls, reverse=True)


def test_calibration_bins_exact(spark):
    rows = [
        (0, 10, True),    # score 0.0  -> bin 0
        (1, 10, False),   # 0.1        -> bin 1
        (9, 10, True),    # 0.9        -> bin 9
        (10, 10, True),   # 1.0        -> clamped to bin 9
        (1, 3, False),    # 0.333...   -> bin 3 by integer div
        (None, 10, True), # dropped
        (5, 0, True),     # zero denominator: dropped
        (5, 10, None),    # NULL label: dropped
    ]
    df = spark.createDataFrame(rows, "num int, den int, y boolean")
    got = {r["bin"]: r.asDict()
           for r in DS.calibration_bins(df, "num", "den", "y", 10).collect()}
    assert set(got) == {0, 1, 3, 9}
    assert got[9]["n"] == 2 and got[9]["n_pos"] == 2
    assert got[9]["mean_score"] == 19 / 20  # ratio of sums, not mean of ratios
    assert got[3]["pos_rate"] == 0.0
    assert got[0]["pos_rate"] == 1.0


def test_grouped_auc_matches_per_group_auc_exact(spark):
    import random

    rng = random.Random(21)
    rows = []
    for g, n in (("big", 300), ("mid", 60), ("tiny", 8)):
        for _ in range(n):
            y = rng.random() < 0.35
            rows.append((g, rng.randint(0, 9) + (2 if y else 0), y))
    rows.append(("allpos", 4, True))   # no negatives -> NULL auc
    df = spark.createDataFrame(rows, "g string, s int, y boolean")
    got = {r["g"]: r.asDict() for r in DS.grouped_auc(df, "g", "s", "y").collect()}
    assert got["allpos"]["auc"] is None
    for g in ("big", "mid", "tiny"):
        sub = df.filter(F.col("g") == g)
        want = DS.auc_exact(sub, "s", "y").collect()[0]
        assert got[g]["n_pos"] == want["n_pos"]
        assert got[g]["n_neg"] == want["n_neg"]
        assert got[g]["auc"] == want["auc"]  # bit-identical, same formula


def test_ece_known_value(spark):
    # one bin perfectly calibrated, one fully mis-calibrated
    rows = (
        [(1, 10, True)] * 5 + [(1, 10, False)] * 45   # bin 1: mean .1, obs .1
        + [(9, 10, False)] * 50                        # bin 9: mean .9, obs 0
    )
    df = spark.createDataFrame(rows, "num int, den int, y boolean")
    r = DS.expected_calibration_error(df, "num", "den", "y", 10).collect()[0]
    assert r["n"] == 100
    # ECE = .5*|0.1-0.1| + .5*|0.0-0.9| = 0.45
    assert abs(r["ece"] - 0.45) < 1e-6


def test_best_f1_threshold_matches_brute_force(spark):
    import random

    rng = random.Random(17)
    rows = [(rng.randint(0, 8) + (3 if rng.random() < 0.4 else 0),
             rng.random() < 0.4) for _ in range(300)]
    df = spark.createDataFrame(rows, "s int, y boolean")
    got = DS.best_f1_threshold(df, "s", "y").collect()[0]

    npos = sum(1 for _, y in rows if y)
    best = None
    for t in sorted({s for s, _ in rows}):
        tp = sum(1 for s, y in rows if y and s >= t)
        fp = sum(1 for s, y in rows if not y and s >= t)
        f1 = 2 * tp / (2 * tp + fp + (npos - tp))
        if best is None or f1 > best[0]:  # strict: ties keep LOWEST t
            best = (f1, t, tp, fp)
    assert got["threshold"] == best[1]
    assert (got["tp"], got["fp"]) == (best[2], best[3])
    assert abs(got["f1"] - best[0]) < 1e-12
