"""DoReMi reweighting contracts: domains the reference LM finds hard
(excess loss) get strictly more mixture mass, at-or-below-average
domains sit at the exp(0) floor, and weights are an exact integer
ratio that sums to ~1."""

from __future__ import annotations

from redshift_etl_spark import queries as Q

from .conftest import SF_ORACLE


def _weights(spark):
    rows = Q.all_queries()["doremi_weights"](spark, SF_ORACLE).collect()
    return {r["source"]: r.asDict() for r in rows}


def test_weights_normalize_and_floor(spark):
    out = _weights(spark)
    assert len(out) == 19  # every non-reference source
    total = sum(r["weight"] for r in out.values())
    assert abs(total - 1.0) < 1e-9
    # exp(max(excess,0)) >= exp(0): the micro weight never drops below 1e6
    assert all(r["w_micro"] >= 1_000_000 for r in out.values())


def test_excess_loss_domains_get_more_mass(spark):
    out = _weights(spark)
    # mean NLL per domain (IEEE division of the emitted exact ints)
    mean = {s: r["dom_nll"] / r["n_bigrams"] for s, r in out.items()}
    overall = sum(r["dom_nll"] for r in out.values()) / sum(
        r["n_bigrams"] for r in out.values()
    )
    hard = [s for s in out if mean[s] > overall]
    easy = [s for s in out if mean[s] <= overall]
    assert hard and easy  # fixture corpus has both sides
    # every hard domain outweighs every at-floor domain
    assert min(out[s]["weight"] for s in hard) > max(
        out[s]["weight"] for s in easy
    )
    # and weight ordering follows excess ordering among hard domains
    by_excess = sorted(hard, key=lambda s: mean[s], reverse=True)
    ws = [out[s]["weight"] for s in by_excess]
    assert ws == sorted(ws, reverse=True)
