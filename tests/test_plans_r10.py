"""Plan contracts for the r10 operators — pin the 100 TB posture:
no Cartesian products anywhere, pure projections stay shuffle-free,
single-window shapes stay single-window, the k-anonymity single
distinct stays Expand-free, and structural shuffle counts don't grow
silently. (Counts use plans.count_shuffles, which tallies the
formatted plan — tree + detail — so every real exchange counts
twice; thresholds below are in those units, pinned at the shape the
operator was designed to.)"""

from __future__ import annotations

import pytest

from redshift_etl_spark import plans as P
from redshift_etl_spark import queries as Q

from .conftest import SF_ORACLE

R10 = (
    "bloom_prefilter_join",
    "woe_iv_quantity",
    "krippendorff_lang",
    "purged_time_split",
    "conformal_lang_threshold",
    "psi_value_drift",
    "lang_marker_map",
    "k_anonymity_report",
    "loss_mask_spans",
    "fim_transform",
    "nb_source_confusion",
    "zipf_fit_report",
    "stream_drift_probe",
)


@pytest.mark.parametrize("name", R10)
def test_no_cartesian_product(spark, name):
    df = Q.all_queries()[name](spark, SF_ORACLE)
    assert "CartesianProduct" not in P.physical_plan(df)


def test_fim_transform_is_pure_projection(spark):
    df = Q.all_queries()["fim_transform"](spark, SF_ORACLE)
    assert P.count_shuffles(df) == 0
    plan = P.physical_plan(df)
    assert "Join" not in plan and "Window" not in plan


def test_loss_mask_single_conversation_exchange_single_window(spark):
    df = Q.all_queries()["loss_mask_spans"](spark, SF_ORACLE)
    assert P.count_shuffles(df) <= 2  # one real hash exchange
    plan = P.physical_plan(df)
    # both rank and running-length ride the conv-partitioned spec
    assert "windowspecdefinition(conv_id" in plan


def test_k_anonymity_single_distinct_is_expand_free(spark):
    df = Q.all_queries()["k_anonymity_report"](spark, SF_ORACLE)
    assert "Expand" not in P.physical_plan(df)


def test_binned_screens_stay_one_data_pass(spark):
    # woe/psi: the data is scanned once into the bin agg; everything
    # after is bounded-frame math. Structural ceilings pinned.
    woe = Q.all_queries()["woe_iv_quantity"](spark, SF_ORACLE)
    assert P.count_shuffles(woe) <= 8
    psi = Q.all_queries()["psi_value_drift"](spark, SF_ORACLE)
    assert P.count_shuffles(psi) <= 16


def test_purged_split_bnlj_only_against_span_frame(spark):
    df = Q.all_queries()["purged_time_split"](spark, SF_ORACLE)
    plan = P.physical_plan(df)
    # the only nested-loop site is the k-row fold-span broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "CartesianProduct" not in plan


def test_nb_model_join_is_not_broadcast(spark):
    # the class-constants frame broadcasts (bounded); the token-keyed
    # MODEL must not — vocabulary is data-sized. The model join keys on
    # tok: assert no broadcast join carries the lp_nano column.
    df = Q.all_queries()["nb_source_confusion"](spark, SF_ORACLE)
    plan = P.physical_plan(df)
    import re

    assert P.count_broadcasts(df) >= 1  # the class-constants frame
    # every BroadcastExchange detail chunk must be free of the model's
    # lp_nano column (chunks are blank-line-separated in the formatted
    # plan and start "(N) NodeName")
    chunks = [
        c
        for c in re.split(r"\n\n", plan)
        if c.strip().startswith("(")
        and "BroadcastExchange" in c.split("\n")[0]
    ]
    assert chunks, "no broadcast detail chunks parsed — format changed?"
    for c in chunks:
        assert "lp_nano" not in c, c.split("\n")[0]
