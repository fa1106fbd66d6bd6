"""The bench gate's canary normalization, proven on synthetic rounds:

- sustained machine load (everything uniformly ~1.3× slower, canary
  included — the exact r04/r05 false-positive condition) must NOT flag;
- a genuine 2× regression of one query must flag, idle OR loaded;
- the load factor is capped so extreme load can't bury a regression;
- legacy rounds without a canary degrade to the unnormalized gate.
"""

from __future__ import annotations

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench_gate",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "bench_gate.py",
)
bench_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_gate)

QUERIES = {"q_fast": 0.8, "q_mid": 2.0, "q_slow": 4.0}
STREAM = {"stream_ctr_rate_rows_per_sec": 380_000.0}
CANARY = 2.0


def _round_doc(q_scale=1.0, s_scale=1.0, canary_scale=1.0, canary=True):
    doc = {
        "queries": {k: round(v * q_scale, 3) for k, v in QUERIES.items()},
        "stream": {k: round(v * s_scale, 1) for k, v in STREAM.items()},
    }
    if canary:
        doc["canary_sec"] = round(CANARY * canary_scale, 3)
    return doc


FLOORS = bench_gate.floors_from_docs([_round_doc()])


def _regressed(doc):
    _, regressions, _adv = bench_gate.gate(doc, FLOORS)
    return regressions


def _advisory(doc, floors=None):
    _, _reg, advisory = bench_gate.gate(doc, floors or FLOORS)
    return advisory


def test_idle_machine_at_floor_passes():
    assert _regressed(_round_doc()) == []


def test_uniform_load_does_not_flag():
    # the r04/r05 condition: ~1.3× everywhere including the canary
    doc = _round_doc(q_scale=1.3, s_scale=1 / 1.3, canary_scale=1.3)
    assert _regressed(doc) == []


def test_real_regression_flags_on_idle_machine():
    doc = _round_doc()
    doc["queries"]["q_mid"] = QUERIES["q_mid"] * 2.0
    assert _regressed(doc) == ["q_mid"]


def test_real_regression_flags_under_load_too():
    # load scales q_mid's budget to 1.3 × 1.2 × floor = 1.56×; a 2×
    # code regression on top of 1.3× load (2.6× recorded) still flags
    doc = _round_doc(q_scale=1.3, s_scale=1 / 1.3, canary_scale=1.3)
    doc["queries"]["q_mid"] = round(QUERIES["q_mid"] * 1.3 * 2.0, 3)
    assert _regressed(doc) == ["q_mid"]


def test_stream_regression_flags():
    doc = _round_doc()
    doc["stream"]["stream_ctr_rate_rows_per_sec"] = (
        STREAM["stream_ctr_rate_rows_per_sec"] / 2
    )
    assert _regressed(doc) == ["stream_ctr_rate_rows_per_sec"]


def test_load_factor_capped():
    # a 10× canary does not grant a 10× budget — factor clamps at 3×,
    # so a query that is ALSO 10× slower still flags
    doc = _round_doc(q_scale=10.0, canary_scale=10.0)
    assert "q_slow" in _regressed(doc)
    assert (
        bench_gate.load_factor(doc, FLOORS["canary"])
        == bench_gate.LOAD_FACTOR_CAP
    )


def test_legacy_rounds_without_canary_unnormalized():
    floors = bench_gate.floors_from_docs([_round_doc(canary=False)])
    assert floors["canary"] is None
    doc = _round_doc(q_scale=1.3, canary=False)
    _, regressions, _adv = bench_gate.gate(doc, floors)
    # without a canary the 1.3× drift DOES flag q_slow (ratio budget) —
    # exactly the old behavior; the canary is what fixes it
    assert "q_slow" in regressions


def test_driver_wrapped_doc_unwraps():
    wrapped = {"parsed": _round_doc()}
    _, regressions, _adv = bench_gate.gate(wrapped, FLOORS)
    assert regressions == []


def test_moderate_uniform_load_stays_clean_not_advisory():
    # 1.3x uniform load is below the advisory threshold: scaled
    # budgets apply silently, exactly the r06 in-vivo behavior
    doc = _round_doc(q_scale=1.3, s_scale=1 / 1.3, canary_scale=1.3)
    assert _advisory(doc) == []


def test_heavy_load_scaled_pass_is_advisory_not_clean():
    # ADVICE r06: under 2.5x load, a query at 2.0x its floor fits the
    # scaled budget (2.5 * 1.2 = 3.0x) but NOT the idle budget (1.2x)
    # -> advisory, not a silent pass
    doc = _round_doc(canary_scale=2.5)
    doc["queries"]["q_slow"] = round(QUERIES["q_slow"] * 2.0, 3)
    assert _regressed(doc) == []
    assert _advisory(doc) == ["q_slow"]


def test_heavy_load_idle_budget_pass_is_clean():
    # under heavy load, queries inside the IDLE budget are genuinely
    # healthy - no advisory noise for them
    doc = _round_doc(canary_scale=2.5)  # queries at floor
    assert _regressed(doc) == []
    assert _advisory(doc) == []


def test_heavy_load_stream_scaled_pass_is_advisory():
    doc = _round_doc(canary_scale=2.5)
    doc["stream"]["stream_ctr_rate_rows_per_sec"] = round(
        STREAM["stream_ctr_rate_rows_per_sec"] / 2.0, 1
    )  # fits /1.2/2.5 scaled bar, fails /1.2 idle bar
    assert _regressed(doc) == []
    assert _advisory(doc) == ["stream_ctr_rate_rows_per_sec"]


def test_truncated_tail_doc_recovers_into_floors():
    # the r09 defect: the driver tail cut the final JSON line's HEAD,
    # so parsed committed as null. Floor recovery must take the intact
    # trailing pairs, drop the cut-off leading pair (no opening quote),
    # and classify stream/canary fields away from query timings.
    line = (
        '{"metric": "headline_queries_total_sec", "value": 9.9, '
        '"queries": {"q_cut_off": 1.111, "q_mid": 2.0, "q_slow": 4.0}, '
        '"stream": {"stream_ctr_rate_rows_per_sec": 380000.0, '
        '"stream_ctr_rate_rows": 1000, "stream_ctr_rate_batches": 3}, '
        '"canary_sec": 2.0, "canary_floor_sec": 1.9, '
        '"load_factor": 1.05, "sf": 0.1}'
    )
    cut = line.index('"q_cut_off"') + 4  # truncate mid-key, like r09
    wrapped = {"parsed": None, "tail": line[cut:], "rc": 0}
    floors = bench_gate.floors_from_docs([wrapped])
    assert floors["queries"] == {"q_mid": 2.0, "q_slow": 4.0}
    assert floors["stream"] == {"stream_ctr_rate_rows_per_sec": 380000.0}
    assert floors["canary"] == 2.0
    # and a gate run against those floors behaves normally
    doc = _round_doc()
    del doc["queries"]["q_fast"]
    _, reg, adv = bench_gate.gate(doc, floors)
    assert reg == [] and adv == []


def test_unrecoverable_doc_skipped_not_fatal():
    # tail missing the line END (no closing brace): pairs could be
    # half-truncated, so the doc contributes nothing — but other docs
    # in the glob still do
    bad = {"parsed": None, "tail": '"q_mid": 0.0', "rc": 1}
    floors = bench_gate.floors_from_docs([bad, _round_doc()])
    assert floors["queries"] == QUERIES


def test_committed_r09_record_recovers():
    # the actual committed artifact that crashed the r09 gate
    import json

    p = pathlib.Path(__file__).resolve().parents[1] / "BENCH_r09.json"
    rec = bench_gate.benchlib.unwrap(json.loads(p.read_text()))
    assert rec is not None
    assert rec["canary_sec"] == 0.992
    assert rec["queries"]["padding_efficiency"] == 0.983
    assert rec["stream"]["stream_ctr_rate_rows_per_sec"] == 347459.2
    # the cut-off leading pair (agent_| metrics": 1.699) must NOT
    # appear under any name
    assert "metrics" not in rec["queries"]
    assert "agent_metrics" not in rec["queries"]  # head was truncated
    assert len(rec["queries"]) >= 60


def test_floors_file_merge_is_monotone(tmp_path):
    bl = bench_gate.benchlib
    bl.merge_floors_file(
        tmp_path, {"q_a": 2.0}, {"stream_ctr_rate_rows_per_sec": 100.0}, 1.0
    )
    out = bl.merge_floors_file(
        tmp_path,
        {"q_a": 3.0, "q_b": 5.0},  # slower q_a must not raise the floor
        {"stream_ctr_rate_rows_per_sec": 90.0},  # slower rate kept out
        1.5,
    )
    assert out["queries"] == {"q_a": 2.0, "q_b": 5.0}
    assert out["stream"] == {"stream_ctr_rate_rows_per_sec": 100.0}
    assert out["canary_sec"] == 1.0
    # and collect_floors folds the file in
    floors = bl.collect_floors(tmp_path)
    assert floors["queries"]["q_a"] == 2.0


def test_committed_floor_present_loaded_replay_end_to_end():
    # verdict r06 item 8: the floor-present path with a synthetic
    # loaded-machine replay - floors from a committed round WITH a
    # canary, current round under 1.4x load, all queries drifting
    # with the load: clean pass, load_factor computed from the
    # committed floor
    floors = bench_gate.floors_from_docs(
        [_round_doc(), _round_doc(q_scale=1.1, canary_scale=1.05)]
    )
    assert floors["canary"] == CANARY  # min across rounds
    doc = _round_doc(q_scale=1.38, s_scale=1 / 1.38, canary_scale=1.4)
    assert bench_gate.load_factor(doc, floors["canary"]) == 1.4
    _, reg, adv = bench_gate.gate(doc, floors)
    assert reg == [] and adv == []


def test_string_canary_scales_budgets_when_shuffle_canary_is_blind():
    """r11 blind spot: text-family queries drifted to ~1.6x their
    floors while the shuffle canary read ~1.08 — the gate must scale
    by the WORSE of the two canaries."""
    base = _round_doc()
    base["canary_str_sec"] = 2.0
    floors = bench_gate.floors_from_docs([base])
    assert floors["canary_str"] == 2.0
    # string-CPU drift: every query 1.6x, shuffle canary idle, string
    # canary 1.7x — without the second canary these would all flag
    drifted = _round_doc(q_scale=1.6)
    drifted["canary_str_sec"] = 3.4
    _, regressions, _ = bench_gate.gate(drifted, floors)
    assert not regressions
    # same drift with the string canary idle IS a real regression
    honest = _round_doc(q_scale=1.6)
    honest["canary_str_sec"] = 2.0
    _, regressions, _ = bench_gate.gate(honest, floors)
    assert regressions


def test_string_canary_floor_merges_monotone(tmp_path):
    import json

    bench_gate.benchlib.merge_floors_file(
        tmp_path, {"q": 1.0}, {}, 1.0, canary_str_sec=2.5
    )
    bench_gate.benchlib.merge_floors_file(
        tmp_path, {"q": 1.2}, {}, 1.1, canary_str_sec=2.1
    )
    f = json.loads((tmp_path / "BENCH_FLOORS.json").read_text())
    assert f["canary_str_sec"] == 2.1 and f["canary_sec"] == 1.0
    assert f["queries"]["q"] == 1.0
