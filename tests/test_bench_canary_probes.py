"""Interleaved bench canary (r11 judge finding #1) + compact full
per-query map (finding #3), proven on synthetic runs:

- the exact r11 mis-grade: a run whose load builds AFTER the start
  probe (start reads 1.0×, the queries execute at ~1.26×) was graded
  by the start probe alone and false-flagged — budgets must scale by
  the WORST of the start/middle/end probes;
- the advisory stamp keys off the worst probe too;
- floors only ever merge/collect from a run's BEST probe;
- the bounded line's ``qms`` millisecond array expands to the full
  named map exactly when its name-list signature matches.
"""

from __future__ import annotations

import importlib.util
import pathlib

_here = pathlib.Path(__file__).resolve().parents[1]

_spec = importlib.util.spec_from_file_location("bench_root2", _here / "bench.py")
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

_spec2 = importlib.util.spec_from_file_location(
    "benchlib2", _here / "scripts" / "benchlib.py"
)
benchlib = importlib.util.module_from_spec(_spec2)
_spec2.loader.exec_module(benchlib)

_spec3 = importlib.util.spec_from_file_location(
    "bench_gate2", _here / "scripts" / "bench_gate.py"
)
bench_gate = importlib.util.module_from_spec(_spec3)
_spec3.loader.exec_module(bench_gate)


# --- worst-probe load normalization (pure) --------------------------------

def test_late_load_scales_by_worst_probe():
    # start idle, load arrives mid-run: the start-only reading (1.0)
    # is exactly what mis-graded BENCH_r11.json
    eff = bench.effective_load([1.0, 1.30, 1.25], [0.6, 0.6, 0.6], 1.0, 0.6)
    assert eff["load_factor"] == 1.3
    assert eff["canary_sec"] == 1.30  # the gate-scaling value


def test_string_canary_contributes_independently():
    eff = bench.effective_load([1.0, 1.0], [0.9, 0.66], 1.0, 0.6)
    assert eff["load_factor"] == 1.5  # 0.9/0.6, not the shuffle 1.0


def test_missing_floors_contribute_unity_and_cap_applies():
    assert bench.effective_load([2.0], [2.0], None, None)["load_factor"] == 1.0
    assert bench.effective_load([9.0], [0.6], 1.0, 0.6)["load_factor"] == 3.0


def _stamp_from_probes(shuffle_probes, str_probes=(), floor=1.0,
                       str_floor=0.6):
    eff = bench.effective_load(
        list(shuffle_probes), list(str_probes), floor,
        str_floor if str_probes else None,
    )
    return bench.stamp_advisory(
        {"load_factor": eff["load_factor"],
         "load_factor_best": eff["load_factor_best"],
         "load_factor_median": eff["load_factor_median"]}
    )


def test_advisory_stamp_keys_off_median_probe():
    """Budgets scale by the worst probe, but the EVIDENTIARY stamp
    reads the MEDIAN (r12 verdict item 2): the best-probe stamp let a
    mostly-loaded run pass off one quiet moment, and the worst-probe
    stamp would disqualify honest idle records via the bench's own JVM
    aging of the end probe. The median is robust to one outlier in
    either direction."""
    # the judge's specified pair: mid-run load spike with a quiet start
    # -> TYPICAL moment is loaded -> advisory
    assert _stamp_from_probes([1.2, 2.3, 1.4])["advisory"] is True
    # honest idle record with mild aging drift -> not advisory
    assert _stamp_from_probes([1.0, 1.15, 1.1])["advisory"] is False
    # the EXACT r12 driver capture (probes [1.219, 2.34, 1.367], best
    # 1.248 stamped advisory=false while 20 queries passed only via
    # 2.4x budgets) — the blind spot this fix closes
    assert _stamp_from_probes([1.219, 2.34, 1.367])["advisory"] is True
    # idle machine, one aged/noisy END probe above the bar: the median
    # keeps the record admissible while budgets still scale by 1.35
    stamped = _stamp_from_probes([1.0, 1.05, 1.35])
    assert stamped["advisory"] is False
    assert stamped["load_factor"] == 1.35
    # sustained load: every probe high -> advisory regardless of agg
    assert _stamp_from_probes([1.4, 1.6], [0.85, 0.9])["advisory"] is True
    # the string canary contributes independently to the median signal
    assert _stamp_from_probes(
        [1.0, 1.0, 1.0], [0.85, 0.9, 0.88]
    )["advisory"] is True
    # legacy record without probes: falls back best -> overall
    assert bench.stamp_advisory({"load_factor": 1.4})["advisory"] is True
    assert bench.stamp_advisory(
        {"load_factor": 1.5, "load_factor_best": 1.1}
    )["advisory"] is False


# --- the r11 mis-grade, end to end through the gate ------------------------

QUERIES = {"q_a": 1.0, "q_b": 2.5}


def _floors():
    return benchlib.floors_from_docs(
        [{"queries": dict(QUERIES), "canary_sec": 1.0}]
    )


def _late_load_run(probes):
    """Every query ~1.26x its floor (uniform late-arriving load)."""
    return {
        "queries": {k: round(v * 1.26, 3) for k, v in QUERIES.items()},
        "canary_sec": max(probes),
        "canary_probes": probes,
    }


def test_r11_mis_grade_is_fixed_by_worst_probe_record():
    probes = [1.0, 1.26, 1.25]
    # the OLD single-start-probe record: canary_sec = first reading —
    # today's gate MUST flag it (this is the mis-grade, reproduced)
    old_style = _late_load_run(probes)
    old_style["canary_sec"] = probes[0]
    old_style.pop("canary_probes")
    _, regressed, _ = bench_gate.gate(old_style, _floors())
    assert "q_b" in regressed  # 3.15s vs budget 1.0 * 3.0s
    # the NEW record carries the worst probe: same timings pass
    _, regressed, _ = bench_gate.gate(_late_load_run(probes), _floors())
    assert regressed == []


def test_floors_collect_from_best_probe_not_worst():
    floors = benchlib.floors_from_docs(
        [
            {
                "queries": {"q_a": 1.0},
                "canary_sec": 1.4,           # worst probe (gate value)
                "canary_probes": [0.95, 1.4],  # best probe = 0.95
                "canary_str_sec": 0.9,
                "canary_str_probes": [0.62, 0.9],
            }
        ]
    )
    assert floors["canary"] == 0.95
    assert floors["canary_str"] == 0.62


# --- compact full map (qms) -------------------------------------------------

NAMES = ["alpha", "beta", "gamma"]


def _bounded(sig=None):
    return {
        "queries": {"gamma": 3.002},  # named top slice
        "qms": [1001, 2000, 3002],
        "q_sig": sig or benchlib.q_sig(NAMES),
    }


def test_qms_expands_to_full_named_map():
    rec = benchlib.expand_compact(_bounded(), NAMES)
    assert rec["queries"] == {"alpha": 1.001, "beta": 2.0, "gamma": 3.002}


def test_qms_sig_mismatch_passes_through_untouched():
    rec = benchlib.expand_compact(_bounded(sig="deadbeef"), NAMES)
    assert rec["queries"] == {"gamma": 3.002}  # no mis-attribution


def test_legacy_record_without_qms_passes_through():
    rec = {"queries": {"x": 1.0}}
    assert benchlib.expand_compact(rec, NAMES) == {"queries": {"x": 1.0}}


def test_gate_grades_all_queries_from_expanded_capture():
    names = benchlib.headline_names(_here)
    qms = [100 * (i + 1) for i in range(len(names))]
    doc = {
        "queries": {},
        "qms": qms,
        "q_sig": benchlib.q_sig(names),
        "canary_sec": 1.0,
    }
    rec = benchlib.expand_compact(dict(doc), names)
    assert len(rec["queries"]) == len(names)  # audit-complete capture


# --- bounded-line degradation contract (r12 self-review #3) ----------------

def _line_inputs(n_queries):
    timings = {f"query_name_{i:03d}": 0.5 + i / 1000 for i in range(n_queries)}
    names = list(timings)
    full = {"metric": "headline_queries_total_sec", "value": 1.0,
            "stream": {}, "load_factor": 1.0}
    return full, timings, names


def test_bounded_line_carries_full_qms_normally():
    import json

    full, timings, names = _line_inputs(95)
    line = bench.bounded_final_line(
        full, timings, names, benchlib.q_sig(names), "BENCH_FULL.json"
    )
    doc = json.loads(line)
    assert len(doc["qms"]) == 95 and len(line) < 1900


def test_bounded_line_last_resort_keeps_named_slice():
    """When even the n_top=0 qms line exceeds the limit, the fallback
    must drop qms but RETRY named slices — never ship an empty
    queries dict (the capture would carry zero timings and the gate
    would pass vacuously)."""
    import json

    full, timings, names = _line_inputs(400)  # qms alone > tight limit
    line = bench.bounded_final_line(
        full, timings, names, benchlib.q_sig(names), "BENCH_FULL.json",
        limit=900,
    )
    doc = json.loads(line)
    assert "qms" not in doc
    assert len(doc["queries"]) > 0  # named slice survived
    assert len(line) < 900


def test_bounded_line_sheds_diagnostic_arrays_before_giving_up():
    """r12 ADVICE item 3: when even the qms-stripped n_top=0 line is
    oversized because the record grew diagnostic fields, those arrays
    (probe series, post-stream probes) are shed LAST — the full file
    on disk keeps them — so the tail line stays parseable."""
    import json

    full, timings, names = _line_inputs(3)
    full["canary_probes"] = [1.0] * 80          # bloat the record
    full["canary_str_probes"] = [0.6] * 80
    full["canary_post_stream_sec"] = 1.23
    full["canary_post_stream_str_sec"] = 0.81
    line = bench.bounded_final_line(
        full, timings, names, benchlib.q_sig(names), "BENCH_FULL.json",
        limit=700,
    )
    doc = json.loads(line)
    assert "canary_probes" not in doc
    assert len(line) < 700
    # essential fields survive the shed
    assert doc["metric"] == "headline_queries_total_sec"


def test_bounded_line_raises_loud_when_nothing_fits():
    """The r09 parsed:null failure mode must be loud at capture time:
    if no degradation step fits the limit, raise instead of returning
    a line the driver tail would truncate mid-JSON."""
    import pytest

    full, timings, names = _line_inputs(3)
    full["some_huge_field"] = "x" * 2000  # nothing sheddable covers this
    with pytest.raises(ValueError, match="degradation step"):
        bench.bounded_final_line(
            full, timings, names, benchlib.q_sig(names),
            "BENCH_FULL.json", limit=500,
        )
