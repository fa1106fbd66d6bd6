"""bench.py advisory stamp: a loaded run must carry its evidentiary
status IN the record so it can never silently become the round's
committed artifact (r10 verdict item 6: the r10 record was captured at
load 1.76 with 9 scaled-budget-only passes)."""

from __future__ import annotations

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench_root", pathlib.Path(__file__).resolve().parents[1] / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_idle_run_is_not_advisory():
    full = bench.stamp_advisory({"load_factor": 1.05})
    assert full["advisory"] is False
    assert "advisory_reason" not in full


def test_boundary_is_clean_just_past_is_advisory():
    assert bench.stamp_advisory({"load_factor": 1.3})["advisory"] is False
    stamped = bench.stamp_advisory({"load_factor": 1.31})
    assert stamped["advisory"] is True
    assert "re-run on an idle machine" in stamped["advisory_reason"]


def test_r10_load_would_have_been_stamped():
    assert bench.stamp_advisory({"load_factor": 1.764})["advisory"] is True


def test_missing_or_null_load_factor_defaults_clean():
    # legacy/first-round records have no canary floor -> load_factor
    # absent or null; those ran before the floor protocol and must not
    # crash the stamp
    assert bench.stamp_advisory({})["advisory"] is False
    assert bench.stamp_advisory({"load_factor": None})["advisory"] is False


def test_median_probe_outranks_best_probe():
    # r12 verdict item 2: a window loaded for most of its duration with
    # one quiet probe must still stamp advisory
    stamped = bench.stamp_advisory(
        {"load_factor": 2.4, "load_factor_best": 1.05,
         "load_factor_median": 1.9}
    )
    assert stamped["advisory"] is True


def test_non_default_cpus_is_advisory_with_explicit_reason():
    # r13 judge finding #4: the 8-core scaling run divided its probes
    # by 32-core floors and read a bogus load_factor 3.0; the stamp
    # must name the structural cause, not pretend the machine is loaded
    stamped = bench.stamp_advisory({"load_factor": 3.0, "cpus": 8})
    assert stamped["advisory"] is True
    assert "non-default cpus" in stamped["advisory_reason"]
    assert "32" in stamped["advisory_reason"]


def test_default_cpus_stamps_by_load_alone():
    assert bench.stamp_advisory(
        {"load_factor": 1.05, "cpus": 32}
    )["advisory"] is False
    assert bench.stamp_advisory(
        {"load_factor": 1.05, "cpus": None}
    )["advisory"] is False
