"""Rehearsal artifacts must be self-explaining: any probe whose 10x
slope exceeds 2.5x carries a `note` with the measured cause IN the
JSON (r10 verdict item 2 — a reader of the artifact alone must not
have to dig explanations out of script comments)."""

from __future__ import annotations

import glob
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]
STEEP = 2.5


def test_every_steep_slope_carries_its_measured_cause():
    files = sorted(glob.glob(str(ROOT / "REHEARSAL_r*.json")))
    assert files, "no rehearsal artifacts found"
    missing = []
    for f in files:
        with open(f) as fh:
            doc = json.load(fh)
        for name, row in doc.get("queries", {}).items():
            if not isinstance(row, dict):
                continue
            if (row.get("slope_at_10x") or 0) > STEEP and not row.get("note"):
                missing.append(f"{pathlib.Path(f).name}:{name}")
    assert not missing, f"steep slopes without a note: {missing}"


def test_rehearsal_script_emits_notes_for_future_runs():
    # the generator itself must attach notes, so new artifacts are born
    # annotated rather than retrofitted
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scale_rehearsal", ROOT / "scripts" / "scale_rehearsal.py"
    )
    sr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sr)
    row = sr._entry("semdedup", {"sf0.1": 1.0, "sfbig": 7.0}, 7.0)
    assert "note" in row and "clique" in row["note"]
    plain = sr._entry("pricing_summary", {"sf0.1": 1.0, "sfbig": 1.2}, 1.2)
    assert "note" not in plain
