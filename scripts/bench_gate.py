"""Bench regression gate — the per-query best time across all recorded
rounds (BENCH_r*.json) is the committed floor; any round's bench must
stay within budget per headline query.

Budget per query: load_factor × max(1.2 × floor, floor + 0.5 s) — the
ratio catches real regressions on substantial queries, the absolute
grace keeps sub-second queries from false-alarming on local-VM jitter
(min-of-2 runs already smooths most of it, see bench.py), and the
LOAD FACTOR normalizes sustained machine load: bench.py times a fixed
synthetic canary (no repo code) at bench start, and the current
canary / committed canary floor scales every budget, capped at 3×
(past that the round should be re-recorded, not excused). Rounds 4 and
5 both false-flagged untouched queries because sustained VM load is
indistinguishable from regression without an independent load signal —
the canary is that signal: load slows the canary and the queries
alike; a code regression slows only its query.

Streaming throughput ("stream" section, rows/sec — higher is better)
gates the other way: current must stay ≥ best-recorded / 1.2 /
load_factor.

Usage: python scripts/bench_gate.py [path/to/current_bench.json]
  With no argument, runs `python bench.py` fresh (several minutes at
  sf0.1) and gates on its output. With an argument, gates on an
  existing BENCH_r{N}.json (either the raw one-line JSON from bench.py
  or the driver's wrapper with a "parsed" key).
Exit 0 = within budget; exit 1 = regression (named, with ratios).
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
RATIO = 1.2
GRACE_SEC = 0.5
LOAD_FACTOR_CAP = 3.0

_spec = importlib.util.spec_from_file_location(
    "benchlib", pathlib.Path(__file__).resolve().parent / "benchlib.py"
)
benchlib = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(benchlib)

# shared with bench.py (scripts/benchlib.py): driver-wrapper-tolerant
# unwrap (recovers truncated tails — the r09 parsed:null defect) and
# the single floor computation both tools must agree on
floors_from_docs = benchlib.floors_from_docs


def _unwrap(doc: dict) -> dict:
    rec = benchlib.unwrap(doc)
    if rec is None:
        raise SystemExit(
            "bench-gate: current bench record is unrecoverable "
            "(parsed null and no parseable tail) — re-run bench.py"
        )
    # bounded driver captures since r12 carry the complete per-query
    # map as a compact ms array — expand so the gate grades ALL
    # headline queries, not just the named top slice (r11 finding #3).
    # ANY failure to load the name list (a broken bench.py edit, not
    # just a missing file) degrades to the named slice rather than
    # aborting the gate.
    try:
        names = benchlib.headline_names(REPO)
    except Exception:
        names = None
    return benchlib.expand_compact(rec, names)


def _recorded_floors() -> dict:
    return benchlib.collect_floors(REPO)


def load_factor(
    cur_doc: dict,
    canary_floor: float | None,
    canary_str_floor: float | None = None,
) -> float:
    """The WORSE of (shuffle canary, string canary) vs their committed
    floors, clamped to [1, cap] — shuffle load and string-CPU drift
    hit different query families (r11: text queries at 1.5-1.6x floor
    while the shuffle canary read 1.08). Either side unrecorded
    (legacy rounds / first string-canary round) contributes 1.0."""
    rec = _unwrap(cur_doc)
    ratios = [1.0]
    c = rec.get("canary_sec")
    if c is not None and canary_floor is not None:
        ratios.append(c / canary_floor)
    cs = rec.get("canary_str_sec")
    if cs is not None and canary_str_floor is not None:
        ratios.append(cs / canary_str_floor)
    return min(max(1.0, max(ratios)), LOAD_FACTOR_CAP)


ADVISORY_LOAD = 1.5


def gate(
    cur_doc: dict, floors: dict
) -> tuple[list[str], list[str], list[str]]:
    """Pure gate: returns (report_lines, regressed_names,
    advisory_names).

    Advisory tier (ADVICE r06): a heavily-loaded round grades itself
    leniently — at load_factor 2.5 a ~2.9× slowdown still fits the
    scaled budget. So above ADVISORY_LOAD the gate stops trusting the
    scaling as PROOF of health: queries that pass the scaled budget
    but would FAIL the idle (unscaled) budget are returned as
    `advisory` — not regressions, but not cleared either; the round's
    numbers should be re-recorded on an idle machine before being
    committed as floors. Queries inside the idle budget even under
    load are genuinely clean and pass outright."""
    cur_doc = _unwrap(cur_doc)
    cur = cur_doc["queries"]
    q_floor, s_floor = floors["queries"], floors["stream"]
    lf = load_factor(
        cur_doc, floors.get("canary"), floors.get("canary_str")
    )
    advisory_mode = lf > ADVISORY_LOAD

    regressions, advisory, lines = [], [], []
    lines.append(f"  load_factor: {lf:.2f} (canary-normalized budgets)")
    if advisory_mode:
        lines.append(
            f"  !! load_factor > {ADVISORY_LOAD}: scaled-budget passes "
            "that exceed the idle budget are ADVISORY — re-run idle "
            "before committing this round's numbers"
        )
    for name, t in sorted(cur.items()):
        if name not in q_floor:
            lines.append(f"  {name}: {t:.3f}s (new, no floor)")
            continue
        idle_budget = max(RATIO * q_floor[name], q_floor[name] + GRACE_SEC)
        budget = lf * idle_budget
        if t > budget:
            flag = "  << REGRESSION"
            regressions.append(name)
        elif advisory_mode and t > idle_budget:
            flag = "  << ADVISORY (passes only via load scaling)"
            advisory.append(name)
        else:
            flag = ""
        lines.append(
            f"  {name}: {t:.3f}s vs floor {q_floor[name]:.3f}s "
            f"(budget {budget:.3f}s){flag}"
        )
    for name, v in sorted(cur_doc.get("stream", {}).items()):
        if not name.endswith("_rows_per_sec"):
            continue
        if name not in s_floor:
            lines.append(f"  {name}: {v:.0f} rows/s (new, no floor)")
            continue
        idle_budget = s_floor[name] / RATIO
        budget = idle_budget / lf
        if v < budget:
            flag = "  << REGRESSION"
            regressions.append(name)
        elif advisory_mode and v < idle_budget:
            flag = "  << ADVISORY (passes only via load scaling)"
            advisory.append(name)
        else:
            flag = ""
        lines.append(
            f"  {name}: {v:.0f} rows/s vs best {s_floor[name]:.0f} "
            f"(budget ≥{budget:.0f}){flag}"
        )
    tot_cur = sum(cur.values())
    tot_floor = sum(q_floor.get(n, cur[n]) for n in cur)
    lines.append(
        f"total: {tot_cur:.2f}s vs best-recorded floor {tot_floor:.2f}s"
    )
    return lines, regressions, advisory


def _current() -> dict:
    if len(sys.argv) > 1:
        return json.loads(pathlib.Path(sys.argv[1]).read_text())
    import time

    t0 = time.time()
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    # bench.py's stdout line is bounded (top-10 slowest only, so driver
    # tails always parse); the FULL per-query record it just wrote is
    # what a fresh gate run should grade. mtime-guarded so a leftover
    # file from an older run is never graded as current.
    full = REPO / benchlib.FULL_FILE
    if full.exists() and full.stat().st_mtime >= t0:
        return json.loads(full.read_text())
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lines, regressions, advisory = gate(_current(), _recorded_floors())
    print("\n".join(lines))
    if regressions:
        print(f"REGRESSED: {regressions}")
        sys.exit(1)
    if advisory:
        print(
            f"ADVISORY: {advisory} — within load-scaled budget only; "
            "re-run on an idle machine before trusting this round"
        )
        sys.exit(2)
    print("bench-gate: PASS")


if __name__ == "__main__":
    main()
