"""Bench regression gate — the per-query best time across all recorded
rounds (BENCH_r*.json) is the committed floor; any round's bench must
stay within budget per headline query.

Budget per query: max(1.2 × floor, floor + 0.5 s) — the ratio catches
real regressions on substantial queries, the absolute grace keeps
sub-second queries from false-alarming on local-VM jitter (min-of-2
runs already smooths most of it, see bench.py).

Streaming throughput ("stream" section, rows/sec — higher is better)
gates the other way: current must stay ≥ best-recorded / 1.2.

Usage: python scripts/bench_gate.py [path/to/current_bench.json]
  With no argument, runs `python bench.py` fresh (several minutes at
  sf0.1) and gates on its output. With an argument, gates on an
  existing BENCH_r{N}.json (either the raw one-line JSON from bench.py
  or the driver's wrapper with a "parsed" key).
Exit 0 = within budget; exit 1 = regression (named, with ratios).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
RATIO = 1.2
GRACE_SEC = 0.5


def _unwrap(doc: dict) -> dict:
    return doc["parsed"] if "parsed" in doc else doc


def _queries(doc: dict) -> dict[str, float]:
    return _unwrap(doc)["queries"]


def _floors() -> tuple[dict[str, float], dict[str, float]]:
    """Per-query minimum seconds and per-metric maximum rows/sec over
    every recorded round (skipping the file under test if it is one of
    them is unnecessary — a new best simply tightens the next floor)."""
    q_floor: dict[str, float] = {}
    s_floor: dict[str, float] = {}
    for path in sorted(REPO.glob("BENCH_r*.json")):
        doc = _unwrap(json.loads(path.read_text()))
        for name, t in doc.get("queries", {}).items():
            q_floor[name] = min(t, q_floor.get(name, t))
        for name, v in doc.get("stream", {}).items():
            if name.endswith("_rows_per_sec"):
                s_floor[name] = max(v, s_floor.get(name, v))
    return q_floor, s_floor


def _current() -> dict:
    if len(sys.argv) > 1:
        return json.loads(pathlib.Path(sys.argv[1]).read_text())
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    q_floor, s_floor = _floors()
    cur_doc = _unwrap(_current())
    cur = cur_doc["queries"]

    regressions, lines = [], []
    for name, t in sorted(cur.items()):
        if name not in q_floor:
            lines.append(f"  {name}: {t:.3f}s (new, no floor)")
            continue
        budget = max(RATIO * q_floor[name], q_floor[name] + GRACE_SEC)
        flag = "" if t <= budget else "  << REGRESSION"
        lines.append(
            f"  {name}: {t:.3f}s vs floor {q_floor[name]:.3f}s "
            f"(budget {budget:.3f}s){flag}"
        )
        if t > budget:
            regressions.append(name)
    for name, v in sorted(cur_doc.get("stream", {}).items()):
        if not name.endswith("_rows_per_sec"):
            continue
        if name not in s_floor:
            lines.append(f"  {name}: {v:.0f} rows/s (new, no floor)")
            continue
        budget = s_floor[name] / RATIO
        flag = "" if v >= budget else "  << REGRESSION"
        lines.append(
            f"  {name}: {v:.0f} rows/s vs best {s_floor[name]:.0f} "
            f"(budget ≥{budget:.0f}){flag}"
        )
        if v < budget:
            regressions.append(name)
    print("\n".join(lines))
    tot_cur = sum(cur.values())
    tot_floor = sum(q_floor.get(n, cur[n]) for n in cur)
    print(f"total: {tot_cur:.2f}s vs best-recorded floor {tot_floor:.2f}s")
    if regressions:
        print(f"REGRESSED: {regressions}")
        sys.exit(1)
    print("bench-gate: PASS")


if __name__ == "__main__":
    main()
