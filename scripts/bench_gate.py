"""Bench regression gate — r1's per-query times are the committed
floor; any round's bench must stay within budget per headline query.

Budget per query: max(1.2 × floor, floor + 0.5 s) — the ratio catches
real regressions on substantial queries, the absolute grace keeps
sub-second queries from false-alarming on local-VM jitter (min-of-2
runs already smooths most of it, see bench.py).

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
FLOOR_FILE = REPO / "BENCH_r01.json"
RATIO = 1.2
GRACE_SEC = 0.5


def _queries(doc: dict) -> dict[str, float]:
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc["queries"]


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
    floor = _queries(json.loads(FLOOR_FILE.read_text()))
    cur = _queries(_current())

    regressions, lines = [], []
    for name, t in sorted(cur.items()):
        if name not in floor:
            lines.append(f"  {name}: {t:.3f}s (new, no floor)")
            continue
        budget = max(RATIO * floor[name], floor[name] + GRACE_SEC)
        flag = "" if t <= budget else "  << REGRESSION"
        lines.append(
            f"  {name}: {t:.3f}s vs floor {floor[name]:.3f}s "
            f"(budget {budget:.3f}s){flag}"
        )
        if t > budget:
            regressions.append(name)
    print("\n".join(lines))
    tot_cur = sum(cur.values())
    tot_floor = sum(floor.values())
    print(f"total: {tot_cur:.2f}s vs r1 floor {tot_floor:.2f}s")
    if regressions:
        print(f"REGRESSED: {regressions}")
        sys.exit(1)
    print("bench-gate: PASS")


if __name__ == "__main__":
    main()
