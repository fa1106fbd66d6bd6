"""Shared bench-record plumbing for bench.py and scripts/bench_gate.py.

Three jobs, one module, because round 9 proved they must agree:

1. **Tolerant unwrap.** The driver records each round's bench as
   ``{"parsed": <json>, "tail": <last 2000 chars of stdout>, ...}``.
   When bench.py's final stdout line outgrew the tail capture (68
   headline queries, round 9), the driver committed ``"parsed": null``
   and every floor reader crashed on ``None.get``. ``unwrap`` now
   falls back to regex-recovering ``"name": seconds`` pairs plus the
   canary/stream scalars from the tail — the truncation cuts the
   START of the line, so the tail's trailing pairs are intact and the
   one cut-off leading pair has no opening quote and never matches.
   Unrecoverable docs return ``None`` and are skipped, never fatal.

2. **Committed full-record floors.** The final stdout line is now
   BOUNDED (top-10 slowest only) so the driver tail always parses, and
   the FULL per-query record goes to ``BENCH_FULL.json`` (this run)
   plus a monotone ``BENCH_FLOORS.json`` (per-query min / per-stream
   max / canary min across every sf0.1 run ever recorded). Floors no
   longer depend on driver tails at all.

3. **One floor computation.** bench.py's adaptive re-run budgets and
   bench_gate.py's regression budgets read the same
   ``collect_floors`` so they cannot drift apart.
"""

from __future__ import annotations

import json
import pathlib
import re

FLOORS_FILE = "BENCH_FLOORS.json"
FULL_FILE = "BENCH_FULL.json"

# a quoted identifier key with a bare numeric value — the shape of
# every per-query / scalar entry on bench.py's JSON line. String-valued
# keys ("metric", "unit", "queries_full_file") never match.
_PAIR = re.compile(r'"([A-Za-z0-9_]+)"\s*:\s*(-?\d+(?:\.\d+)?)')

# scalar fields on the bench line that are NOT query timings
_SCALARS = (
    "canary_sec", "canary_floor_sec", "load_factor", "sf",
    "canary_str_sec", "canary_str_floor_sec", "load_factor_str",
    "canary_post_stream_sec", "canary_post_stream_str_sec",
    "load_factor_best",
)
_IGNORE = ("value", "n_queries")
_STREAM_SUFFIXES = ("_rows_per_sec", "_rows", "_batches")


def q_sig(names: list[str]) -> str:
    """8-hex signature of an ordered query-name list. The bounded bench
    line carries the COMPLETE per-query map as a millisecond array in
    HEADLINE order (``qms``) — ~6 chars per query, so 87 queries fit
    the driver's 2,000-char tail where 87 named pairs cannot (r11 judge
    finding #3). The array is positional, so expansion is only safe
    against the exact name list that produced it: this signature is
    recorded beside it and checked at expansion time."""
    import hashlib

    return hashlib.md5(",".join(names).encode()).hexdigest()[:8]


def headline_names(repo: str | pathlib.Path) -> list[str]:
    """bench.py's HEADLINE order, loaded by path (bench.py lives at the
    repo root, outside any package)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_root_for_names", pathlib.Path(repo) / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.HEADLINE)


def expand_compact(rec: dict | None, names: list[str] | None) -> dict | None:
    """Expand a bounded record's ``qms`` millisecond array into the full
    named ``queries`` map. Only when the record's ``q_sig`` matches
    ``names`` exactly (a HEADLINE edited since capture would silently
    mis-attribute timings otherwise) — on mismatch the record passes
    through untouched with whatever named entries it carries. Returns
    a SHALLOW COPY on expansion (never mutates the caller's doc — a
    caller holding the raw driver record to re-serialize or diff must
    not see its queries silently replaced)."""
    if not rec or not names or not rec.get("qms"):
        return rec
    if rec.get("q_sig") != q_sig(names) or len(rec["qms"]) != len(names):
        return rec
    full = {n: round(ms / 1000.0, 3) for n, ms in zip(names, rec["qms"])}
    full.update(rec.get("queries", {}))
    out = dict(rec)
    out["queries"] = full
    return out


def recover_from_tail(tail: str) -> dict | None:
    """Rebuild a bench record from a driver tail that truncated the
    final JSON line. Returns the partial record (queries/stream/canary
    that survived in the tail) or None when nothing recoverable.

    Only trusted when the tail contains the END of the line (a closing
    brace): the driver tail is a suffix, so a present line-end means
    every matched pair is complete — a pair cut at the front loses its
    opening quote and is dropped by the regex, never half-parsed."""
    if not tail or "}" not in tail:
        return None
    doc: dict = {"queries": {}, "stream": {}}
    for name, val in _PAIR.findall(tail):
        v = float(val)
        if name in _IGNORE:
            continue
        if name in _SCALARS:
            doc[name] = v
        elif name.endswith(_STREAM_SUFFIXES):
            doc["stream"][name] = v
        else:
            doc["queries"][name] = v
    if not (doc["queries"] or doc["stream"] or "canary_sec" in doc):
        return None
    return doc


def unwrap(doc: dict) -> dict | None:
    """Driver-wrapper-tolerant record access: a raw bench record passes
    through, ``{"parsed": {...}}`` unwraps, and ``{"parsed": null,
    "tail": ...}`` (the r09 truncation) recovers from the tail.
    Returns None when the doc carries nothing usable — callers skip."""
    if "parsed" not in doc:
        return doc
    if doc["parsed"] is not None:
        return doc["parsed"]
    return recover_from_tail(doc.get("tail", ""))


def floors_from_docs(docs: list[dict], names: list[str] | None = None) -> dict:
    """Committed floors over recorded rounds: per-query minimum
    seconds, per-stream-metric maximum rows/sec, and the canary
    minimum (the idle-machine anchor). Unrecoverable docs are skipped.
    With ``names``, bounded records' compact ``qms`` arrays expand to
    their full per-query maps first (driver captures since r12)."""
    q_floor: dict[str, float] = {}
    s_floor: dict[str, float] = {}
    canary_floor: float | None = None
    canary_str_floor: float | None = None
    for raw in docs:
        doc = expand_compact(unwrap(raw), names)
        if doc is None:
            continue
        for name, t in doc.get("queries", {}).items():
            q_floor[name] = min(t, q_floor.get(name, t))
        for name, v in doc.get("stream", {}).items():
            if name.endswith("_rows_per_sec"):
                s_floor[name] = max(v, s_floor.get(name, v))
        # canary_sec carries the WORST probe since r12 (the gate-scaling
        # value); a run's floor-candidate is its BEST probe, recorded in
        # canary_probes — fall back to canary_sec for legacy records
        probes = doc.get("canary_probes")
        c = min(probes) if probes else doc.get("canary_sec")
        if c is not None:
            canary_floor = c if canary_floor is None else min(canary_floor, c)
        sprobes = doc.get("canary_str_probes")
        cs = min(sprobes) if sprobes else doc.get("canary_str_sec")
        if cs is not None:
            canary_str_floor = (
                cs if canary_str_floor is None else min(canary_str_floor, cs)
            )
    return {
        "queries": q_floor,
        "stream": s_floor,
        "canary": canary_floor,
        "canary_str": canary_str_floor,
    }


def collect_floors(repo: str | pathlib.Path) -> dict:
    """All recorded floors for this repo: every driver-committed
    BENCH_r*.json (tail-recovered where truncated), the monotone
    BENCH_FLOORS.json written by bench.py itself, and the verified-idle
    CANARY_FLOOR.json anchor (keeps the canary floor pinned to a
    demonstrated idle time even across a streak of loaded rounds)."""
    repo = pathlib.Path(repo)
    docs = [
        json.loads(p.read_text())
        for p in sorted(repo.glob("BENCH_r*.json"))
    ]
    floors_path = repo / FLOORS_FILE
    if floors_path.exists():
        f = json.loads(floors_path.read_text())
        docs.append(
            {
                "queries": f.get("queries", {}),
                "stream": f.get("stream", {}),
                "canary_sec": f.get("canary_sec"),
                "canary_str_sec": f.get("canary_str_sec"),
            }
        )
    try:
        names = headline_names(repo)
    except Exception:
        # a broken bench.py (import/syntax error mid-edit) must degrade
        # floors to the named slices, never crash the reader
        names = None
    floors = floors_from_docs(docs, names)
    anchor_path = repo / "CANARY_FLOOR.json"
    if anchor_path.exists():
        a = json.loads(anchor_path.read_text())
        # BOTH canaries floor-pin to their verified-idle anchors (the
        # string anchor got the multi-run treatment in r12 — verdict
        # item 3): min(anchor, recorded) everywhere, so a streak of
        # loaded rounds can never drift a floor upward
        for key, field in (
            ("canary_sec", "canary"),
            ("canary_str_sec", "canary_str"),
        ):
            av = a.get(key)
            if av is not None:
                c = floors.get(field)
                floors[field] = av if c is None else min(c, av)
    return floors


def merge_floors_file(
    repo: str | pathlib.Path,
    queries: dict[str, float],
    stream: dict[str, float],
    canary_sec: float | None,
    note: str = "",
    canary_str_sec: float | None = None,
) -> dict:
    """Fold one sf0.1 run's timings into the committed monotone floors
    file (query min / stream-rate max / canary min) and write it back.
    Loaded runs are safe to fold — a slower time never lowers a min."""
    repo = pathlib.Path(repo)
    path = repo / FLOORS_FILE
    cur = json.loads(path.read_text()) if path.exists() else {}
    q = dict(cur.get("queries", {}))
    for name, t in queries.items():
        q[name] = min(t, q.get(name, t))
    s = dict(cur.get("stream", {}))
    for name, v in stream.items():
        if name.endswith("_rows_per_sec"):
            s[name] = max(v, s.get(name, v))
    c = cur.get("canary_sec")
    if canary_sec is not None:
        c = canary_sec if c is None else min(c, canary_sec)
    cs = cur.get("canary_str_sec")
    if canary_str_sec is not None:
        cs = canary_str_sec if cs is None else min(cs, canary_str_sec)
    out = {
        "queries": dict(sorted(q.items())),
        "stream": dict(sorted(s.items())),
        "canary_sec": c,
        "canary_str_sec": cs,
        "note": note
        or cur.get(
            "note",
            "monotone floors: per-query min / stream max / canary min "
            "across every recorded sf0.1 bench run",
        ),
    }
    path.write_text(json.dumps(out, indent=1) + "\n")
    return out
