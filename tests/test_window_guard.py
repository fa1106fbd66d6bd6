"""Guard: no unpartitioned global window anywhere in the engine source
except an explicit allowlist of bounded-frame cases.

`Window.orderBy(...)` with no `partitionBy` serializes the whole frame
through a single task — the scale anti-pattern the round-4 verdict
flagged in rfm_segments / quality_decile_lift / domain_lorenz (all
since rewritten to percentile-edge bucketing or top-K). This test walks
the AST of every source file and asserts each remaining occurrence sits
inside a function on the allowlist, where the windowed frame is bounded
by construction:

- build_vocab        — frame is the LIMITed vocab (<= size rows)
- bm25_topk          — frame is the LIMITed top-k (<= k rows)
- weekly_active_users — frame is week-grain (bounded by calendar span)
- domain_lorenz      — frame is the LIMITed top-K domain head (<= 50)
- ranked_cumsum      — frame is one row per SHUFFLE PARTITION (bounded
  by spark.sql.shuffle.partitions, a cluster config, not the data);
  this operator IS the scalable replacement for global windows

Adding a new global window requires adding the function here WITH a
bounded-frame justification — unbounded frames must use the
percentile-edge / 1-row-agg-broadcast idioms instead.
"""

import ast
import pathlib

SRC_ROOT = pathlib.Path(__file__).resolve().parents[1] / "redshift_etl_spark"

ALLOWED = {
    ("operators/text.py", "build_vocab"),
    ("operators/text.py", "bm25_topk"),
    ("queries/relational.py", "weekly_active_users"),
    ("queries/curation.py", "domain_lorenz"),
    ("operators/distsort.py", "ranked_cumsum"),
}


def _global_window_sites():
    """Yield (relpath, enclosing_function) for every `Window.orderBy(`
    call in the package source."""
    sites = []
    for path in sorted(SRC_ROOT.rglob("*.py")):
        rel = str(path.relative_to(SRC_ROOT))
        tree = ast.parse(path.read_text())
        # map line -> innermost enclosing function name
        func_spans = []
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                func_spans.append(
                    (node.lineno, node.end_lineno, node.name)
                )
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Attribute)
                and node.attr == "orderBy"
                and isinstance(node.value, ast.Name)
                and node.value.id == "Window"
            ):
                enclosing = None
                best = None
                for lo, hi, name in func_spans:
                    if lo <= node.lineno <= hi:
                        if best is None or (hi - lo) < best:
                            best = hi - lo
                            enclosing = name
                sites.append((rel, enclosing, node.lineno))
    return sites


def test_no_unpartitioned_global_windows_outside_allowlist():
    sites = _global_window_sites()
    offenders = [
        s for s in sites if (s[0], s[1]) not in ALLOWED
    ]
    assert not offenders, (
        "Unpartitioned Window.orderBy outside the bounded-frame "
        f"allowlist: {offenders} — use percentile-edge bucketing or a "
        "1-row-agg broadcast instead, or add to ALLOWED with a bounded-"
        "frame justification."
    )


def test_allowlist_has_no_dead_entries():
    live = {(s[0], s[1]) for s in _global_window_sites()}
    dead = ALLOWED - live
    assert not dead, f"stale allowlist entries: {dead}"
