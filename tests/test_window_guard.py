"""Guard: no unpartitioned global window anywhere in the engine source
except an explicit allowlist of bounded-frame cases.

A window whose spec has no (non-empty) `partitionBy` serializes the
whole frame through a single task — the scale anti-pattern the round-4
verdict flagged in rfm_segments / quality_decile_lift / domain_lorenz
(all since rewritten to percentile-edge bucketing or top-K). This test
walks the AST of every source file and asserts each remaining
occurrence sits inside a function on the allowlist, where the windowed
frame is bounded by construction:

- build_vocab        — frame is the LIMITed vocab (<= size rows)
- bm25_topk          — frame is the LIMITed top-k (<= k rows)
- diversified_topk   — frame is the LIMITed global cut (<= k rows)
- weekly_active_users — frame is week-grain (bounded by calendar span)
- domain_lorenz      — frame is the LIMITed top-K domain head (<= 50)
- ranked_cumsum      — frame is one row per SHUFFLE PARTITION (bounded
  by spark.sql.shuffle.partitions, a cluster config, not the data);
  this operator IS the scalable replacement for global windows

The sweep is alias-robust (round-5 verdict hardening): it resolves
every local name bound to pyspark's Window class — `from pyspark.sql
import Window as W`, `from pyspark.sql.window import Window`, and
second-order `X = W` assignments — and flags

  1. `<WindowAlias>.orderBy(...)`  (global window, no partition spec)
  2. any zero-argument `.partitionBy()` call (the
     `Window.partitionBy().orderBy(...)` idiom is an empty partition
     spec — semantically identical to case 1, and there is no
     legitimate zero-arg partitionBy anywhere in the pyspark API
     surface this repo uses)

Adding a new global window requires adding the function here WITH a
bounded-frame justification — unbounded frames must use the
percentile-edge / 1-row-agg-broadcast / ranked_cumsum idioms instead.
"""

import ast
import pathlib
import textwrap

SRC_ROOT = pathlib.Path(__file__).resolve().parents[1] / "redshift_etl_spark"

ALLOWED = {
    ("operators/text.py", "build_vocab"),
    ("operators/text.py", "bm25_topk"),
    ("operators/distsort.py", "diversified_topk"),
    ("queries/relational.py", "weekly_active_users"),
    ("queries/curation.py", "domain_lorenz"),
    ("operators/distsort.py", "ranked_cumsums"),
    # lag over the one-row-per-epoch metrics frame: bounded by the
    # number of stream epochs, never by data volume (r08)
    ("streaming/monitor.py", "quality_trend"),
    # suffix risk sum + prefix micro-ln sum over the DAY frame:
    # bounded by the study-window calendar constant (<= ~31 rows),
    # never by data volume (r10)
    ("operators/funnel.py", "kaplan_meier"),
    # same day-frame suffix risk sums, per cohort: bounded by the
    # study-window calendar constant, never by data volume (r11)
    ("operators/funnel.py", "log_rank_test"),
    # rank over the k TakeOrdered survivors (50 rows by the sample
    # budget config) (r10)
    ("queries/llm_data.py", "weighted_exact_k_sample"),
    # rank over the 10 TakeOrdered survivors (top-k config) (r10)
    ("queries/relational.py", "hits_authorities"),
    # row_number + count over the B replica means: bounded by the
    # bootstrap's b config (<= 512 rows by the ValueError guard),
    # never by data volume (r12)
    ("operators/sampling.py", "bootstrap_mean_ci"),
}

_WINDOW_MODULES = {"pyspark.sql", "pyspark.sql.window"}


def _window_aliases(tree: ast.AST) -> set:
    """Every name in this module bound (directly or by one level of
    re-assignment) to pyspark's Window class."""
    aliases = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module in _WINDOW_MODULES:
            for a in node.names:
                if a.name == "Window":
                    aliases.add(a.asname or a.name)
    # second-order: X = W  (or X = Window)
    grew = True
    while grew:
        grew = False
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Assign)
                and isinstance(node.value, ast.Name)
                and node.value.id in aliases
            ):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name) and tgt.id not in aliases:
                        aliases.add(tgt.id)
                        grew = True
    return aliases


def _scan_tree(tree: ast.AST, rel: str):
    """Yield (relpath, enclosing_function, lineno, kind) for every
    unpartitioned-window site in one module's AST."""
    aliases = _window_aliases(tree)
    func_spans = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            func_spans.append((node.lineno, node.end_lineno, node.name))

    def enclosing(lineno):
        best, name = None, None
        for lo, hi, fn in func_spans:
            if lo <= lineno <= hi and (best is None or (hi - lo) < best):
                best, name = hi - lo, fn
        return name

    sites = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute):
            if (
                node.attr == "orderBy"
                and isinstance(node.value, ast.Name)
                and node.value.id in aliases
            ):
                sites.append(
                    (rel, enclosing(node.lineno), node.lineno, "Window.orderBy")
                )
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "partitionBy"
            and not node.args
            and not node.keywords
        ):
            sites.append(
                (
                    rel,
                    enclosing(node.lineno),
                    node.lineno,
                    "empty partitionBy()",
                )
            )
    return sites


def _global_window_sites(root: pathlib.Path = SRC_ROOT):
    sites = []
    for path in sorted(root.rglob("*.py")):
        rel = str(path.relative_to(root))
        sites.extend(_scan_tree(ast.parse(path.read_text()), rel))
    return sites


def test_no_unpartitioned_global_windows_outside_allowlist():
    offenders = [
        s for s in _global_window_sites() if (s[0], s[1]) not in ALLOWED
    ]
    assert not offenders, (
        "Unpartitioned window outside the bounded-frame allowlist: "
        f"{offenders} — use percentile-edge bucketing, ranked_cumsum, "
        "or a 1-row-agg broadcast instead, or add to ALLOWED with a "
        "bounded-frame justification."
    )


def test_allowlist_has_no_dead_entries():
    live = {(s[0], s[1]) for s in _global_window_sites()}
    dead = ALLOWED - live
    assert not dead, f"stale allowlist entries: {dead}"


# --- sweep self-tests: planted offenders MUST be caught -----------------

def _plant(tmp_path, source):
    mod = tmp_path / "scratch.py"
    mod.write_text(textwrap.dedent(source))
    return _global_window_sites(tmp_path)


def test_sweep_catches_plain_global_window(tmp_path):
    sites = _plant(
        tmp_path,
        """
        from pyspark.sql import Window

        def bad(df):
            return df.withColumn("rn", F.row_number().over(
                Window.orderBy("x")))
        """,
    )
    assert [s for s in sites if s[3] == "Window.orderBy"], sites


def test_sweep_catches_aliased_import(tmp_path):
    sites = _plant(
        tmp_path,
        """
        from pyspark.sql import Window as W

        def bad(df):
            return df.withColumn("rn", F.row_number().over(W.orderBy("x")))
        """,
    )
    assert [s for s in sites if s[3] == "Window.orderBy"], sites


def test_sweep_catches_window_module_import_and_reassign(tmp_path):
    sites = _plant(
        tmp_path,
        """
        from pyspark.sql.window import Window as Win

        Alias = Win

        def bad(df):
            return df.withColumn("rn", F.row_number().over(
                Alias.orderBy("x")))
        """,
    )
    assert [s for s in sites if s[3] == "Window.orderBy"], sites


def test_sweep_catches_empty_partition_by(tmp_path):
    sites = _plant(
        tmp_path,
        """
        from pyspark.sql import Window

        def bad(df):
            spec = Window.partitionBy().orderBy("x")
            return df.withColumn("rn", F.row_number().over(spec))
        """,
    )
    assert [s for s in sites if s[3] == "empty partitionBy()"], sites


def test_sweep_ignores_partitioned_window(tmp_path):
    sites = _plant(
        tmp_path,
        """
        from pyspark.sql import Window

        def good(df):
            spec = Window.partitionBy("k").orderBy("x")
            return df.withColumn("rn", F.row_number().over(spec))
        """,
    )
    assert not sites, sites
