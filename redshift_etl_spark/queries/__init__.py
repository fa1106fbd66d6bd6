from . import agent_metrics, llm_data, relational, tables, tpch_shapes  # noqa: F401


# Registration order IS the driver's execution order (dicts preserve
# insertion order). Round 1's driver run covered the first 50 entries
# (agent_metrics + relational) before stopping, leaving llm_data and
# tpch_shapes judge-verified only — so those now come FIRST, and the
# r1-green suites re-verify after them if the driver's budget allows.
_MODULES = (llm_data, tpch_shapes, agent_metrics, relational)


def all_queries() -> dict:
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
