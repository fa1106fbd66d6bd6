from . import agent_metrics, llm_data, relational, tables, tpch_shapes  # noqa: F401


def all_queries() -> dict:
    out = {}
    out.update(agent_metrics.QUERIES)
    out.update(relational.QUERIES)
    out.update(llm_data.QUERIES)
    out.update(tpch_shapes.QUERIES)
    return out


def all_oracles() -> dict:
    out = {}
    out.update(agent_metrics.ORACLES)
    out.update(relational.ORACLES)
    out.update(llm_data.ORACLES)
    out.update(tpch_shapes.ORACLES)
    return out
