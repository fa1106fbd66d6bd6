from . import asof, dedup, export, graph, heavy, merge, multimodal, pq, rangejoin, sampling, similarity, text  # noqa: F401
