from . import asof, dedup, export, graph, heavy, merge, multimodal, rangejoin, sampling, similarity, text  # noqa: F401
