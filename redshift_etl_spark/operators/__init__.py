from . import asof, dedup, heavy, merge, multimodal, rangejoin, sampling, similarity, text  # noqa: F401
