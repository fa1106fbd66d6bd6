from . import asof, dedup, merge, multimodal, rangejoin, sampling, similarity, text  # noqa: F401
