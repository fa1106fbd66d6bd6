from . import asof, dedup, merge, multimodal, rangejoin, similarity, text  # noqa: F401
