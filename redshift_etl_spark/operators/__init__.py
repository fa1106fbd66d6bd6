from . import dedup, merge, multimodal, similarity, text  # noqa: F401
