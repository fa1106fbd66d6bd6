from . import dedup, merge, similarity, text  # noqa: F401
