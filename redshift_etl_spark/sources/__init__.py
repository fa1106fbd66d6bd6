from . import batch, checkpoint, lake, rest, sinks  # noqa: F401
