from . import batch, checkpoint, rest, sinks  # noqa: F401
