from . import ctr, stateful  # noqa: F401
