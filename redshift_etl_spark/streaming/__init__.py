from . import ctr  # noqa: F401
