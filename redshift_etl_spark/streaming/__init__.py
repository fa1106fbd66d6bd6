from . import ctr, heavy, ingest, stateful, topk, trending  # noqa: F401
