from . import ctr, heavy, ingest, stateful, topk  # noqa: F401
