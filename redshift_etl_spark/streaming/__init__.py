from . import (  # noqa: F401
    annindex,
    ctr,
    driftmon,
    heavy,
    ingest,
    stateful,
    topk,
    trending,
)
