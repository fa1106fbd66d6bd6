"""Continuous top-k similarity — incremental ANN maintenance.

The batch catalog answers "top-k neighbors of each query" over a fixed
corpus (`similarity.cosine_topk`, the LSH/IVF/PQ scale paths). A
training-data pipeline usually meets the STREAMING version: vectors
arrive continuously and each registered query's top-k must stay
current (the "continuously adaptive similarity search" shape from the
retrieved papers — PAPERS.md). Recomputing per batch over the full
corpus is O(corpus) per trigger; this operator is O(batch):

- scoring is a stream-STATIC join: each micro-batch of vectors joins
  the broadcast query set and scores JVM-side (`similarity.cosine`
  fold — no Python in the scoring path);
- per-query state is just the current top-k (ids + scores arrays,
  bounded at k entries — fixed state forever, same posture as
  `streaming/heavy.py`);
- each batch merges new candidates into the state top-k and re-emits
  the query's current list (update mode).

Top-k is a mergeable summary: merge(state, batch_topk) ≡ topk(union)
— (score DESC, id ASC) total order makes the merge deterministic. The
pytest proves exactly that equivalence against a batch recompute over
everything seen.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import cosine

_STATE_SCHEMA = "ids array<long>, scores array<double>"
_OUT_SCHEMA = (
    "query_id long, neighbor_id long, cosine double, rank int"
)


def topk_similarity_stream(
    stream: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """``stream`` delivers (id_col, vec_col) vectors; ``queries`` is a
    STATIC frame of the same shape. Emits each affected query's full
    current top-k per micro-batch (update mode): (query_id,
    neighbor_id, cosine, rank)."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    scored = (
        stream.select(
            F.col(id_col).alias("nid"), F.col(vec_col).alias("nv")
        )
        .join(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            F.round(cosine("nv", "qv"), 6).alias("cos"),
        )
    )

    def fn(key, pdf_iter: Iterator, state) -> Iterator:
        import pandas as pd

        if state.exists:
            ids, scores = state.get
            top = list(zip(list(scores), list(ids)))
        else:
            top = []
        for pdf in pdf_iter:
            top.extend(zip(pdf["cos"].tolist(), pdf["nid"].tolist()))
        # (score DESC, id ASC) total order; ids unique per stream by
        # contract, duplicates (redelivery) collapse to one entry
        best: dict = {}
        for s, i in top:
            best[i] = max(best.get(i, s), s)
        merged = sorted(
            ((s, i) for i, s in best.items()), key=lambda t: (-t[0], t[1])
        )[:k]
        state.update(
            ([int(i) for _, i in merged], [float(s) for s, _ in merged])
        )
        yield pd.DataFrame(
            {
                "query_id": key[0],
                "neighbor_id": [i for _, i in merged],
                "cosine": [s for s, _ in merged],
                "rank": list(range(1, len(merged) + 1)),
            }
        )

    return scored.groupBy("qid").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "update", "NoTimeout"
    )
