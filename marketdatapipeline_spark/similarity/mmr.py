"""Maximal marginal relevance — diversity-aware re-ranking.

Plain top-k returns near-duplicates of each other when the corpus is
redundant; MMR (Carbonell & Goldstein 1998) greedily selects the
item maximizing ``lam * sim(q, d) - (1 - lam) * max_{s in S}
sim(d, s)`` — relevance minus redundancy against what is already
picked — the standard re-rank for RAG context packing and diverse
retrieval.

The greedy loop is inherently sequential IN k, but k is small by
contract (a context window's worth); the Spark shape is:

1. pull an over-fetched candidate pool per query with the existing
   exact/ANN top-k operators (fully distributed — this stage touches
   the whole corpus);
2. join the candidate vectors back (bigint equi-join) and group per
   query: each query's O(pool) candidates land in ONE task, and the
   O(pool * k) greedy selection runs numpy-side inside
   ``applyInPandas`` — queries parallelize across the cluster, and
   no task ever sees more than ``pool_k`` vectors.

This mirrors how IVF probes or rerankers bound per-task work; the
driver never loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from marketdatapipeline_spark.similarity.search import cosine_topk

__all__ = ["mmr_rerank", "mmr_topk"]


def _mmr_select(qsim: np.ndarray, cmat: np.ndarray, k: int, lam: float):
    """Greedy MMR over one query's candidate pool. Returns selected
    indices (in selection order) and their marginal scores."""
    n = len(qsim)
    k = min(k, n)
    norm = np.sqrt((cmat * cmat).sum(axis=1))
    picked: list[int] = []
    scores: list[float] = []
    max_red = np.full(n, -np.inf)
    for step in range(k):
        if step == 0:
            marg = lam * qsim
        else:
            prev = cmat[picked[-1]]
            red = (cmat @ prev) / (norm * norm[picked[-1]])
            max_red = np.maximum(max_red, red)
            marg = lam * qsim - (1.0 - lam) * max_red
        marg[picked] = -np.inf
        i = int(np.argmax(marg))
        picked.append(i)
        scores.append(float(marg[i]))
    return picked, scores


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Re-rank a (query_id, corpus_id, cosine) candidate table down
    to k diverse picks per query: (query_id, corpus_id, cosine,
    mmr_score, mmr_rank). Candidate vectors join back from
    ``corpus`` on the id (bigint equi-join), then one
    groupBy(query_id).applyInPandas runs the greedy selection."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    vecs = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    joined = candidates.join(vecs, "corpus_id")
    schema = StructType(
        [
            joined.schema["query_id"],
            joined.schema["corpus_id"],
            StructField("cosine", DoubleType()),
            StructField("mmr_score", DoubleType()),
            StructField("mmr_rank", IntegerType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic pool order regardless of shuffle arrival
        pdf = pdf.sort_values(
            ["cosine", "corpus_id"], ascending=[False, True]
        ).reset_index(drop=True)
        cmat = np.stack(pdf["_v"].to_numpy()).astype(np.float64, copy=False)
        picked, scores = _mmr_select(
            pdf["cosine"].to_numpy(dtype=np.float64), cmat, k, lam
        )
        sel = pdf.iloc[picked]
        return pd.DataFrame(
            {
                "query_id": sel["query_id"].to_numpy(),
                "corpus_id": sel["corpus_id"].to_numpy(),
                "cosine": sel["cosine"].to_numpy(),
                "mmr_score": scores,
                "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    return joined.groupBy("query_id").applyInPandas(run, schema=schema)


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lam: float = 0.5,
    pool_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end diverse top-k: exact cosine over-fetch
    (``pool_k``, default 4k) then MMR re-rank."""
    pool = pool_k if pool_k is not None else 4 * k
    if pool < k:
        raise ValueError(f"pool_k must be >= k, got {pool} < {k}")
    cands = cosine_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    return mmr_rerank(
        cands.drop("rank"), corpus, k=k, lam=lam, id_col=id_col, vec_col=vec_col
    )
