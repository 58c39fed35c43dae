"""Embedding similarity search over array<float> columns."""

from marketdatapipeline_spark.similarity.centroids import (
    centroid_similarity,
    label_centroids,
)
from marketdatapipeline_spark.similarity.index import IVFIndex, build_ivf_index
from marketdatapipeline_spark.similarity.quantize import (
    norm_audit,
    quantization_summary,
    quantize_embeddings_int8,
)
from marketdatapipeline_spark.similarity.mmr import mmr_rerank, mmr_topk
from marketdatapipeline_spark.similarity.semdedup import (
    assign_clusters,
    semantic_dedup,
)
from marketdatapipeline_spark.similarity.search import (
    add_vector_norm,
    cosine_pairs_above,
    cosine_topk,
    hyperplane_lsh_topk,
    ivf_topk,
)

__all__ = [
    "IVFIndex",
    "build_ivf_index",
    "add_vector_norm",
    "centroid_similarity",
    "label_centroids",
    "cosine_pairs_above",
    "cosine_topk",
    "hyperplane_lsh_topk",
    "mmr_rerank",
    "mmr_topk",
    "ivf_topk",
    "assign_clusters",
    "semantic_dedup",
    "norm_audit",
    "quantization_summary",
    "quantize_embeddings_int8",
]
