"""SemDeDup — semantic near-duplicate removal via cluster-bucketed
cosine comparison (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication").

The web-scale trick: never compare all pairs. Vectors are first
routed to a small set of cluster prototypes (here the per-label
centroids of :mod:`similarity.centroids`; any k-means seed table
works — the operator takes the centroid DataFrame, not a policy);
pairwise cosine runs ONLY inside each cluster. Cost is
``sum(|cluster|^2)`` instead of ``n^2`` — the same envelope as the
paper's k-means buckets, and exactly how MinHash-LSH bounds the
lexical dedup family (textops/dedup.py).

Plan shape: the assignment broadcasts the centroid table as ONE row
(an array of k (cluster, vector) structs — tiny by construction) and
argmaxes scan-side, so the vector side is never shuffled; the
in-cluster pair generation is ONE equi-join on the cluster id.
A pathologically hot cluster shows up as join skew — the documented
mitigation is the salting toolkit (operators/salting.py) or a finer
seed table, both upstream of this operator.

Determinism: cosines fold sequentially in double
(:func:`similarity.search.dot`) — bit-identical to DuckDB's
``list_dot_product`` — so threshold comparisons and argmax picks are
engine-exact (argmax ties break toward the larger label, pinned in
both formulations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdatapipeline_spark.similarity.search import dot

__all__ = ["assign_clusters", "semantic_dedup"]


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_col: str = "centroid",
) -> DataFrame:
    """(id, cluster, best_cos): route each vector to its
    highest-cosine centroid (ties -> larger cluster id).

    The centroid table collapses to ONE broadcast row holding an
    array of (cluster, vector) structs; the argmax is then a
    scan-side array reduction (``array_max`` over (cos, cluster)
    structs — lexicographic struct ordering IS the tie rule). The
    vector side is never shuffled, grouped, or joined on a key:
    assignment costs one narrow projection."""
    one = F.broadcast(
        centroids.agg(
            F.collect_list(
                F.struct(
                    F.col(label_col).alias("lab"),
                    F.col(centroid_col).cast("array<double>").alias("cv"),
                )
            ).alias("_cents")
        )
    )
    v = F.col(vec_col)
    vnorm = F.sqrt(dot(v, v))

    def scored(s):
        cv = s["cv"]
        cos = dot(v, cv) / (vnorm * F.sqrt(dot(cv, cv)))
        return F.struct(cos.alias("cos"), s["lab"].alias("cluster"))

    best = F.array_max(F.transform(F.col("_cents"), scored))
    return vectors.crossJoin(one).select(
        F.col(id_col),
        best["cluster"].alias("cluster"),
        best["cos"].alias("best_cos"),
        F.col(vec_col),
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_col: str = "centroid",
) -> DataFrame:
    """Per-vector SemDeDup verdicts: (id, cluster, best_cos,
    is_duplicate, dup_of).

    A vector is a duplicate iff some SAME-CLUSTER vector with a
    smaller id has cosine >= ``threshold`` with it; ``dup_of`` is the
    smallest such id (keep-min-id — the same canonical-survivor
    convention as the exact/MinHash dedup family, so downstream
    anti-joins compose across all dedup operators)."""
    assigned = assign_clusters(
        vectors, centroids, id_col, vec_col, label_col, centroid_col
    )
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
    )
    va, vb = F.col("_va"), F.col("_vb")
    cos = dot(va, vb) / (F.sqrt(dot(va, va)) * F.sqrt(dot(vb, vb)))
    dups = (
        a.join(b, on="cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= F.lit(float(threshold)))
        .groupBy(F.col("_idb").alias(id_col))
        .agg(F.min("_ida").alias("dup_of"))
    )
    out = assigned.drop(vec_col).join(dups, on=id_col, how="left")
    return out.select(
        id_col,
        "cluster",
        "best_cos",
        F.col("dup_of").isNotNull().alias("is_duplicate"),
        "dup_of",
    )
