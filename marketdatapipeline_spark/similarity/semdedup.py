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
    # centroid norms computed ONCE per centroid inside the broadcast
    # struct and the vector norm staged as a column (r10): inlined,
    # sqrt(dot(v, v)) re-evaluated per CENTROID element and
    # sqrt(dot(cv, cv)) per vector x centroid — k x 2 extra O(d)
    # reductions per row. Same operations, same order, so cosines are
    # bit-identical.
    cv_cast = F.col(centroid_col).cast("array<double>")
    one = F.broadcast(
        centroids.select(
            F.col(label_col).alias("lab"),
            cv_cast.alias("cv"),
            F.sqrt(dot(cv_cast, cv_cast)).alias("cn"),
        ).agg(
            F.collect_list(
                F.struct(F.col("lab"), F.col("cv"), F.col("cn"))
            ).alias("_cents")
        )
    )
    v = F.col(vec_col)
    staged = vectors.crossJoin(one).select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(dot(v, v)).alias("_vn"),
        F.col("_cents"),
    )

    def scored(s):
        cos = dot(v, s["cv"]) / (F.col("_vn") * s["cn"])
        return F.struct(cos.alias("cos"), s["lab"].alias("cluster"))

    best = F.array_max(F.transform(F.col("_cents"), scored))
    return staged.select(
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
    from marketdatapipeline_spark.caching import scoped_persist

    # persisted (r10): `assigned` anchors both pair-join sides AND the
    # final output — un-cached, the centroid-argmax assignment ran
    # three times. Per-vector norms are staged per SIDE so the pair
    # filter computes one O(d) dot instead of three; the sqrt-then-
    # multiply order matches the old inline expression, so cosines
    # are bit-identical.
    assigned = scoped_persist(
        assign_clusters(
            vectors, centroids, id_col, vec_col, label_col, centroid_col
        )
    )
    vv = F.col(vec_col)
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        F.sqrt(dot(vv, vv)).alias("_na"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        F.sqrt(dot(vv, vv)).alias("_nb"),
    )
    va, vb = F.col("_va"), F.col("_vb")
    cos = dot(va, vb) / (F.col("_na") * F.col("_nb"))
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
