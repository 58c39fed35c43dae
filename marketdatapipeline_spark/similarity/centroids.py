"""Per-label embedding centroids and inter-class similarity — the
class-prototype audit a labeled embedding corpus needs: nearest-class-
mean classifiers, cluster-quality checks (are two labels' prototypes
suspiciously close?), and seed vectors for coarse quantizers.

Plan shape: ``posexplode`` widens each vector into (label, pos, val)
rows — 64 narrow rows per vector, map-side combinable straight back
down to labels x dim aggregate rows — so the centroid computation is
one explode + one hash aggregation, no driver collect, no matrix on
any single node. Element sums accumulate as ``decimal(38,18)`` of the
double-widened floats (association-free: any engine, any partial-agg
order, same bits); the mean double then divides by an integer count,
so the values are reported UNROUNDED — the exact decimal sums make
them bit-identical cross-engine, and round-6 would only add
integer-denominator tie divergence (the TWAP lesson,
catalog_corpus.py).

The pairwise centroid cosine is a crossJoin of S centroid rows —
S(S-1)/2 pairs of LABELS, not vectors; labels are small by definition
(a label space that rivals the corpus size is an id, not a label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from marketdatapipeline_spark.similarity.search import dot

__all__ = ["centroid_similarity", "label_centroids"]

_DEC = "decimal(38,18)"


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(label, n_vecs, centroid): element-wise mean vector per label
    as ``array<double>``, positions restored in order."""
    ex = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("_pos", "_v"),
    )
    per = ex.groupBy(label_col, "_pos").agg(
        F.count("_v").alias("_n"),
        (
            F.sum(F.col("_v").cast("double").cast(_DEC)).cast("double")
            / F.count("_v")
        ).alias("_mean"),
    )
    return per.groupBy(label_col).agg(
        F.max("_n").cast("long").alias("n_vecs"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_mean"))),
            lambda s: s["_mean"],
        ).alias("centroid"),
    )


def centroid_similarity(
    centroids: DataFrame, label_col: str = "label"
) -> DataFrame:
    """(label_a, label_b, cosine) for every unordered label pair —
    the inter-class-separation audit over :func:`label_centroids`
    output. Cosine folds sequentially (similarity.search.dot), the
    same left fold DuckDB's list_dot_product applies, so values are
    engine-exact given identical centroids."""
    a = centroids.select(
        F.col(label_col).alias("label_a"), F.col("centroid").alias("_ca")
    )
    b = centroids.select(
        F.col(label_col).alias("label_b"), F.col("centroid").alias("_cb")
    )
    ca, cb = F.col("_ca"), F.col("_cb")
    cos = dot(ca, cb) / (F.sqrt(dot(ca, ca)) * F.sqrt(dot(cb, cb)))
    return (
        a.crossJoin(b)
        .filter(F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", cos.alias("cosine"))
    )
