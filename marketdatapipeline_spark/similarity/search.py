"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the
query set against the corpus, dot products via ``zip_with`` +
``aggregate`` (JVM-side higher-order functions, no Python), and a
per-query ``row_number`` cut. Cost: |queries| x |corpus| multiply-adds
— the right answer when queries are few or the corpus fits a scan.

The scale path is sign-random-projection LSH: each vector's sketch is
the sign pattern of dot products with deterministic hyperplanes
(hashed-coefficient planes, reproducible across engines and runs).
Vectors are bucketed by sketch prefix; candidates come from an
equi-join on bucket keys, the exact cosine reranks only candidates.
Recall tunes with planes/bands like any LSH.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marketdatapipeline_spark.textops.dedup import MERSENNE_P


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision.

    Inputs are cast to array<double> BEFORE multiplying: float-float
    products rounded to float lose ~1e-7 relative per term, and the
    double-product fold is bit-identical to DuckDB's
    list_dot_product over DOUBLE[] — so cosine values are
    oracle-comparable without tolerance."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def add_vector_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.col(vec_col)
    return df.withColumn("_norm", F.sqrt(dot(v, v)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours per query vector.

    ``queries`` is broadcast (the common shape: a small probe set vs a
    huge corpus); per-query ranking is a window cut with a
    deterministic (similarity desc, id) order.
    """
    c = add_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    q = add_vector_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    scored = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id")).select(
        "query_id",
        "corpus_id",
        (dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vector pairs with cosine >= threshold (embedding near-dup).

    Exact all-pairs — quadratic, for modest corpora or LSH-bucketed
    candidate verification. The i<j filter halves the work and makes
    output deterministic."""
    a = add_vector_norm(df, vec_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    b = add_vector_norm(df, vec_col).select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _plane_coeff(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    pure integer arithmetic, reproducible anywhere."""
    h = ((plane * 73_856_093) ^ (dim * 19_349_663)) % MERSENNE_P
    return (h / MERSENNE_P) * 2.0 - 1.0


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: sign-random-projection bucketing + exact
    rerank of same-bucket candidates.

    Each vector gets a ``n_planes``-bit sketch (sign of projection on
    deterministic hyperplanes); candidates share the full sketch
    bucket. One equi-join instead of a cross product — the 100 TB
    shape. Recall is tuned by lowering n_planes or probing multiple
    bands; this single-bucket variant is the building block.
    """

    def sketch(vec: Column) -> Column:
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(_plane_coeff(p, d)) for d in range(dim)])
            bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    c = add_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        sketch(F.col(vec_col)).alias("bucket"),
    )
    q = add_vector_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        sketch(F.col(vec_col)).alias("bucket"),
    )
    scored = c.join(q, on="bucket").filter(
        F.col("corpus_id") != F.col("query_id")
    ).select(
        "query_id",
        "corpus_id",
        (dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
