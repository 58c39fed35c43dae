"""Embedding quantization: per-vector symmetric int8.

The memory lever for ANN at scale — int8 vectors are 4x smaller than
float32, which is the difference between an in-memory inverted-list
index and a spilled one at 100 TB corpus scale. Quantization here is
the standard symmetric scheme (FAISS ``SQ8``-style): per vector,
``scale = max|x| / 127`` and ``q_i = round(x_i / scale)`` — no
clamping needed because ``|x_i / scale| <= 127`` by construction.

All JVM-side higher-order functions over the embedding array (no
Python); element-wise arithmetic with no cross-element association,
so the DuckDB oracle reproduces every value exactly (round-to-6 only
on the two derived doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["norm_audit", "quantize_embeddings_int8", "quantization_summary"]


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Add ``scale`` (double) and ``q`` (array<int> in [-127, 127])
    for each vector. All-zero vectors get scale 0 and an all-zero
    ``q`` (the guard matters: real corpora contain zero rows from
    failed encoders)."""
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scale = F.array_max(F.transform(xd, lambda v: F.abs(v))) / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(xd, lambda v: F.round(v / scale, 0).cast("int")),
    ).otherwise(F.transform(xd, lambda v: F.lit(0)))
    return df.withColumns({"scale": scale, "q": q})


def quantization_summary(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Scalar per-vector quantization audit: ``dim``, ``scale``,
    ``q_sum`` / ``q_l1`` (exact integer checksums of the quantized
    vector) and ``max_abs_err`` (worst reconstruction error,
    ``<= scale/2`` by construction — the bound a pytest asserts).

    Scalars rather than the raw ``q`` array so the result is
    hashable/sortable by any oracle harness; the integer checksums pin
    every quantized element (a single off-by-one in any position moves
    ``q_sum`` or ``q_l1``)."""
    with_q = quantize_embeddings_int8(df, vec_col=vec_col, id_col=id_col)
    xd = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    err = F.array_max(
        F.zip_with(
            F.col("q"), xd, lambda qi, vi: F.abs(qi * F.col("scale") - vi)
        )
    )
    return with_q.select(
        F.col(id_col),
        F.size(vec_col).cast("int").alias("dim"),
        F.col("scale"),
        F.aggregate(
            "q", F.lit(0), lambda acc, v: acc + v
        ).cast("int").alias("q_sum"),
        F.aggregate(
            "q", F.lit(0), lambda acc, v: acc + F.abs(v)
        ).cast("int").alias("q_l1"),
        err.alias("max_abs_err"),
    )


def norm_audit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z_threshold: float = 3.0,
) -> DataFrame:
    """(id, norm, z, is_outlier): L2-norm distribution audit — the
    standard embedding-table health check (collapsed vectors near
    zero norm, exploded ones far above the mode both poison cosine
    pipelines and usually indicate an encoder bug or a bad batch).

    Numerics matter here more than anywhere else in the catalog:
    normalized embeddings have norm 1 +- 1e-7, so the one-pass
    power-sum variance (s2 - s1^2/n) cancels catastrophically — the
    true variance (~1e-15) sits BELOW double resolution at the sums'
    magnitude and the result is pure rounding noise. The audit
    therefore runs TWO passes: exact decimal mean first, then the
    decimal sum of squared deviations (~1e-14 each, held in
    decimal(28,24) — full significance, and width 28 stays int128 in
    every engine). Norms fold sequentially in double (engine-exact);
    z and the |z| > threshold flag are scan-side."""
    from marketdatapipeline_spark.similarity.search import dot

    v = F.col(vec_col)
    base = df.filter(v.isNotNull()).select(
        F.col(id_col), F.sqrt(dot(v, v)).alias("norm")
    )
    m1 = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("norm").cast("decimal(28,14)"))
        .cast("double")
        .alias("_s1"),
    )
    with_mean = base.crossJoin(F.broadcast(m1)).withColumn(
        "_dev", F.col("norm") - F.col("_s1") / F.col("_n").cast("double")
    )
    m2 = with_mean.agg(
        F.sum((F.col("_dev") * F.col("_dev")).cast("decimal(28,16)"))
        .cast("double")
        .alias("_ss"),
        F.first("_n").alias("_n2"),
    )
    joined = with_mean.crossJoin(F.broadcast(m2))
    var = F.col("_ss") / F.col("_n2").cast("double")
    z = F.when(var > 0, F.col("_dev") / F.sqrt(var))
    return joined.select(
        id_col,
        "norm",
        z.alias("z"),
        (F.abs(z) > F.lit(float(z_threshold))).alias("is_outlier"),
    )
