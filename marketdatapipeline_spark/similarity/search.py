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


def _exact_pair_rerank(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact sequential-fold cosine + threshold filter over a (small)
    candidate pair set. The fold is the oracle-comparable kernel, so
    whatever produced the candidates, the emitted values and the
    >= threshold decision are bit-exact."""
    a = add_vector_norm(df, vec_col).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), F.col("_norm").alias("_na")
    )
    b = add_vector_norm(df, vec_col).select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), F.col("_norm").alias("_nb")
    )
    return (
        F.broadcast(pairs)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _blocked_candidate_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    num_blocks: int,
    margin: float = 1e-6,
) -> DataFrame:
    """Exact all-pairs candidate generation as a blocked numpy matmul.

    Vectors are hashed into ``num_blocks`` blocks; every unordered
    block pair (i <= j) becomes one applyInPandas group holding block
    i as the "left" side and block j as the "right" side (replication
    factor = num_blocks, work per group = |i| x |j| BLAS multiply-adds
    — millions of pairs per second per core, vs a 64-step codegen fold
    per pair in the naive theta-join). Each unordered vector pair
    lands in exactly one group. Emits id pairs whose matmul cosine
    clears ``threshold - margin``; the margin (>> the ~1e-14 gap
    between pairwise-BLAS and sequential-fold summation) guarantees no
    true pair is lost, and the exact rerank re-decides the boundary.
    """
    import numpy as np
    import pandas as pd

    d = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("_b"),
    )
    left = d.select(
        "_id", "_v",
        F.col("_b").alias("bi"),
        F.explode(F.sequence(F.col("_b"), F.lit(num_blocks - 1))).alias("bj"),
        F.lit(0).alias("_side"),
    )
    right = d.select(
        "_id", "_v",
        F.explode(F.sequence(F.lit(0), F.col("_b"))).alias("bi"),
        F.col("_b").alias("bj"),
        F.lit(1).alias("_side"),
    )
    cut = threshold - margin

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        same_block = key[0] == key[1]
        if same_block:
            lf = rt = pdf[pdf["_side"] == 0]
        else:
            lf, rt = pdf[pdf["_side"] == 0], pdf[pdf["_side"] == 1]
        if lf.empty or rt.empty:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        va = np.stack(lf["_v"].to_numpy())
        vb = va if same_block else np.stack(rt["_v"].to_numpy())
        na = np.linalg.norm(va, axis=1)
        nb = na if same_block else np.linalg.norm(vb, axis=1)
        c = (va / np.where(na > 0, na, 1.0)[:, None]) @ (
            vb / np.where(nb > 0, nb, 1.0)[:, None]
        ).T
        ia, jb = np.nonzero(c >= cut)
        id_a = lf["_id"].to_numpy()[ia]
        id_b = rt["_id"].to_numpy()[jb]
        if same_block:  # both orders present: keep one canonically
            keep = id_a < id_b
            return pd.DataFrame({"id_a": id_a[keep], "id_b": id_b[keep]})
        return pd.DataFrame(  # each pair once, in arbitrary id order
            {"id_a": np.minimum(id_a, id_b), "id_b": np.maximum(id_a, id_b)}
        )

    # Each unordered vector pair lands in exactly one (bi, bj) group,
    # so the union of kernel outputs is already duplicate-free.
    return (
        left.unionByName(right)
        .groupBy("bi", "bj")
        .applyInPandas(kernel, schema="id_a long, id_b long")
    )


def cosine_pairs_above(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "blocked",
    num_blocks: int = 16,
    n_planes: int = 8,
    bands: int = 2,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """All vector pairs with cosine >= threshold (embedding near-dup),
    ``id_a < id_b``, exact fold-cosine values in every method.

    Methods:

    - ``"blocked"`` (default, exact): blocked numpy-matmul candidate
      generation + exact rerank. Still O(n^2) multiply-adds — that is
      what exact all-pairs means — but BLAS-batched and spread over
      num_blocks*(num_blocks+1)/2 independent tasks instead of a
      nested-loop join with a per-pair expression fold.
    - ``"lsh"`` (the 100 TB path, approximate recall): banded
      sign-random-projection candidates (equi-join on band keys, never
      a cross product) + exact rerank. Tune n_planes/bands to the
      threshold; recall is the LSH collision probability.
    - ``"fold"``: the naive theta-join; kept as the oracle-shaped
      definition and for tiny frames.

    Pass ``candidates`` (id_a, id_b) to skip generation and verify an
    externally-produced pair set (mirrors jaccard_similar_pairs).
    """
    if candidates is not None:
        return _exact_pair_rerank(df, candidates, threshold, id_col, vec_col)
    if method == "blocked":
        cands = _blocked_candidate_pairs(df, threshold, id_col, vec_col, num_blocks)
        return _exact_pair_rerank(df, cands, threshold, id_col, vec_col)
    if method == "lsh":
        dim = len(df.select(vec_col).first()[0])
        keys = df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array(*band_key_exprs(F.col(vec_col), n_planes, bands, dim))
            ).alias("band_key"),
        )
        cands = (
            keys.select(F.col("_id").alias("id_a"), "band_key")
            .join(keys.select(F.col("_id").alias("id_b"), "band_key"), "band_key")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        return _exact_pair_rerank(df, cands, threshold, id_col, vec_col)
    if method != "fold":
        raise ValueError(f"unknown method: {method}")
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


_U64 = (1 << 64) - 1


def _plane_coeff(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    splitmix64-style avalanche over (plane, dim), pure integer
    arithmetic, reproducible anywhere.

    A weak mixer is a correctness trap here: the round-1 version
    XORed two small products, leaving h << 2^61, so every coefficient
    collapsed to ~-1 and all "hyperplanes" were parallel (two buckets
    total). The finalizer below distributes bits uniformly."""
    x = (plane * 0x9E3779B97F4A7C15 + dim * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & _U64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _U64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _U64
    x ^= x >> 31
    return (x / 2.0**64) * 2.0 - 1.0


def band_key_exprs(vec: Column, n_planes: int, bands: int, dim: int) -> list[Column]:
    """One string key per band: ``"<band>_<sign bits>"`` where each bit
    is the sign of the projection on a deterministic hyperplane.

    Shared by the operator and its SQL oracle (which re-derives the
    same keys from the same coefficients as DuckDB literals)."""
    if bands < 1 or n_planes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide n_planes ({n_planes}) evenly")
    rows = n_planes // bands
    keys = []
    for b in range(bands):
        bits = []
        for p in range(b * rows, (b + 1) * rows):
            plane = F.array(*[F.lit(_plane_coeff(p, d)) for d in range(dim)])
            bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
        keys.append(F.concat(F.lit(f"{b}_"), *bits))
    return keys


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    bands: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: banded sign-random-projection bucketing +
    exact rerank of candidates.

    Each vector gets ``n_planes`` sign bits split into ``bands`` band
    keys (MinHash-LSH-style banding); a candidate is any corpus vector
    sharing *at least one* band key with the query — multi-band
    probing, so recall degrades gracefully instead of collapsing when
    a single bit flips. Candidates come from an equi-join on band_key
    (never a cross product), are deduplicated, then exactly reranked
    with a deterministic (cosine desc, corpus_id) order.

    At scale: the corpus is scanned twice (cheap columnar scans) —
    once to sketch (narrow, no shuffle), once to rerank the candidate
    join; queries are broadcast throughout. Recall tunes with
    ``n_planes``/``bands``: fewer bits per band = more candidates =
    higher recall, linearly more rerank work.
    """
    c = add_vector_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        F.array(*band_key_exprs(F.col(vec_col), n_planes, bands, dim)).alias("_keys"),
    )
    q = add_vector_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        F.array(*band_key_exprs(F.col(vec_col), n_planes, bands, dim)).alias("_keys"),
    )
    c_keys = c.select("corpus_id", F.explode("_keys").alias("band_key"))
    q_keys = q.select("query_id", F.explode("_keys").alias("band_key"))
    cands = (
        c_keys.join(F.broadcast(q_keys), "band_key")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
        .distinct()
    )
    scored = (
        cands.join(c.select("corpus_id", "_cv", "_cn"), "corpus_id")
        .join(F.broadcast(q.select("query_id", "_qv", "_qn")), "query_id")
        .select(
            "query_id",
            "corpus_id",
            (dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
