"""Persisted IVF index: the ANN index AS a partitioned table layout.

:func:`ivf_topk` rebuilds its inverted lists on every query — right
for ad-hoc search, wasteful for a corpus queried repeatedly. At scale
the index IS storage layout: vectors written to parquet partitioned by
their nearest-centroid id, so a query probing ``nprobe`` centroids
touches exactly ``nprobe`` directories and Spark's partition pruning
(visible as ``PartitionFilters`` on the scan) skips everything else —
the IVF "read only the probed lists" property expressed in the format
layer instead of an in-memory inverted file.

Centroids are the same deterministic corpus sample ``ivf_topk`` uses
(id % mod == rem, swap in k-means in production — only the build
changes), assignment uses the same argmax-cosine / smallest-id
tie-break, and the query path reranks candidates with the same
sequential-fold cosine — so ``IVFIndex.topk`` is value-identical to
``ivf_topk`` for the same parameters (pinned by pytest).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marketdatapipeline_spark.similarity.search import (
    _pair_dot_col,
    _query_matrix,
    _seq_dot_np,
)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroid_mod: int = 97,
    centroid_rem: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "IVFIndex":
    """Assign every vector to its nearest centroid and persist the
    corpus partitioned by centroid id (plus the centroid table and a
    JSON manifest). One corpus pass; the shuffle-free write puts each
    task's rows into its partitions directly."""
    cents = corpus.filter((F.col(id_col) % centroid_mod) == centroid_rem)
    cent_ids, cent_mat, cent_norm = _query_matrix(
        cents.orderBy(id_col), id_col, vec_col
    )
    if len(cent_ids) == 0:
        raise ValueError(
            f"no centroids: no {id_col} satisfies % {centroid_mod} == {centroid_rem}"
        )

    idt = corpus.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, idt),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
            T.StructField("_cent", T.LongType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64, copy=False)
            norms = np.sqrt(_seq_dot_np(mat, mat))
            acc = np.zeros((len(pdf), len(cent_ids)), dtype=np.float64)
            for d in range(mat.shape[1]):
                acc = acc + mat[:, d : d + 1] * cent_mat[:, d]
            cos = acc / (norms[:, None] * cent_norm[None, :])
            # argmax keeps the FIRST maximum; cent rows are id-sorted,
            # so ties break to the smallest centroid id (ivf_topk's rule)
            assigned = np.asarray(cent_ids)[np.argmax(cos, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"].to_numpy(),
                    vec_col: list(mat),
                    "_cent": assigned.astype(np.int64),
                }
            )

    assigned = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).mapInPandas(assign, schema=out_schema)
    assigned.write.mode("overwrite").partitionBy("_cent").parquet(
        os.path.join(path, "lists")
    )
    cents.select(id_col, F.col(vec_col).cast("array<double>").alias(vec_col)).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "centroids"))
    manifest = {
        "id_col": id_col,
        "vec_col": vec_col,
        "centroid_mod": centroid_mod,
        "centroid_rem": centroid_rem,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return IVFIndex(path=path, **manifest)


@dataclass
class IVFIndex:
    path: str
    id_col: str
    vec_col: str
    centroid_mod: int
    centroid_rem: int

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            return cls(path=path, **json.load(f))

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
    ) -> DataFrame:
        """Approximate top-k against the persisted lists.

        The probe set is tiny by contract: nearest centroids per query
        are computed driver-side from the centroid table, then the
        lists scan filters ``_cent`` to the probed ids — a partition-
        column filter, so only those directories are read. Candidates
        join to their probing queries on ``_cent`` (broadcast) and the
        exact sequential-fold cosine reranks, same tie-break as
        ivf_topk (rank by cosine desc, then corpus id)."""
        cent_ids, cent_mat, cent_norm = _query_matrix(
            spark.read.parquet(os.path.join(self.path, "centroids")).orderBy(
                self.id_col
            ),
            self.id_col,
            self.vec_col,
        )
        ids, qmat, qn = _query_matrix(queries, self.id_col, self.vec_col)
        probes = []  # (query pos, centroid id)
        if len(ids):
            acc = np.zeros((len(ids), len(cent_ids)), dtype=np.float64)
            for d in range(qmat.shape[1]):
                acc = acc + qmat[:, d : d + 1] * cent_mat[:, d]
            qcos = acc / (qn[:, None] * cent_norm[None, :])
            for qi in range(len(ids)):
                order = sorted(
                    range(len(cent_ids)),
                    key=lambda ci: (-qcos[qi, ci], cent_ids[ci]),
                )[:nprobe]
                probes.extend((qi, int(cent_ids[ci])) for ci in order)

        qrows = queries.sparkSession.createDataFrame(
            [
                (ids[qi].item() if hasattr(ids[qi], "item") else ids[qi], cent, list(map(float, qmat[qi])))
                for qi, cent in probes
            ],
            schema=T.StructType(
                [
                    T.StructField("query_id", queries.schema[self.id_col].dataType),
                    T.StructField("_cent", T.LongType()),
                    T.StructField("_qv", T.ArrayType(T.DoubleType())),
                ]
            ),
        )
        lists = spark.read.parquet(os.path.join(self.path, "lists")).filter(
            F.col("_cent").isin([c for _, c in probes] or [-1])
        )
        v = F.col(self.vec_col)
        cand = lists.join(F.broadcast(qrows), "_cent").filter(
            F.col(self.id_col) != F.col("query_id")
        )
        cos = _pair_dot_col(v, F.col("_qv")) / (
            F.sqrt(_pair_dot_col(v, v)) * F.sqrt(_pair_dot_col(F.col("_qv"), F.col("_qv")))
        )
        scored = cand.select(
            "query_id",
            F.col(self.id_col).alias("corpus_id"),
            cos.alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.col("corpus_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "cosine", "rank")
        )
