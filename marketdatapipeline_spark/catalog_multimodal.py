"""Catalog entries for the multimodal binary-column operators.

The catalog targets the deterministic fake decode/feature kernels
(the oracle-comparable path; real PNG/WAV codecs exist in
multimodal/codecs.py and are pytest-pinned on genuinely encoded
payloads), so correctness checks split by what DuckDB can express:

* ``multimodal_decode_stats`` — byte-length channel of the decode is
  oracle-checked exactly (octet_length over the same UTF-8 payload);
* ``multimodal_frame_sample`` — the sequence/explode frame expansion
  is pure relational algebra, fully oracle-checked;
* ``multimodal_features`` — byte-histogram vectors; the integer
  histogram + L2 norm are oracle-checked exactly (documents are
  ASCII, so DuckDB can rebuild the per-byte histogram via
  unnest+ascii); the float vector is a pure function of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdatapipeline_spark.catalog import register, register_extended
from marketdatapipeline_spark.multimodal import (
    decode_media,
    extract_media_features,
    media_from_documents,
    sample_frames,
)

_MIME_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image/png' "
    "WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END"
)


@register(
    "multimodal_decode_stats",
    f"""
    SELECT doc_id,
           {_MIME_SQL} AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents
    """,
)
def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode over binary payloads; the oracle checks the
    SQL-expressible channel (exact byte length of every payload)."""
    media = media_from_documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return decode_media(media, decoder="fake").select("doc_id", "mime", "byte_len")


@register_extended(
    "multimodal_frame_sample",
    f"""
    SELECT doc_id,
           mime,
           CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx,
           CAST(n_frames AS BIGINT) AS n_frames
    FROM (
        SELECT doc_id, {_MIME_SQL} AS mime, n_chars % 30 + 1 AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2
    ) m
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video rows exploded to every-2nd-frame rows, JVM-side
    sequence+explode (no Python, no shuffle).

    r7: moved from the external gate to the extended catalog — the
    plan is a trivial filter + sequence/explode, the cheapest coverage
    in the gate; the freed slot went to the r6 market operators. Still
    cell-exact-checked every pytest run (tests/test_corpus_oracle.py)."""
    media = media_from_documents(spark, sf_dir)
    frames = sample_frames(media, every_n=2)
    return frames.select(
        "doc_id",
        "mime",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


@register(
    "multimodal_features",
    f"""
    WITH bytes AS (
        SELECT doc_id, ascii(c) % 16 AS bucket
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents) t
        WHERE c <> ''
    ),
    grid AS (
        SELECT d.doc_id, b.bucket
        FROM documents d, (SELECT unnest(range(16)) AS bucket) b
    ),
    counts AS (
        SELECT g.doc_id, g.bucket, count(bt.bucket) AS cnt
        FROM grid g
        LEFT JOIN bytes bt ON bt.doc_id = g.doc_id AND bt.bucket = g.bucket
        GROUP BY g.doc_id, g.bucket
    )
    SELECT doc_id,
           {_MIME_SQL} AS mime,
           string_agg(CAST(cnt AS VARCHAR), ',' ORDER BY bucket) AS hist_csv,
           round(sqrt(CAST(sum(cnt * cnt) AS DOUBLE)), 6) + 0.0 AS l2_norm
    FROM counts
    GROUP BY doc_id
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-dim feature vectors from binary payloads (model-inference
    slot). The checked projection is the *integer* byte-bucket
    histogram (CSV) plus its L2 norm: exact across engines, and the
    normalized float vector is a pure function of it (the driver's
    rows-only canonicalizer cannot sort array columns, so the library
    keeps ``feature`` while the catalog emits scalars). Documents are
    ASCII so DuckDB's per-character ``ascii()`` equals the UTF-8 byte."""
    media = media_from_documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    feats = extract_media_features(media, dim=16, include_histogram=True)
    return feats.select(
        "doc_id",
        "mime",
        F.concat_ws(",", F.transform("hist", lambda x: x.cast("string"))).alias("hist_csv"),
        (
            F.round(
                F.sqrt(
                    F.aggregate(
                        "hist", F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("l2_norm"),
    )
