"""Catalog entries for the multimodal binary-column operators.

The decode/feature kernels are deterministic fakes (real codecs absent
— see multimodal/ops.py), so correctness checks split by what DuckDB
can express:

* ``multimodal_decode_stats`` — byte-length channel of the decode is
  oracle-checked exactly (octet_length over the same UTF-8 payload);
* ``multimodal_frame_sample`` — the sequence/explode frame expansion
  is pure relational algebra, fully oracle-checked;
* ``multimodal_features`` — byte-histogram vectors; rows-only (no
  per-byte iteration in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdatapipeline_spark.catalog import register
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
    media = media_from_documents(spark, sf_dir).repartition(32, "doc_id")
    return decode_media(media, decoder="fake").select("doc_id", "mime", "byte_len")


@register(
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
    sequence+explode (no Python, no shuffle)."""
    media = media_from_documents(spark, sf_dir)
    frames = sample_frames(media, every_n=2)
    return frames.select(
        "doc_id",
        "mime",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


@register("multimodal_features", None)  # per-byte histogram: not SQL-expressible
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-dim feature vectors from binary payloads (model-inference
    slot); rows-only check — vector values pinned by pytest instead."""
    media = media_from_documents(spark, sf_dir).repartition(32, "doc_id")
    feats = extract_media_features(media, dim=16)
    return feats.select("doc_id", "mime", "feature")
