"""Multimodal (image/audio/video) columns as opaque binary + metadata.

No reference counterpart (the reference is OHLCV-only); this is the
training-data-pipeline extension: media travels as a ``binary`` column
with typed metadata, decode/feature/resize/frame-sample run as
Arrow-batched ``mapInPandas`` stages, and everything metadata-level
stays in native Spark expressions.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode kernels are **stubbed behind
``decoder="real"`` → NotImplementedError**, with a deterministic fake
decoder (byte-level stats) keeping the Spark-side plumbing — schemas,
batch shapes, partitioning — real and testable end-to-end.
"""

from marketdatapipeline_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    decode_media,
    extract_media_features,
    media_from_documents,
    resize_images,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_from_documents",
    "decode_media",
    "extract_media_features",
    "resize_images",
    "sample_frames",
]
