"""Multimodal (image/audio/video) columns as opaque binary + metadata.

No reference counterpart (the reference is OHLCV-only); this is the
training-data-pipeline extension: media travels as a ``binary`` column
with typed metadata, decode/feature/resize/frame-sample run as
Arrow-batched ``mapInPandas`` stages, and everything metadata-level
stays in native Spark expressions.

``decoder="real"`` is REAL for PNG, JPEG and WAV via the
zero-dependency built-in codecs (codecs.py: chunk/zlib/filter PNG
decode + encode; jpeg.py: baseline T.81 Huffman/DCT decode + 4:4:4
encode; stdlib-wave PCM) — decode, stats-over-decoded-bytes, and the
full decode→resample→re-encode resize round-trip all run inside
mapInPandas. Video container METADATA (brand/duration/tracks/
dimensions) parses via the ISO BMFF box walker (mp4.py), and since
r9 MJPEG-track PIXELS decode for real too: the sample table
(parse_mp4_samples) resolves each frame's byte range and the in-repo
baseline-JPEG decoder takes it from there (decode_mjpeg_frames,
video_frame_stats). Non-MJPEG video codecs (H.264 etc.) remain the
one documented NotImplementedError. The deterministic fake decoder
(byte-level stats over the raw payload) remains the default and the
oracle target, keeping schemas, batch shapes, and partitioning
checkable end-to-end.
"""

from marketdatapipeline_spark.multimodal.mp4 import (
    make_minimal_mp4,
    make_mjpeg_mp4,
    parse_mp4_metadata,
    parse_mp4_samples,
)
from marketdatapipeline_spark.multimodal.codecs import (
    decode_jpeg,
    decode_mjpeg_frames,
    decode_png,
    decode_wav,
    encode_jpeg,
    encode_png,
    encode_wav,
    resize_nearest,
)
from marketdatapipeline_spark.multimodal.ops import (
    MEDIA_SCHEMA,
    decode_media,
    extract_media_features,
    audio_features,
    image_dhash,
    media_from_documents,
    mp4_metadata,
    near_duplicate_images,
    resize_images,
    sample_frames,
    video_frame_stats,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_from_documents",
    "decode_media",
    "extract_media_features",
    "audio_features",
    "image_dhash",
    "mp4_metadata",
    "near_duplicate_images",
    "resize_images",
    "sample_frames",
    "decode_png",
    "encode_png",
    "decode_jpeg",
    "encode_jpeg",
    "decode_wav",
    "encode_wav",
    "resize_nearest",
    "make_minimal_mp4",
    "make_mjpeg_mp4",
    "parse_mp4_metadata",
    "parse_mp4_samples",
    "decode_mjpeg_frames",
    "video_frame_stats",
]
