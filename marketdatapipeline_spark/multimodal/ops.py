"""Binary media columns: decode, features, resize, frame sampling.

Design rules for 100 TB of media:

* content is ONE opaque ``binary`` column — never exploded into rows
  of pixels/samples; Spark shuffles and spills binary cheaply, and
  parquet stores it with page-level compression;
* per-item kernels run in ``mapInPandas`` so each Arrow batch moves
  once across the Python boundary; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  is *independent of dataset size*;
* metadata-only transforms (frame indexing, resize bookkeeping) stay
  in native expressions — no Python, no content bytes touched.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from marketdatapipeline_spark.sources.tables import load_table

#: media row: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),  # images/video
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),  # audio
        StructField("n_frames", IntegerType(), True),  # video
    ]
)

_MIMES = ("image/png", "audio/wav", "video/mp4")


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table over the driver's ``documents`` rows.

    The container ships no real media, so each document's UTF-8 bytes
    stand in as the payload; mime and metadata derive deterministically
    from ``doc_id``/``n_chars``. All expression-level (encode/CASE/
    modulo) — the synthesis itself is a native scan, no Python.
    """
    docs = load_table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_MIMES[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_MIMES[1]))
        .otherwise(F.lit(_MIMES[2]))
    )
    is_visual = F.col("mime") != _MIMES[1]
    return docs.select(
        "doc_id",
        mime.alias("mime"),
        F.encode("text", "UTF-8").cast("binary").alias("content"),
        F.col("n_chars"),
    ).select(
        "doc_id",
        "mime",
        "content",
        F.when(is_visual, (F.col("n_chars") % 640 + 16).cast("int")).alias("width"),
        F.when(is_visual, (F.col("n_chars") % 480 + 16).cast("int")).alias("height"),
        F.when(F.col("mime") == _MIMES[1], F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(F.col("mime") == _MIMES[2], (F.col("n_chars") % 30 + 1).cast("int")).alias(
            "n_frames"
        ),
    )


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("byte_mean", FloatType()),
        StructField("byte_entropy", FloatType()),
    ]
)


def decode_media(
    df: DataFrame, decoder: str = "fake", on_error: str = "raise"
) -> DataFrame:
    """Decode payloads to per-item stats via ``mapInPandas``.

    ``decoder="real"`` actually decodes the payload with the built-in
    codecs (multimodal/codecs.py): PNG → pixel array, WAV → PCM
    samples, and the emitted stats are computed over the DECODED bytes
    (so byte_len is the decoded size, not the container size). Video
    has no in-container demuxer — a video row under the real decoder
    follows ``on_error``: ``"raise"`` (default) or ``"null"`` (null
    stats for undecodable rows, the permissive corpus-scan mode).

    ``decoder="fake"`` computes deterministic byte-level stats
    (length, mean byte value, empirical byte entropy) over the raw
    payload with the exact batch plumbing the real path uses: numpy
    over each Arrow batch, output rows 1:1 with input rows. The fake
    path is the oracle target (catalog_multimodal.py).
    """
    if decoder == "real":
        return _decode_media_real(df, on_error)
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # One numpy pass per Arrow batch: concatenate payloads,
            # per-row byte histograms via offset bincount, then
            # vectorized mean/entropy — no per-row Python loop.
            contents = [c or b"" for c in pdf["content"]]
            n = len(contents)
            lens = np.fromiter((len(c) for c in contents), dtype=np.int64, count=n)
            if lens.sum():
                flat = np.frombuffer(b"".join(contents), dtype=np.uint8)
                row_id = np.repeat(np.arange(n), lens)
                counts = np.bincount(
                    row_id * 256 + flat.astype(np.int64), minlength=n * 256
                ).reshape(n, 256)
                safe_len = np.where(lens > 0, lens, 1)
                p = counts / safe_len[:, None]
                with np.errstate(divide="ignore", invalid="ignore"):
                    plogp = np.where(p > 0, p * np.log2(p, where=p > 0), 0.0)
                entropy = -plogp.sum(axis=1)
                mean = (counts * np.arange(256)).sum(axis=1) / safe_len
            else:
                entropy = np.zeros(n)
                mean = np.zeros(n)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "mime": pdf["mime"].to_numpy(),
                    "byte_len": lens,
                    "byte_mean": mean.astype(np.float32),
                    "byte_entropy": entropy.astype(np.float32),
                }
            )

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def _byte_stats(flat: np.ndarray) -> tuple[float, float]:
    """(mean, entropy) of a uint8 array — shared by the real decoder."""
    if flat.size == 0:
        return 0.0, 0.0
    counts = np.bincount(flat, minlength=256)
    p = counts / flat.size
    nz = p[p > 0]
    return float(flat.mean()), float(-(nz * np.log2(nz)).sum())


def _decode_media_real(df: DataFrame, on_error: str) -> DataFrame:
    """Real-codec decode: per-item PNG/WAV decode inside mapInPandas.

    Per-item Python is inherent here (each blob decodes independently);
    the Arrow batch boundary still amortizes the transfer, and the
    operator parallelizes across partitions exactly like the fake path.
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error: {on_error}")

    from marketdatapipeline_spark.multimodal.codecs import (
        decode_jpeg,
        decode_mjpeg_frames,
        decode_png,
        decode_wav,
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mime, content in zip(
                pdf["doc_id"], pdf["mime"], pdf["content"]
            ):
                try:
                    if mime == "image/png":
                        flat = decode_png(bytes(content or b"")).reshape(-1)
                    elif mime in ("image/jpeg", "image/jpg"):
                        flat = decode_jpeg(bytes(content or b"")).reshape(-1)
                    elif mime == "audio/wav":
                        pcm, _rate = decode_wav(bytes(content or b""))
                        flat = np.frombuffer(pcm.tobytes(), dtype=np.uint8)
                    elif mime == "video/mp4":
                        # r9: MJPEG tracks decode for real (mp4 sample
                        # table -> per-frame baseline JPEG); other
                        # codecs raise NotImplementedError below.
                        frames = decode_mjpeg_frames(bytes(content or b""))
                        flat = (
                            np.concatenate(
                                [f.reshape(-1) for _, f in frames]
                            )
                            if frames
                            else np.empty(0, dtype=np.uint8)
                        )
                    else:
                        raise NotImplementedError(
                            f"no in-container demuxer for {mime}"
                        )
                    mean, ent = _byte_stats(flat)
                    rows.append((doc_id, mime, len(flat), mean, ent))
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    rows.append((doc_id, mime, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "byte_len", "byte_mean", "byte_entropy"],
            )

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


def extract_media_features(
    df: DataFrame, dim: int = 16, include_histogram: bool = False
) -> DataFrame:
    """Fixed-size float feature vector per item (``array<float>``).

    Production slot for a vision/audio encoder (model inference over
    Arrow batches); the deterministic stand-in is an L2-normalized
    byte histogram folded to ``dim`` buckets — same signature, same
    schema (compatible with similarity.search), same batch shape.

    ``include_histogram=True`` additionally emits the raw integer
    histogram (``hist`` array<long>) — the exact pre-normalization
    counts, used by the oracle-checked catalog projection (integers
    hash identically across engines; the float vector is a pure
    function of them).

    The whole batch vectorizes as one numpy pass: concatenate the
    payload bytes, bincount on ``row_id * dim + byte % dim``, reshape
    to (rows, dim) — no per-row Python loop.
    """
    fields = [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
    if include_histogram:
        fields.append(StructField("hist", ArrayType(LongType())))
    out_schema = StructType(fields)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = [c or b"" for c in pdf["content"]]
            lens = np.fromiter((len(c) for c in contents), dtype=np.int64, count=len(contents))
            if lens.sum():
                flat = np.frombuffer(b"".join(contents), dtype=np.uint8)
                row_id = np.repeat(np.arange(len(contents)), lens)
                hists = np.bincount(
                    row_id * dim + flat % dim, minlength=len(contents) * dim
                ).reshape(len(contents), dim)
            else:
                hists = np.zeros((len(contents), dim), dtype=np.int64)
            norms = np.linalg.norm(hists.astype(np.float64), axis=1, keepdims=True)
            vecs = (hists / np.where(norms > 0, norms, 1.0)).astype(np.float32)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "mime": pdf["mime"].to_numpy(),
                    "feature": list(vecs),
                }
            )
            if include_histogram:
                out["hist"] = list(hists.astype(np.int64))
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: str = "fake",
    on_error: str = "raise",
) -> DataFrame:
    """Resize image rows; passthrough for non-images.

    ``decoder="real"`` runs the full decode → nearest-neighbor
    resample → re-encode round trip with the built-in PNG/JPEG codecs
    (multimodal/codecs.py) inside ``mapInPandas``, updating both the
    payload bytes and the metadata (JPEG rows re-encode as baseline
    JPEG, PNG rows as PNG — the format is preserved). Other
    ``image/*`` mimes and corrupt payloads follow ``on_error``:
    ``"raise"`` (default) or ``"skip"`` (leave the row untouched — the
    permissive corpus mode, mirroring decode_media's
    ``on_error="null"``). The fake path updates only the metadata
    columns and keeps the payload — the narrow no-shuffle bookkeeping
    mode the oracle checks.
    """
    is_img = F.col("mime").startswith("image/")
    if decoder == "real":
        if on_error not in ("raise", "skip"):
            raise ValueError(f"unknown on_error: {on_error}")
        from marketdatapipeline_spark.multimodal.codecs import (
            decode_jpeg,
            decode_png,
            encode_jpeg,
            encode_png,
            resize_nearest,
        )

        codecs = {
            "image/png": (decode_png, encode_png),
            "image/jpeg": (decode_jpeg, encode_jpeg),
            "image/jpg": (decode_jpeg, encode_jpeg),
        }
        schema = df.schema
        cols = [f.name for f in schema.fields]

        def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                pdf = pdf.copy()
                for i in pdf.index:
                    mime = str(pdf.at[i, "mime"])
                    if not mime.startswith("image/"):
                        continue
                    try:
                        if mime not in codecs:
                            raise ValueError(
                                f"no in-container codec for {mime}"
                            )
                        dec, enc = codecs[mime]
                        arr = dec(bytes(pdf.at[i, "content"] or b""))
                    except ValueError:
                        if on_error == "raise":
                            raise
                        continue  # skip: leave the row untouched
                    pdf.at[i, "content"] = enc(
                        resize_nearest(arr, width, height)
                    )
                    pdf.at[i, "width"] = width
                    pdf.at[i, "height"] = height
                yield pdf[cols]

        return df.mapInPandas(batches, schema=schema)
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder}")
    return df.withColumns(
        {
            "width": F.when(is_img, F.lit(width)).otherwise(F.col("width")).cast("int"),
            "height": F.when(is_img, F.lit(height)).otherwise(F.col("height")).cast("int"),
        }
    )


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Explode video rows into sampled frame rows (frame_idx 0, n, 2n…).

    Pure native expressions: ``sequence`` + ``explode`` — the 1:N row
    explosion happens JVM-side with no Python and no shuffle; frame
    payload decode would slot into a later ``mapInPandas`` stage.
    Non-video rows are dropped (they have no frames).
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    return (
        df.filter(F.col("n_frames").isNotNull())
        .select(
            "doc_id",
            "mime",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
            "n_frames",
        )
    )


# ---------------------------------------------------------------------------
# perceptual-hash image dedup (multimodal x dedup bridge)
# ---------------------------------------------------------------------------

DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def _dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash: grayscale -> 9x8 box-downsample ->
    horizontal gradient sign bits, row-major MSB-first. The standard
    near-duplicate-image fingerprint: stable under re-encoding,
    resizing, and mild quality loss; bit distance ~ visual change."""
    a = arr.astype(np.float64)
    gray = a.mean(axis=2) if a.ndim == 3 else a
    h, w = gray.shape
    # box downsample to 8 rows x 9 cols via bucketed means (exact,
    # no interpolation kernel to disagree about)
    ys = (np.arange(h) * 8) // h
    xs = (np.arange(w) * 9) // w
    sums = np.zeros((8, 9))
    cnts = np.zeros((8, 9))
    np.add.at(sums, (ys[:, None], xs[None, :]), gray)
    np.add.at(cnts, (ys[:, None], xs[None, :]), 1.0)
    small = sums / cnts
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # two's-complement into signed 64-bit so it stores as LongType
    return out - (1 << 64) if out >= (1 << 63) else out


def image_dhash(
    df: DataFrame, on_error: str = "raise"
) -> DataFrame:
    """(doc_id, dhash): 64-bit perceptual hash per ``image/*`` row,
    decoded with the real codecs (PNG/JPEG). Non-image rows are
    skipped; undecodable payloads follow ``on_error`` (``"raise"`` or
    ``"null"``). mapInPandas — one Arrow hop, per-item work, no
    shuffle."""
    from marketdatapipeline_spark.multimodal.codecs import decode_png
    from marketdatapipeline_spark.multimodal.jpeg import decode_jpeg

    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error: {on_error}")
    codecs = {
        "image/png": decode_png,
        "image/jpeg": decode_jpeg,
        "image/jpg": decode_jpeg,
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, mime, content in zip(
                pdf["doc_id"], pdf["mime"], pdf["content"]
            ):
                mime = str(mime)
                if mime not in codecs:
                    continue
                try:
                    arr = codecs[mime](bytes(content or b""))
                    rows.append((doc_id, _dhash64(arr)))
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append((doc_id, None))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash"])

    return df.mapInPandas(batches, schema=DHASH_SCHEMA)


def near_duplicate_images(
    hashes: DataFrame,
    max_distance: int = 6,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """(id_a, id_b, distance): image pairs whose dHashes differ in at
    most ``max_distance`` of 64 bits — re-encodes, recompressions,
    and mild edits of the same picture.

    Banded exactly like MinHash-LSH (textops/dedup.py): the 64-bit
    hash splits into four 16-bit bands; a pair within Hamming
    distance <= 6 must agree on at least one whole band whenever its
    differing bits fall into <= 3 bands (pigeonhole guarantees a
    clean band for distance <= 3; beyond that recall is high but not
    certain — the standard pHash-bucketing tradeoff, documented, not
    silent). Candidates come from a band-key equi-join (bigint keys,
    collisions ∝ real near-dups, never all-pairs) and verify with one
    ``bit_count(xor)`` — JVM-side, no Python."""
    if not 0 <= max_distance <= 64:
        raise ValueError("max_distance must be in [0, 64]")
    h = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).cast("long").alias("_h")
    ).filter(F.col("_h").isNotNull())
    bands = h.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    # band index tag (b << 16) keeps bands from
                    # colliding across positions
                    (
                        F.shiftrightunsigned(F.col("_h"), 16 * b).bitwiseAND(
                            F.lit(0xFFFF)
                        )
                        + F.lit(b << 16)
                    ).alias("x")
                    for b in range(4)
                ]
            )
        ).alias("_band"),
    )
    left = bands.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "_band"
    )
    right = bands.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "_band"
    )
    cand = (
        left.join(right, "_band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ha", "_hb")
        .distinct()
    )
    dist = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.withColumn("distance", dist.cast("int"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


MP4_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("major_brand", StringType()),
        StructField("duration_s", FloatType()),
        StructField("timescale", IntegerType()),
        StructField("n_tracks", IntegerType()),
        StructField("has_video", IntegerType()),  # 0/1
        StructField("has_audio", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def mp4_metadata(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """Container metadata per ``video/mp4`` row via the ISO BMFF box
    walker (multimodal/mp4.py): brand, duration, track kinds, video
    dimensions — the demux-boundary facts routing and frame-index
    planning need. (Pixel decode: MJPEG tracks decode for real via
    video_frame_stats / decode_media(fake=False) since r9; other
    codecs remain the documented NotImplementedError.) Non-MP4 mimes
    are skipped; corrupt payloads follow ``on_error`` (``"raise"`` /
    ``"null"``). mapInPandas, per-item work, no shuffle."""
    from marketdatapipeline_spark.multimodal.mp4 import parse_mp4_metadata

    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error: {on_error}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in MP4_META_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, mime, content in zip(
                pdf["doc_id"], pdf["mime"], pdf["content"]
            ):
                if str(mime) != "video/mp4":
                    continue
                try:
                    m = parse_mp4_metadata(bytes(content or b""))
                    rows.append(
                        (
                            doc_id,
                            m["major_brand"],
                            m["duration_s"],
                            m["timescale"],
                            m["n_tracks"],
                            int(m["has_video"]),
                            int(m["has_audio"]),
                            m["width"],
                            m["height"],
                        )
                    )
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema=MP4_META_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("pix_mean", DoubleType()),
        StructField("pix_std", DoubleType()),
    ]
)


def video_frame_stats(
    df: DataFrame, every_n: int = 1, max_frames: int | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """REAL per-frame pixel statistics for MJPEG-track MP4 rows (r9 —
    the closure of the video-decode NotImplementedError): the MP4
    sample table resolves each frame's byte range, the in-repo
    baseline-JPEG decoder reaches pixels, and each decoded frame
    emits (frame_idx, dims, pixel mean/std). ``every_n``/
    ``max_frames`` bound the per-item work the way a training
    pipeline samples frames. Non-MP4 mimes are skipped; corrupt
    payloads and non-MJPEG codecs (still the documented gap) follow
    ``on_error`` — ``"null"`` emits one all-null-stats row so the
    item stays visible to downstream audits.

    mapInPandas, per-item work by nature (each blob decodes
    independently), no shuffle; partition parallelism is the scale
    axis, exactly like decode_media."""
    from marketdatapipeline_spark.multimodal.codecs import (
        decode_mjpeg_frames,
    )

    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error: {on_error}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_FRAME_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, mime, content in zip(
                pdf["doc_id"], pdf["mime"], pdf["content"]
            ):
                if str(mime) != "video/mp4":
                    continue
                try:
                    frames = decode_mjpeg_frames(
                        bytes(content or b""),
                        every_n=every_n,
                        limit=max_frames,
                    )
                    n = len(frames)
                    for idx, arr in frames:
                        rows.append(
                            (
                                doc_id,
                                idx,
                                n,
                                int(arr.shape[1]),
                                int(arr.shape[0]),
                                int(arr.shape[2]),
                                float(arr.mean()),
                                float(arr.std()),
                            )
                        )
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
        StructField("spectral_rolloff_hz", DoubleType()),
    ]
)


def _audio_features_np(pcm: "np.ndarray", rate: int):
    """Classic DSP descriptors over mono float samples in [-1, 1]:
    RMS energy, zero-crossing rate (fraction of sign changes),
    spectral centroid and 85% rolloff from the rFFT magnitude
    spectrum. Deterministic numpy — the real feature extractor a
    model-based encoder would replace (extract_media_features)."""
    x = pcm.astype(np.float64)
    if x.ndim == 2:  # downmix channels
        x = x.mean(axis=1)
    x = x / 32768.0
    n = len(x)
    if n == 0:
        return None
    rms = float(np.sqrt((x * x).mean()))
    s = np.signbit(x)
    zcr = float((s[1:] != s[:-1]).mean()) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    tot = mag.sum()
    if tot > 0:
        centroid = float((freqs * mag).sum() / tot)
        cum = np.cumsum(mag)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
    else:
        centroid, rolloff = 0.0, 0.0
    return n, rms, zcr, centroid, rolloff


def audio_features(df: DataFrame, on_error: str = "raise") -> DataFrame:
    """Decode WAV rows and extract DSP features: (doc_id, n_samples,
    sample_rate, duration_sec, rms, zero_crossing_rate,
    spectral_centroid_hz, spectral_rolloff_hz).

    Non-audio rows are filtered OUT plan-side (the mime predicate
    prunes before any Python runs); per-item decode+rFFT is inherent
    per-blob work inside one mapInPandas (Arrow batches), the same
    envelope as the image path. ``on_error="null"`` counts decode
    failures as null-feature rows instead of failing the task."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"unknown on_error: {on_error}")

    from marketdatapipeline_spark.multimodal.codecs import decode_wav

    audio = df.filter(F.col("mime") == "audio/wav")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    pcm, rate = decode_wav(bytes(content or b""))
                    feats = _audio_features_np(pcm, rate)
                    if feats is None:
                        raise ValueError("empty audio payload")
                    n, rms, zcr, cen, roll = feats
                    rows.append(
                        (doc_id, n, rate, n / float(rate), rms, zcr, cen, roll)
                    )
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows.append(
                        (doc_id, None, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return audio.select("doc_id", "content").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )
