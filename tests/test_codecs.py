"""Built-in real media codecs (multimodal/codecs.py): PNG chunk/zlib/
filter decoding, WAV PCM, nearest-neighbor resize, and the Spark-side
real-decoder paths over genuinely encoded payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from marketdatapipeline_spark.multimodal.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
)


def _image(h, w, ch, seed=0):
    # deterministic pseudo-random pixels without RNG state
    idx = np.arange(h * w * ch, dtype=np.int64) + seed
    return ((idx * 2654435761) % 251).astype(np.uint8).reshape(h, w, ch)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_channel_counts(ch):
    img = _image(13, 7, ch, seed=ch)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_grayscale_2d_input():
    img = _image(5, 9, 1)[:, :, 0]
    out = decode_png(encode_png(img))
    assert out.shape == (5, 9, 1)
    assert np.array_equal(out[:, :, 0], img)


def _png_with_filters(img, filters):
    """Hand-build a PNG whose row n uses filter filters[n] — exercises
    decoder paths our filter-0 encoder never emits. Filtering follows
    RFC 2083 §6: output[x] = raw[x] - pred(x) mod 256."""
    h, w, ch = img.shape
    stride = w * ch
    raw = img.reshape(h, stride).astype(np.int64)
    lines = []
    for y in range(h):
        f = filters[y]
        cur = raw[y]
        prior = raw[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        enc = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_decoder_handles_every_filter_type(f):
    img = _image(6, 5, 3, seed=f)
    data = _png_with_filters(img, [f] * 6)
    assert np.array_equal(decode_png(data), img)


def test_png_decoder_handles_mixed_filters():
    img = _image(10, 4, 4, seed=99)
    data = _png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert np.array_equal(decode_png(data), img)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"hello world, definitely not a png")
    # 16-bit depth is unsupported
    img = _image(4, 4, 3)
    data = bytearray(encode_png(img))
    # IHDR depth byte sits at offset 8(sig)+8(len/type)+8(w+h) = 24
    data[24] = 16
    # fix the CRC so chunk parsing succeeds and depth check triggers
    ihdr_payload = bytes(data[16:29])
    data[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_payload) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="depth"):
        decode_png(bytes(data))


def test_wav_roundtrip_mono_and_stereo():
    t = np.arange(800)
    mono = (np.sin(t * 0.05) * 12000).astype(np.int16)
    pcm, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and pcm.shape == (800, 1)
    assert np.array_equal(pcm[:, 0], mono)

    stereo = np.stack([mono, (mono // 2)], axis=1)
    pcm2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and pcm2.shape == (800, 2)
    assert np.array_equal(pcm2, stereo)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFFbroken")


def test_resize_nearest_exact_upscale():
    img = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
    out = resize_nearest(img, 4, 4)
    assert out.shape == (4, 4, 1)
    # 2x nearest-neighbor: each source pixel becomes a 2x2 block
    assert np.array_equal(out[:2, :2, 0], np.full((2, 2), 0))
    assert np.array_equal(out[2:, 2:, 0], np.full((2, 2), 30))


def test_spark_real_decode_and_resize(spark):
    """End-to-end: genuinely encoded PNG/WAV payloads through the
    real decoder and the real resize path inside mapInPandas."""
    from marketdatapipeline_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        decode_media,
        resize_images,
    )

    img = _image(8, 6, 3, seed=7)
    png = encode_png(img)
    wavb = encode_wav((np.arange(400) % 1000).astype(np.int16), 16000)
    rows = [
        (1, "image/png", bytearray(png), 6, 8, None, None),
        (2, "audio/wav", bytearray(wavb), None, None, 16000, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    got = decode_media(media, decoder="real").toPandas().set_index("doc_id")
    assert got.loc[1, "byte_len"] == 8 * 6 * 3  # decoded pixel count
    assert got.loc[2, "byte_len"] == 400 * 2  # int16 samples as bytes
    flat = img.reshape(-1)
    assert abs(got.loc[1, "byte_mean"] - flat.mean()) < 1e-4

    resized = (
        resize_images(media, 3, 4, decoder="real").toPandas().set_index("doc_id")
    )
    assert resized.loc[1, "width"] == 3 and resized.loc[1, "height"] == 4
    out_img = decode_png(bytes(resized.loc[1, "content"]))
    assert out_img.shape == (4, 3, 3)
    assert np.array_equal(out_img, resize_nearest(img, 3, 4))
    # audio row untouched
    assert bytes(resized.loc[2, "content"]) == wavb


def test_fake_decode_still_default(spark):
    """The oracle-checked fake path is unchanged by the real codecs."""
    from marketdatapipeline_spark.multimodal.ops import decode_media
    from marketdatapipeline_spark.multimodal import media_from_documents

    media = media_from_documents(spark, "/root/testdata/sf0.001").limit(10)
    pdf = decode_media(media).toPandas()
    assert pdf["byte_len"].notna().all()
    assert len(pdf) == 10


def test_decoders_normalize_all_parse_failures_to_valueerror():
    """Corrupt payloads raise EOFError/zlib.error/struct.error inside
    the stdlib; the decoder boundary must normalize every one to
    ValueError or on_error='null' cannot keep its promise."""
    # empty WAV: stdlib wave raises EOFError
    with pytest.raises(ValueError):
        decode_wav(b"")
    # truncated RIFF header: struct.error territory
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
    # valid PNG header, corrupt IDAT: zlib.error territory
    img = _image(4, 4, 3)
    data = bytearray(encode_png(img))
    # find IDAT and flip bytes inside its payload
    i = bytes(data).index(b"IDAT")
    data[i + 6] ^= 0xFF
    data[i + 8] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_permissive_decode_survives_corrupt_payloads(spark):
    """on_error='null' over empty and corrupt payloads of every mime:
    the job must finish with null stats, not crash."""
    from marketdatapipeline_spark.multimodal.ops import MEDIA_SCHEMA, decode_media

    rows = [
        (1, "audio/wav", bytearray(b""), None, None, 16000, None),
        (2, "image/png", bytearray(b"not a png"), 4, 4, None, None),
        (3, "video/mp4", bytearray(b"whatever"), 4, 4, None, 5),
        (4, "image/png", bytearray(encode_png(_image(4, 4, 3))), 4, 4, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = (
        decode_media(media, decoder="real", on_error="null")
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[[1, 2, 3], "byte_len"].isna().all()
    assert got.loc[4, "byte_len"] == 48


def test_real_resize_skip_mode_leaves_bad_rows(spark):
    from marketdatapipeline_spark.multimodal.ops import MEDIA_SCHEMA, resize_images

    good = encode_png(_image(8, 8, 3))
    rows = [
        (1, "image/png", bytearray(good), 8, 8, None, None),
        (2, "image/jpeg", bytearray(b"\xff\xd8jpeg-ish"), 8, 8, None, None),
        (3, "image/png", bytearray(b"corrupt"), 8, 8, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    with pytest.raises(Exception):
        resize_images(media, 4, 4, decoder="real").collect()
    got = (
        resize_images(media, 4, 4, decoder="real", on_error="skip")
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "width"] == 4
    assert decode_png(bytes(got.loc[1, "content"])).shape == (4, 4, 3)
    # bad rows untouched, payload preserved
    assert got.loc[2, "width"] == 8 and bytes(got.loc[3, "content"]) == b"corrupt"


# ---------------------------------------------------------------------------
# JPEG (multimodal/jpeg.py)
# ---------------------------------------------------------------------------

from marketdatapipeline_spark.multimodal.codecs import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _smooth_image(h, w, ch):
    yy, xx = np.mgrid[0:h, 0:w]
    planes = [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256]
    return np.stack(planes[:ch], axis=-1).astype(np.uint8)


def test_jpeg_flat_image_roundtrips_exactly():
    """A uniform image is DC-only: quantization cannot lose anything,
    so even a lossy codec must round-trip it bit-exact."""
    flat = np.full((16, 24, 3), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=90))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, flat)


@pytest.mark.parametrize("ch", [1, 3])
def test_jpeg_roundtrip_psnr_floor(ch):
    """JPEG is lossy by construction — the pin is PSNR at a measured
    floor (smooth content at q=85 measured 51.0 dB color / 55.7 dB
    gray in r7), plus non-multiple-of-8 dimensions surviving the
    block padding."""
    img = _smooth_image(41, 53, ch)
    out = decode_jpeg(encode_jpeg(img, quality=85))
    assert out.shape == (41, 53, ch)
    assert _psnr(img, out) > 45.0


def test_jpeg_quality_monotone_on_noise():
    """Higher quality => finer quantization => higher fidelity, on the
    hardest content (deterministic pseudo-random pixels)."""
    img = _image(33, 41, 3, seed=3)
    p = [_psnr(img, decode_jpeg(encode_jpeg(img, quality=q))) for q in (30, 70, 95)]
    assert p[0] < p[1] < p[2]
    assert p[2] > 30.0


@pytest.mark.parametrize("sampling", ["4:2:2", "4:2:0"])
def test_jpeg_subsampled_roundtrip_psnr_floor(sampling):
    """r8: encoder emits 2x1 (4:2:2) and 2x2 (4:2:0) luma sampling —
    the factors real corpora actually carry — and the decoder's
    general 1/2-factor MCU walk + nearest upsampler round-trips them.
    Chroma is box-filtered down, so the floor is lower than 4:4:4 but
    still high on smooth content; odd dimensions cross the MCU pad."""
    img = _smooth_image(41, 53, 3)
    out = decode_jpeg(encode_jpeg(img, quality=85, sampling=sampling))
    assert out.shape == (41, 53, 3)
    assert _psnr(img, out) > 38.0
    # grayscale ignores sampling (single component, no chroma)
    g = _smooth_image(17, 19, 1)
    assert decode_jpeg(encode_jpeg(g, sampling=sampling)).shape == (17, 19, 1)
    with pytest.raises(ValueError, match="sampling"):
        encode_jpeg(img, sampling="4:1:1")


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF pad bytes may precede a marker
    code; legal real-world files use them."""
    good = bytearray(encode_jpeg(_smooth_image(16, 16, 3)))
    i = bytes(good).index(b"\xff\xdb")  # pad before the first DQT
    padded = bytes(good[:i]) + b"\xff\xff\xff" + bytes(good[i:])
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(bytes(good)))


def test_jpeg_checkerboard_high_quality_no_keyerror():
    """ADVICE r7: at quality ~100 the quant table clamps to 1 and a
    checkerboard's AC hits ±1024 — category 11, absent from the Annex
    K AC tables. The encoder clamps AC to ±1023 instead of KeyError."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[::2, 1::2] = 255
    img[1::2, ::2] = 255
    for q in (98, 100):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == (16, 16, 1)
        # clamping one saturated coefficient still reconstructs closely
        assert _psnr(img[:, :, None], out) > 25.0


def test_progressive_jpeg_is_counted_error_in_decode_stats(spark):
    """An unsupported SOF (progressive SOF2) payload flowing through
    decode_media(on_error='null') becomes a counted null-stats row —
    one bad image never crashes the mapInPandas task."""
    from marketdatapipeline_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        decode_media,
    )

    good = bytearray(encode_jpeg(_smooth_image(16, 16, 3)))
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    rows = [
        (1, "image/jpeg", bytearray(bytes(good)), 16, 16, None, None),
        (2, "image/jpeg", bytearray(encode_jpeg(_smooth_image(8, 8, 3))), 8, 8, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = (
        decode_media(media, decoder="real", on_error="null")
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "byte_len"] is None or np.isnan(got.loc[1, "byte_len"])
    assert got.loc[2, "byte_len"] == 8 * 8 * 3


def test_jpeg_decodes_external_real_world_file():
    """Interop: a JPEG produced by a REAL encoder (CPython's test-suite
    python.jpg ships in every pyenv CPython) must decode — this pins
    marker parsing, standard Huffman/quant table handling, and chroma
    subsampling against an independent implementation's output."""
    import glob

    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.jpg"
    ) + glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.jpg"
    )
    if not candidates:
        pytest.skip("no CPython test JPEG on this host")
    img = decode_jpeg(open(candidates[0], "rb").read())
    assert img.shape == (16, 16, 3)
    assert 0 < float(img.mean()) < 255


def test_jpeg_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"definitely not a jpeg")
    good = bytearray(encode_jpeg(_smooth_image(16, 16, 3)))
    # flip SOF0 -> SOF2 (progressive): must be a clean ValueError
    i = bytes(good).index(b"\xff\xc0")
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(prog))
    # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))


def test_spark_real_decode_and_resize_jpeg(spark):
    """image/jpeg payloads through decode_media(decoder='real') and the
    real resize path: stats come from DECODED pixels, resize re-encodes
    as JPEG, and the re-encoded payload decodes to the resized shape."""
    from marketdatapipeline_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        decode_media,
        resize_images,
    )

    img = _smooth_image(24, 16, 3)
    jpg = encode_jpeg(img, quality=90)
    rows = [(1, "image/jpeg", bytearray(jpg), 16, 24, None, None)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

    got = decode_media(media, decoder="real").toPandas().set_index("doc_id")
    assert got.loc[1, "byte_len"] == 24 * 16 * 3  # decoded pixel count
    decoded = decode_jpeg(jpg)
    assert abs(got.loc[1, "byte_mean"] - decoded.reshape(-1).mean()) < 1e-4

    resized = (
        resize_images(media, 8, 12, decoder="real").toPandas().set_index("doc_id")
    )
    assert resized.loc[1, "width"] == 8 and resized.loc[1, "height"] == 12
    out_img = decode_jpeg(bytes(resized.loc[1, "content"]))
    assert out_img.shape == (12, 8, 3)
    # re-encode is lossy; the content must still resemble the resample
    from marketdatapipeline_spark.multimodal.codecs import resize_nearest

    assert _psnr(out_img, resize_nearest(decoded, 8, 12)) > 35.0


# ---------------------------------------------------------------------------
# r9: MJPEG-in-MP4 — the video pixel-decode closure
# ---------------------------------------------------------------------------

from marketdatapipeline_spark.multimodal.codecs import (  # noqa: E402
    decode_mjpeg_frames,
)
from marketdatapipeline_spark.multimodal.mp4 import (  # noqa: E402
    make_mjpeg_mp4,
    parse_mp4_metadata,
    parse_mp4_samples,
)


def _mjpeg_fixture(n_frames=4, w=24, h=16, seed=11):
    rng = np.random.default_rng(seed)
    frames = [
        encode_jpeg(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        for _ in range(n_frames)
    ]
    return frames, make_mjpeg_mp4(frames, w, h, fps=4)


def test_mjpeg_mp4_sample_table_roundtrip():
    """The muxer's stbl resolves back to exactly the frame payloads."""
    frames, mp4 = _mjpeg_fixture()
    info = parse_mp4_samples(mp4)
    assert info["codec"] == "jpeg"
    assert (info["width"], info["height"]) == (24, 16)
    assert len(info["samples"]) == len(frames)
    for (off, size), f in zip(info["samples"], frames):
        assert mp4[off : off + size] == f
    # and the metadata walker still reads the same container
    m = parse_mp4_metadata(mp4)
    assert m["has_video"] and (m["width"], m["height"]) == (24, 16)
    assert m["duration_s"] == pytest.approx(1.0)  # 4 frames @ 4 fps


def test_mjpeg_frames_decode_identical_to_direct_jpeg():
    """Pixel closure: frames decoded THROUGH the container equal
    decode_jpeg on the raw frame bytes, bit for bit."""
    frames, mp4 = _mjpeg_fixture(n_frames=5)
    dec = decode_mjpeg_frames(mp4)
    assert [i for i, _ in dec] == [0, 1, 2, 3, 4]
    for (_, arr), f in zip(dec, frames):
        assert (arr == decode_jpeg(f)).all()
    # frame sampling + cap
    assert [i for i, _ in decode_mjpeg_frames(mp4, every_n=2)] == [0, 2, 4]
    assert len(decode_mjpeg_frames(mp4, limit=2)) == 2


def test_mjpeg_rejects_non_mjpeg_codec_and_corrupt():
    frames, mp4 = _mjpeg_fixture(n_frames=2)
    # flip the sample-entry fourcc to a codec we can't decode
    avc = mp4.replace(b"jpeg", b"avc1", 1)
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mjpeg_frames(avc)
    with pytest.raises(ValueError):
        decode_mjpeg_frames(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="every_n"):
        decode_mjpeg_frames(mp4, every_n=0)
    # metadata-only fixture has no sample table
    from marketdatapipeline_spark.multimodal.mp4 import make_minimal_mp4

    with pytest.raises(ValueError, match="sample table"):
        parse_mp4_samples(make_minimal_mp4())


def test_video_frame_stats_operator(spark):
    """Spark plumbing: per-frame stats rows for MJPEG payloads,
    null-stat rows for undecodable video under on_error='null'."""
    from marketdatapipeline_spark.multimodal.ops import video_frame_stats

    frames, mp4 = _mjpeg_fixture(n_frames=3)
    bad = mp4.replace(b"jpeg", b"avc1", 1)
    df = spark.createDataFrame(
        [
            (1, "video/mp4", bytearray(mp4)),
            (2, "video/mp4", bytearray(bad)),
            (3, "image/png", bytearray(b"not video")),
        ],
        "doc_id long, mime string, content binary",
    )
    out = video_frame_stats(df, on_error="null").toPandas()
    got = out[out["doc_id"] == 1].sort_values("frame_idx")
    assert list(got["frame_idx"]) == [0, 1, 2]
    assert (got["n_frames"] == 3).all()
    assert (got["width"] == 24).all() and (got["height"] == 16).all()
    ref = decode_jpeg(frames[0])
    assert got.iloc[0]["pix_mean"] == pytest.approx(float(ref.mean()))
    assert got.iloc[0]["pix_std"] == pytest.approx(float(ref.std()))
    bad_rows = out[out["doc_id"] == 2]
    assert len(bad_rows) == 1 and pd.isna(bad_rows.iloc[0]["frame_idx"])
    assert (out["doc_id"] != 3).all()  # non-video skipped entirely
    with pytest.raises(Exception):
        video_frame_stats(df, on_error="raise").toPandas()


def test_real_decode_media_handles_mjpeg_video(spark):
    """decode_media(decoder='real') byte-stats video over DECODED
    pixels now — concatenated frames, not container bytes."""
    from marketdatapipeline_spark.multimodal.ops import decode_media

    frames, mp4 = _mjpeg_fixture(n_frames=2)
    df = spark.createDataFrame(
        [(1, "video/mp4", bytearray(mp4))],
        "doc_id long, mime string, content binary",
    )
    row = decode_media(df, decoder="real").collect()[0]
    pix = np.concatenate([decode_jpeg(f).reshape(-1) for f in frames])
    assert row["byte_len"] == pix.size
    assert row["byte_mean"] == pytest.approx(float(pix.mean()), rel=1e-6)


def test_parse_mp4_samples_corrupt_inputs_raise_valueerror():
    """Every corrupt-input path must honor the ValueError contract —
    the on_error='null' handlers upstream catch exactly that (r9
    review: a flipped stsc count surfaced as struct.error and killed
    the whole job on_error='null' exists to survive)."""
    import struct

    frames, mp4 = _mjpeg_fixture(n_frames=2)

    # stsc n_runs inflated past the box end -> was struct.error
    i = mp4.index(b"stsc") + 8  # past fourcc + version/flags
    inflated = mp4[:i] + struct.pack(">I", 1 << 20) + mp4[i + 4 :]
    with pytest.raises(ValueError, match="corrupt MP4"):
        parse_mp4_samples(inflated)

    # stsc first_chunk = 0 -> silently indexed chunk_offsets[-1]
    (n_runs,) = struct.unpack(">I", mp4[i : i + 4])
    assert n_runs >= 1
    zeroed = mp4[: i + 4] + struct.pack(">I", 0) + mp4[i + 8 :]
    with pytest.raises(ValueError, match="first_chunk"):
        parse_mp4_samples(zeroed)

    # truncated stsz payload -> ValueError, not struct.error
    j = mp4.index(b"stsz")
    with pytest.raises(ValueError):
        parse_mp4_samples(mp4[: j + 10])
