"""Multimodal binary-column plumbing: schemas, kernels, stubs."""

from __future__ import annotations

import math

import numpy as np
import pytest

from marketdatapipeline_spark.multimodal import (
    decode_media,
    extract_media_features,
    media_from_documents,
    resize_images,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(spark, SF).cache()


def test_media_schema_and_metadata(media):
    assert dict(media.dtypes)["content"] == "binary"
    pdf = media.toPandas()
    assert set(pdf["mime"].unique()) <= {"image/png", "audio/wav", "video/mp4"}
    audio = pdf[pdf["mime"] == "audio/wav"]
    assert (audio["sample_rate"] == 16000).all()
    assert audio["width"].isna().all()
    video = pdf[pdf["mime"] == "video/mp4"]
    assert video["n_frames"].between(1, 30).all()


def test_decode_stats_match_numpy(media):
    got = decode_media(media, decoder="fake").toPandas().set_index("doc_id")
    raw = media.select("doc_id", "content").toPandas()
    for _, row in raw.head(20).iterrows():
        buf = np.frombuffer(row["content"], dtype=np.uint8)
        g = got.loc[row["doc_id"]]
        assert g["byte_len"] == buf.size
        assert math.isclose(g["byte_mean"], buf.mean(), rel_tol=1e-6)
        counts = np.bincount(buf, minlength=256)
        p = counts[counts > 0] / buf.size
        assert math.isclose(g["byte_entropy"], -(p * np.log2(p)).sum(), rel_tol=1e-5)


def test_real_decoder_rejects_fake_payloads(media):
    """The synthetic corpus payloads are UTF-8 text, not PNG/WAV — the
    real decoder must refuse them loudly (raise) or mark them null
    (permissive mode), never emit garbage stats."""
    with pytest.raises(Exception, match="(not a PNG|not a WAV|no in-container)"):
        decode_media(media, decoder="real").collect()
    permissive = decode_media(media, decoder="real", on_error="null").toPandas()
    assert permissive["byte_len"].isna().all()
    assert len(permissive) == media.count()


def test_features_are_unit_norm_fixed_dim(media):
    pdf = extract_media_features(media, dim=16).toPandas()
    assert (pdf["feature"].map(len) == 16).all()
    norms = pdf["feature"].map(lambda v: float(np.linalg.norm(v)))
    assert ((norms - 1.0).abs() < 1e-5).all()


def test_resize_fake_touches_only_images(media):
    out = resize_images(media, 224, 224).toPandas()
    img = out[out["mime"] == "image/png"]
    assert (img["width"] == 224).all() and (img["height"] == 224).all()
    aud = out[out["mime"] == "audio/wav"]
    assert aud["width"].isna().all()


def test_sample_frames_stride(media):
    frames = sample_frames(media, every_n=3).toPandas()
    assert (frames["mime"] == "video/mp4").all()
    assert (frames["frame_idx"] % 3 == 0).all()
    grp = frames.groupby("doc_id").agg(n=("frame_idx", "size"), nf=("n_frames", "first"))
    expect = (grp["nf"] + 2) // 3  # ceil(n_frames / 3)
    assert (grp["n"] == expect).all()


def test_image_dhash_and_near_duplicates(spark):
    """Perceptual dedup end-to-end: the same picture re-encoded at a
    different JPEG quality (and as PNG) hashes within a few bits;
    a different picture does not collide."""
    import numpy as np

    from marketdatapipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        encode_jpeg,
        encode_png,
        image_dhash,
        near_duplicate_images,
    )

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    # smooth but TEXTURED image (monotone gradients are degenerate for
    # dHash — every gradient bit identical): low-frequency sinusoids
    # survive lossy re-encode with tiny error yet flip sign often
    img = np.stack(
        [
            128 + 90 * np.sin(xx * 0.35) * np.cos(yy * 0.25),
            128 + 90 * np.cos(xx * 0.30 + 1.0),
            128 + 90 * np.sin((xx + yy) * 0.22),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    other = np.stack(
        [
            128 + 90 * np.cos(xx * 0.18 + 2.0) * np.sin(yy * 0.4),
            128 + 90 * np.sin(yy * 0.33),
            128 + 90 * np.cos((2 * xx - yy) * 0.27),
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    rows = [
        (1, "image/jpeg", bytearray(encode_jpeg(img, quality=90)), w, h, None, None),
        (2, "image/jpeg", bytearray(encode_jpeg(img, quality=50)), w, h, None, None),
        (3, "image/png", bytearray(encode_png(img)), w, h, None, None),
        (4, "image/png", bytearray(encode_png(other)), w, h, None, None),
        (5, "audio/wav", bytearray(b"not an image"), None, None, 16000, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    hashes = image_dhash(media)
    got = {r["doc_id"]: r["dhash"] for r in hashes.collect()}
    assert set(got) == {1, 2, 3, 4}  # audio row skipped

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(got[1], got[2]) <= 6   # re-encode quality shift
    assert ham(got[1], got[3]) <= 6   # lossless vs lossy of same image
    assert ham(got[1], got[4]) > 12   # different picture stays apart

    pairs = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in near_duplicate_images(hashes, max_distance=6).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)

    # corrupted payload: on_error='null' -> null hash, excluded from
    # banding; 'raise' surfaces
    bad = spark.createDataFrame(
        [(9, "image/jpeg", bytearray(b"garbage"), 1, 1, None, None)],
        schema=MEDIA_SCHEMA,
    )
    assert image_dhash(bad, on_error="null").collect()[0]["dhash"] is None
    import pytest as _pytest

    with _pytest.raises(Exception):
        image_dhash(bad, on_error="raise").collect()


def test_mp4_box_walk_metadata(spark):
    """ISO BMFF metadata without a codec: the synthesized fixture
    round-trips brand/duration/tracks/dimensions; corrupt payloads
    are clean ValueErrors (counted under on_error='null'); pixel
    decode remains the documented NotImplementedError."""
    from marketdatapipeline_spark.multimodal import (
        MEDIA_SCHEMA,
        make_minimal_mp4,
        mp4_metadata,
        parse_mp4_metadata,
    )

    blob = make_minimal_mp4(duration_s=2.5, timescale=1000, width=64, height=48)
    m = parse_mp4_metadata(blob)
    assert m["major_brand"] == "isom"
    assert m["duration_s"] == pytest.approx(2.5)
    assert m["timescale"] == 1000
    assert m["n_tracks"] == 2 and m["has_video"] and m["has_audio"]
    assert m["width"] == 64 and m["height"] == 48

    no_audio = parse_mp4_metadata(make_minimal_mp4(with_audio=False))
    assert no_audio["n_tracks"] == 1 and not no_audio["has_audio"]

    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_metadata(b"\x00\x00\x00\x08free" * 4)
    with pytest.raises(ValueError, match="out of bounds"):
        parse_mp4_metadata(b"\xff\xff\xff\xffmoovxxxxxxxxxxx")

    rows = [
        (1, "video/mp4", bytearray(blob), None, None, None, 5),
        (2, "video/mp4", bytearray(b"garbage not mp4!"), None, None, None, 1),
        (3, "image/png", bytearray(b"skip me"), 4, 4, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in mp4_metadata(media, on_error="null").collect()
    }
    assert set(got) == {1, 2}  # non-video skipped
    assert got[1]["major_brand"] == "isom" and got[1]["width"] == 64
    assert got[1]["has_video"] == 1 and got[1]["has_audio"] == 1
    assert got[2]["major_brand"] is None  # counted error row
    with pytest.raises(Exception):
        mp4_metadata(media, on_error="raise").collect()


def test_audio_features_on_synthesized_tones(spark):
    """1 kHz sine at 16 kHz: centroid ~ 1 kHz, ZCR ~ 2f/rate, RMS ~
    amp/sqrt(2); white noise: centroid ~ rate/4 and near-1 rolloff
    position; non-audio rows pruned; corrupt payloads honor on_error."""
    import numpy as np

    from marketdatapipeline_spark.multimodal.codecs import encode_wav
    from marketdatapipeline_spark.multimodal.ops import audio_features

    rate, dur = 16000, 1.0
    t = np.arange(int(rate * dur)) / rate
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.int16)
    rng = np.random.RandomState(5)
    noise = (0.3 * 32767 * rng.uniform(-1, 1, len(t))).astype(np.int16)
    rows = [
        (1, "audio/wav", bytearray(encode_wav(sine, rate))),
        (2, "audio/wav", bytearray(encode_wav(noise, rate))),
        (3, "image/png", bytearray(b"not audio")),
        (4, "audio/wav", bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, mime STRING, content BINARY")

    ok = {
        r["doc_id"]: r
        for r in audio_features(
            df.filter("doc_id < 4"), on_error="raise"
        ).collect()
    }
    assert set(ok) == {1, 2}  # png row pruned plan-side
    s = ok[1]
    assert s["n_samples"] == len(t) and s["sample_rate"] == rate
    assert abs(s["duration_sec"] - 1.0) < 1e-9
    assert abs(s["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert abs(s["zero_crossing_rate"] - 2 * 1000.0 / rate) < 0.005
    assert abs(s["spectral_centroid_hz"] - 1000.0) < 30.0
    n = ok[2]
    assert 3000.0 < n["spectral_centroid_hz"] < 5000.0  # ~ rate/4
    assert n["spectral_rolloff_hz"] > n["spectral_centroid_hz"]

    nulls = {
        r["doc_id"]: r for r in audio_features(df, on_error="null").collect()
    }
    assert nulls[4]["rms"] is None  # corrupt counted, not crashing
    import pytest as _pytest

    with _pytest.raises(Exception):
        audio_features(df, on_error="raise").collect()
