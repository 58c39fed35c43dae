"""Minimal ISO BMFF (MP4) box walker — container metadata AND the
sample-table demux: brand, movie duration/timescale, track count and
kinds, video dimensions, and (r9) per-sample byte ranges resolved
from the stbl boxes, which is everything an MJPEG track needs to
reach pixels through the in-repo JPEG decoder (codecs.decode_mjpeg_
frames). Non-MJPEG codecs remain the documented NotImplementedError
— inter-frame codec stacks are not reasonably reimplementable here.

Reference structure: ISO/IEC 14496-12. Boxes are (uint32 size, 4-byte
type, payload); ``size == 1`` switches to a 64-bit largesize,
``size == 0`` means "to end of file". Container boxes (moov/trak/
mdia/minf/stbl) nest; we walk only the spine needed.

``make_minimal_mp4`` synthesizes a tiny structurally-valid header
(the deterministic fixture standing in for real media);
``make_mjpeg_mp4`` goes further and muxes actual JPEG frames into a
playable single-chunk MJPEG file — fixture for the real decode path.
"""

from __future__ import annotations

import struct

__all__ = [
    "make_minimal_mp4",
    "make_mjpeg_mp4",
    "parse_mp4_metadata",
    "parse_mp4_samples",
]


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for sibling boxes in
    [start, end). Raises ValueError on structurally impossible sizes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("corrupt MP4: truncated largesize")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(
                f"corrupt MP4: box {btype!r} size {size} out of bounds"
            )
        yield btype, pos + head, pos + size
        pos += size
    if pos != end:
        raise ValueError("corrupt MP4: trailing bytes are not a box")


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _walk(data, start, end):
        if t == btype:
            return s, e
    return None


def parse_mp4_metadata(data: bytes) -> dict:
    """Parse container metadata from MP4 bytes.

    Returns ``{major_brand, duration_s, timescale, n_tracks,
    has_video, has_audio, width, height}``; width/height come from
    the first video track's tkhd (16.16 fixed point). Raises
    ValueError on non-MP4 or structurally corrupt input — the same
    contract as the other codecs, so ``on_error`` handling composes.
    """
    if len(data) < 16:
        raise ValueError("not an MP4: too short")
    boxes = list(_walk(data, 0, len(data)))
    types = [t for t, _, _ in boxes]
    if b"ftyp" not in types:
        raise ValueError("not an MP4: no ftyp box")
    out: dict = {
        "major_brand": None,
        "duration_s": None,
        "timescale": None,
        "n_tracks": 0,
        "has_video": False,
        "has_audio": False,
        "width": None,
        "height": None,
    }
    for t, s, e in boxes:
        if t == b"ftyp":
            out["major_brand"] = data[s : s + 4].decode("ascii", "replace")
        elif t == b"moov":
            for mt, ms, me in _walk(data, s, e):
                if mt == b"mvhd":
                    ver = data[ms]
                    if ver == 1:
                        ts, dur = struct.unpack(
                            ">IQ", data[ms + 20 : ms + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", data[ms + 12 : ms + 20]
                        )
                    out["timescale"] = int(ts)
                    out["duration_s"] = (
                        float(dur) / ts if ts else None
                    )
                elif mt == b"trak":
                    out["n_tracks"] += 1
                    tkhd = _find(data, ms, me, b"tkhd")
                    mdia = _find(data, ms, me, b"mdia")
                    handler = None
                    if mdia:
                        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
                        if hdlr:
                            handler = data[hdlr[0] + 8 : hdlr[0] + 12]
                    if handler == b"vide":
                        out["has_video"] = True
                        if tkhd and out["width"] is None:
                            ver = data[tkhd[0]]
                            off = tkhd[0] + (96 if ver == 1 else 84) - 8
                            w16, h16 = struct.unpack(
                                ">II", data[off : off + 8]
                            )
                            out["width"] = w16 >> 16
                            out["height"] = h16 >> 16
                    elif handler == b"soun":
                        out["has_audio"] = True
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def make_minimal_mp4(
    duration_s: float = 2.5,
    timescale: int = 1000,
    width: int = 64,
    height: int = 48,
    with_audio: bool = True,
) -> bytes:
    """Synthesize a structurally valid MP4 header (ftyp + moov with
    one video and optionally one audio track + empty mdat) — the
    deterministic fixture standing in for real media in-container."""
    mvhd = (
        b"\x00\x00\x00\x00"  # version/flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, int(round(duration_s * timescale)))
        + b"\x00" * 80  # rate/volume/matrix/predefined/next_track_id
    )

    def trak(handler: bytes, w: int = 0, h: int = 0) -> bytes:
        tkhd = (
            b"\x00\x00\x00\x07"
            + b"\x00" * 16  # times/track id/reserved (version 0)
            + b"\x00" * 56  # reserved/layer/volume/matrix
            + struct.pack(">II", w << 16, h << 16)
        )
        hdlr = b"\x00\x00\x00\x00" + b"\x00" * 4 + handler + b"\x00" * 13
        mdia = _box(b"hdlr", hdlr)
        return _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))

    moov = _box(b"mvhd", mvhd) + trak(b"vide", width, height)
    if with_audio:
        moov += trak(b"soun")
    return (
        _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + _box(b"moov", moov)
        + _box(b"mdat", b"")
    )


def _full_payload(data: bytes, span, btype: bytes) -> tuple[int, int]:
    """(payload_start_past_version_flags, payload_end) of a FullBox."""
    if span is None:
        raise ValueError(f"corrupt MP4: missing {btype.decode()} box")
    return span[0] + 4, span[1]


def parse_mp4_samples(data: bytes) -> dict:
    """Resolve the FIRST video track's sample table to absolute byte
    ranges: ``{codec, width, height, timescale, samples: [(offset,
    size), ...]}``.

    Implements the standard stsc/stco/stsz chunk-to-sample
    resolution (ISO/IEC 14496-12 §8.7): chunks come from stco (or
    co64), each stsc run says how many samples consecutive chunks
    hold, and samples pack back-to-back inside a chunk, so sample i's
    offset is its chunk's offset plus the sizes of its predecessors
    in that chunk. Raises ValueError on structurally corrupt input or
    when no video track with a sample table exists — same contract as
    the other codecs.
    """
    # a field count that points a fixed-width unpack past the box end
    # surfaces as struct.error deep in the walk; the documented
    # contract (and every on_error='null' handler upstream) is
    # ValueError for ANY corrupt input, so normalize here
    try:
        return _parse_mp4_samples_unchecked(data)
    except struct.error as e:
        raise ValueError(f"corrupt MP4: truncated box payload ({e})") from e


def _parse_mp4_samples_unchecked(data: bytes) -> dict:
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("not an MP4: no moov box")
    timescale = None
    for mt, ms, me in _walk(data, moov[0], moov[1]):
        if mt == b"mvhd":
            ver = data[ms]
            if ver == 1:
                (timescale,) = struct.unpack(">I", data[ms + 20 : ms + 24])
            else:
                (timescale,) = struct.unpack(">I", data[ms + 12 : ms + 16])
    for mt, ms, me in _walk(data, moov[0], moov[1]):
        if mt != b"trak":
            continue
        mdia = _find(data, ms, me, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        s0, s1 = stbl
        # stsd: first sample entry's fourcc + VisualSampleEntry dims
        ds, de = _full_payload(data, _find(data, s0, s1, b"stsd"), b"stsd")
        (n_entries,) = struct.unpack(">I", data[ds : ds + 4])
        if n_entries < 1 or de - ds < 8 + 16:
            raise ValueError("corrupt MP4: empty stsd")
        ent = ds + 4
        codec = data[ent + 4 : ent + 8].decode("ascii", "replace")
        # SampleEntry: 6 reserved + 2 dref index; VisualSampleEntry:
        # 16 bytes pre_defined/reserved, then width/height uint16s
        dims = ent + 8 + 8 + 16
        width = height = None
        if dims + 4 <= de:
            width, height = struct.unpack(">HH", data[dims : dims + 4])
        # stsz: per-sample sizes (or one constant size)
        zs, ze = _full_payload(data, _find(data, s0, s1, b"stsz"), b"stsz")
        const_size, n_samples = struct.unpack(">II", data[zs : zs + 8])
        if const_size:
            sizes = [const_size] * n_samples
        else:
            if zs + 8 + 4 * n_samples > ze:
                raise ValueError("corrupt MP4: truncated stsz")
            sizes = list(
                struct.unpack(f">{n_samples}I", data[zs + 8 : zs + 8 + 4 * n_samples])
            )
        # stco / co64: chunk offsets
        co = _find(data, s0, s1, b"stco")
        fmt = ">I"
        if co is None:
            co = _find(data, s0, s1, b"co64")
            fmt = ">Q"
        cs, ce = _full_payload(data, co, b"stco")
        (n_chunks,) = struct.unpack(">I", data[cs : cs + 4])
        w = struct.calcsize(fmt)
        if cs + 4 + w * n_chunks > ce:
            raise ValueError("corrupt MP4: truncated chunk offsets")
        chunk_offsets = [
            struct.unpack(fmt, data[cs + 4 + i * w : cs + 4 + (i + 1) * w])[0]
            for i in range(n_chunks)
        ]
        # stsc: (first_chunk, samples_per_chunk, sdi) runs
        ccs, cce = _full_payload(data, _find(data, s0, s1, b"stsc"), b"stsc")
        (n_runs,) = struct.unpack(">I", data[ccs : ccs + 4])
        runs = [
            struct.unpack(">III", data[ccs + 4 + i * 12 : ccs + 16 + i * 12])
            for i in range(n_runs)
        ]
        samples: list[tuple[int, int]] = []
        si = 0
        for ri, (first, spc, _sdi) in enumerate(runs):
            # chunk numbers are 1-based; a corrupt first_chunk of 0
            # would make ci = -1 index the LAST chunk offset silently
            if first < 1:
                raise ValueError("corrupt MP4: stsc first_chunk < 1")
            last = (
                runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
            )
            if last > n_chunks:
                raise ValueError(
                    "corrupt MP4: stsc run exceeds chunk count"
                )
            for ci in range(first - 1, last):
                off = chunk_offsets[ci]
                for _ in range(spc):
                    if si >= n_samples:
                        break
                    size = sizes[si]
                    if off + size > len(data):
                        raise ValueError(
                            "corrupt MP4: sample range outside file"
                        )
                    samples.append((off, size))
                    off += size
                    si += 1
        if si != n_samples:
            raise ValueError(
                f"corrupt MP4: chunk map covers {si} of {n_samples} samples"
            )
        return {
            "codec": codec,
            "width": width,
            "height": height,
            "timescale": timescale,
            "samples": samples,
        }
    raise ValueError("MP4 has no video track with a sample table")


def _fullbox(btype: bytes, payload: bytes) -> bytes:
    return _box(btype, b"\x00\x00\x00\x00" + payload)


def make_mjpeg_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    timescale: int = 1000,
) -> bytes:
    """Mux pre-encoded JPEG frames into a single-chunk MJPEG MP4
    (sample entry fourcc ``jpeg``): ftyp + moov (full stbl sample
    table) + one mdat holding the frames back-to-back. Everything a
    corpus fixture needs for the REAL decode path: parse_mp4_samples
    finds each frame, codecs.decode_mjpeg_frames reaches pixels via
    the in-repo JPEG decoder."""
    if not frames:
        raise ValueError("make_mjpeg_mp4 needs at least one frame")
    n = len(frames)
    delta = max(1, timescale // max(1, fps))
    duration = n * delta

    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x0bmotion-jpeg" + b"\x00" * 20  # 32-byte compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _fullbox(b"stsd", struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _fullbox(b"stts", struct.pack(">III", 1, n, delta))
    stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )

    def build(chunk_offset: int) -> bytes:
        stco = _fullbox(b"stco", struct.pack(">II", 1, chunk_offset))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _fullbox(b"vmhd", b"\x00" * 8)
        minf = _box(b"minf", vmhd + stbl)
        mdhd = _fullbox(
            b"mdhd",
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _fullbox(
            b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = (
            b"\x00\x00\x00\x07"
            + b"\x00" * 16
            + b"\x00" * 56
            + struct.pack(">II", width << 16, height << 16)
        )
        mvhd = (
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80
        )
        moov = _box(
            b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd) + mdia)
        )
        return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov

    head = build(0)
    # one fixed-width stco entry -> the rebuild cannot change sizes
    out = build(len(head) + 8)
    assert len(out) == len(head)
    return out + _box(b"mdat", b"".join(frames))
