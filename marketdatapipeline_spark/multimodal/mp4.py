"""Minimal ISO BMFF (MP4) box walker — container METADATA without a
codec: brand, movie duration/timescale, track count and kinds, video
dimensions. This is the real demux boundary for a corpus pipeline:
routing, stats, and frame-index planning need the container header;
pixel decode needs a codec stack this container deliberately does not
ship (the documented NotImplementedError in ops.py stays for that).

Reference structure: ISO/IEC 14496-12. Boxes are (uint32 size, 4-byte
type, payload); ``size == 1`` switches to a 64-bit largesize,
``size == 0`` means "to end of file". Container boxes (moov/trak/
mdia/minf/stbl) nest; we walk only the spine needed for metadata.

``make_minimal_mp4`` synthesizes a tiny structurally-valid file (the
deterministic fixture for tests and demos — this container has no
real media to parse).
"""

from __future__ import annotations

import struct

__all__ = ["make_minimal_mp4", "parse_mp4_metadata"]


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
