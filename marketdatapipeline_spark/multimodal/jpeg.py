"""Baseline JPEG (ITU-T T.81) codec with zero external dependencies.

Closes the documented ``image/jpeg`` gap in the real-codec path
(multimodal/ops.py): PNG/WAV shipped in r6, JPEG stayed a
NotImplementedError because the container has no PIL — but baseline
sequential JPEG is fully specified and implementable with numpy alone.

Scope (the shapes a training corpus normalizes to):

* **decode**: baseline sequential DCT (SOF0), 8-bit, 1 or 3
  components, Huffman entropy coding, component sampling factors 1 or
  2 in each axis (4:4:4 / 4:2:2 / 4:2:0). Progressive (SOF2),
  arithmetic coding, 12-bit, DNL and restart intervals raise
  ValueError — callers treat that as "undecodable payload", same
  contract as decode_png.
* **encode**: 4:4:4 (or single-component) baseline JPEG with the
  Annex K quantization tables scaled by the libjpeg quality
  convention and the Annex K Huffman tables. Output decodes in any
  JPEG decoder; round-trips through :func:`decode_jpeg` within the
  quantization error bound (JPEG is lossy by construction — the
  codec tests pin PSNR, not equality).

The DCT runs as one einsum over all 8x8 blocks of a component; only
the entropy (Huffman) layer is a per-symbol Python loop, which is
inherent to the format's bit-serial coding. Like the PNG codec, this
runs INSIDE mapInPandas batches (ops.py) — per-item decode is
per-item work; Arrow amortizes the transfer.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# --------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

#: zigzag scan order: index i of the scan holds flat block position ZZ[i]
ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# standard Huffman tables: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal DCT-II matrix: C @ f @ C.T is the JPEG FDCT
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality convention: 50 = Annex K verbatim."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# --------------------------------------------------------------------------
# Huffman tables
# --------------------------------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """(length, code) -> value lookup built from a DHT segment."""

    __slots__ = ("maxcode", "mincode", "valptr", "values")

    def __init__(self, bits: list[int], values: list[int]):
        # F.2.2.3 DECODE tables
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: bad Huffman code")
            code = (code << 1) | reader.read_bit()
        return self.values[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    stuffing removal; a marker byte mid-scan raises (we do not support
    restart intervals)."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def read_bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: truncated scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("corrupt JPEG: truncated scan")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(
                        f"unsupported JPEG: marker 0xFF{marker:02X} in scan"
                    )
            self.buf = b
            self.cnt = 8
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to an (H, W, C) uint8 array (C = 1
    grayscale or 3 RGB). Raises ValueError on progressive/arithmetic/
    12-bit/restart-interval streams and on corrupt data — every parse
    failure normalizes to ValueError (on_error="null" handling in
    ops.py relies on this)."""
    try:
        return _decode_jpeg_inner(data)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG: {e}") from e


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, [(cid, hsamp, vsamp, tq)])
    scan = None  # ([(cid, td, ta)], entropy-coded bytes)

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # the marker code — skip them (real-world files do this)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        next_pos = pos + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                flat = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = flat  # de-zigzag
                qt[tq] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG: {prec}-bit")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG: {nc} components")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError(f"unsupported JPEG: sampling {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG: SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
            if ri != 0:
                raise ValueError("unsupported JPEG: restart intervals")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scomps.append((cid, tdta >> 4, tdta & 0x0F))
            # entropy-coded data runs from next_pos to the next marker
            # (the bit reader stops at any non-stuffing 0xFFxx)
            scan = (scomps, data[next_pos:])
            break
        # APPn/COM/others: skip
        pos = next_pos

    if frame is None or scan is None:
        raise ValueError("corrupt JPEG: missing SOF0/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("unsupported JPEG: DNL-deferred height")
    scomps, entropy = scan
    if len(scomps) != len(comps):
        raise ValueError("unsupported JPEG: multi-scan")

    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    td_ta = {cid: (td, ta) for cid, td, ta in scomps}
    reader = _BitReader(entropy)
    # per component: coefficient planes in MCU-padded block grids
    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.int64))
    pred = [0] * len(comps)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = td_ta[cid]
                try:
                    ddec, adec = huff_dc[td], huff_ac[ta]
                    q = qt[tq]
                except KeyError as e:
                    raise ValueError(f"corrupt JPEG: missing table {e}") from e
                for by in range(vs):
                    for bx in range(hs):
                        blk = np.zeros(64, dtype=np.int64)
                        s = ddec.decode(reader)
                        pred[ci] += _extend(reader.receive(s), s)
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = adec.decode(reader)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            blk[ZIGZAG[k]] = _extend(reader.receive(s), s)
                            k += 1
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                            blk.reshape(8, 8) * q
                        )

    # IDCT all blocks of each plane in one einsum
    out_comps = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci]
        ph, pw = p.shape
        blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        pix = np.einsum("ij,abjk,kl->abil", _C.T, blocks.astype(np.float64), _C)
        plane = pix.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        # upsample to full resolution (nearest, the baseline upsampler)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        out_comps.append(plane[:h, :w])

    if len(out_comps) == 1:
        gray = np.clip(np.round(out_comps[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_comps
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                b = self.buf & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.buf = 0
                self.cnt = 0

    def flush(self) -> None:
        if self.cnt:
            # pad with 1-bits to the byte boundary (T.81 F.1.2.3)
            pad = 8 - self.cnt
            self.buf = (self.buf << pad) | ((1 << pad) - 1)
            b = self.buf & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.cnt = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_component(
    writer: _BitWriter,
    coeffs: np.ndarray,  # (nblocks, 64) zigzagged quantized ints
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    for blk in coeffs:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _category(diff)
        code, ln = dc_codes[s]
        writer.write(code, ln)
        if s:
            writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            writer.write(code, ln)
            writer.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
            if k == last_nz:
                break
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _block_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """plane (H*, W*, multiples of 8) -> (nblocks, 64) quantized
    zigzag coefficients, block raster order."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .astype(np.float64)
        - 128.0
    )
    f = np.einsum("ij,abjk,kl->abil", _C, blocks, _C.T)
    quant = np.round(f / q).astype(np.int64)
    flat = quant.transpose(0, 1, 2, 3).reshape(-1, 64)
    # zigzag: scan position i takes flat position ZIGZAG[i]
    out = flat[:, ZIGZAG]
    # clamp AC to the Annex K Huffman range (categories <= 10, i.e.
    # |v| <= 1023): at quality≈100 the quant table clamps to 1 and a
    # pathological high-frequency block can hit |AC| = 1024 →
    # category 11, absent from the AC tables (KeyError mid-encode).
    # DC stays unclamped — |DC| <= 1016 so the diff fits category 11,
    # which the DC tables do carry.
    np.clip(out[:, 1:], -1023, 1023, out=out[:, 1:])
    return out


def _downsample(plane: np.ndarray, hs: int, vs: int) -> np.ndarray:
    """Box-filter chroma downsample by (vs, hs); edge-pads to the
    factor multiple first so partial groups average real pixels."""
    h0, w0 = plane.shape
    ph, pw = -(-h0 // vs) * vs, -(-w0 // hs) * hs
    p = np.pad(plane, ((0, ph - h0), (0, pw - w0)), mode="edge")
    return p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))


#: sampling mode -> luma (hs, vs); chroma is always 1x1
_SAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, sampling: str = "4:4:4"
) -> bytes:
    """Encode a (H, W), (H, W, 1) or (H, W, 3) uint8 array as a
    baseline JFIF JPEG. Lossy: round-trips through decode_jpeg within
    the quantization error for the given quality.

    ``sampling`` (color only): ``"4:4:4"`` (1x1, every component full
    resolution), ``"4:2:2"`` (2x1 luma — the sampling real-world
    corpora carry most after 4:2:0), or ``"4:2:0"`` (2x2 luma); chroma
    is box-filtered down and the decoder's nearest-neighbor upsampler
    restores full resolution."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError(f"unsupported channel count: {ch}")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if sampling not in _SAMPLING:
        raise ValueError(
            f"sampling must be one of {sorted(_SAMPLING)}: {sampling!r}"
        )
    hs, vs = _SAMPLING[sampling] if ch == 3 else (1, 1)
    qy, qc = _quality_tables(quality)

    # color transform
    px = a.astype(np.float64)
    if ch == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        comps = [px[..., 0]]

    # MCU geometry: luma covers 8*hs x 8*vs pixels per MCU
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    def pad_to(c: np.ndarray, th: int, tw: int) -> np.ndarray:
        return np.pad(
            c, ((0, th - c.shape[0]), (0, tw - c.shape[1])), mode="edge"
        )

    y_plane = pad_to(comps[0], mcuy * vs * 8, mcux * hs * 8)
    if ch == 3:
        chroma = [
            pad_to(_downsample(c, hs, vs), mcuy * 8, mcux * 8)
            for c in comps[1:]
        ]

    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)

    def grid(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        """(nblocks_y, nblocks_x, 64) zigzagged quantized coeffs."""
        c = _block_coeffs(plane, q)
        return c.reshape(plane.shape[0] // 8, plane.shape[1] // 8, 64)

    writer = _BitWriter()
    if ch == 1:
        _encode_component(writer, _block_coeffs(y_plane, qy), dc_l, ac_l, 0)
    else:
        # interleaved MCUs: hs*vs luma blocks then one of each chroma
        yg = grid(y_plane, qy)
        cbg, crg = (grid(c, qc) for c in chroma)
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        preds[0] = _encode_component(
                            writer,
                            yg[my * vs + by, mx * hs + bx][None, :],
                            dc_l,
                            ac_l,
                            preds[0],
                        )
                preds[1] = _encode_component(
                    writer, cbg[my, mx][None, :], dc_c, ac_c, preds[1]
                )
                preds[2] = _encode_component(
                    writer, crg[my, mx][None, :], dc_c, ac_c, preds[2]
                )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(
            0xDB, bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG])
        )

    def dht(tc: int, th: int, table) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy)
    if ch == 3:
        out += dqt(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ch])
    for ci in range(ch):
        hv = (hs << 4) | vs if ci == 0 else 0x11
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if ch == 3:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    sos = bytes([ch])
    for ci in range(ch):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
