"""Pure-stdlib GIF codec (87a/89a, first frame).

Decode implements the full variable-width LZW of the GIF
specification — clear/EOI codes, dictionary growth to 12 bits,
LSB-first bit packing across data sub-blocks — plus local/global
color tables and the 4-pass interlace row permutation. Extensions
(graphic control, comments, application) are skipped block-correctly;
only the FIRST image descriptor decodes (animation = later frames by
the same walk). The LZW inner loop is a per-code Python loop (one
iteration per emitted dictionary entry — the format is inherently
sequential); fine for the crawl-thumbnail sizes the media stages
process, and each image decodes inside its own map_batches task.

Encode writes GIF89a with an exact palette built from the image's
distinct colors (<= 256 required — the caller quantizes; synthetic
corpora qualify) using the classic uncompressed-LZW technique: all
codes stay literal at min_code_size + 1 bits with a clear code every
254 symbols, which every conformant decoder accepts. Round-trips are
pixel-exact, which is what the codec tests pin.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def gif_dims(raw: bytes) -> tuple[int, int] | None:
    """(width, height) of the logical screen — header only."""
    if len(raw) < 10 or raw[:6] not in _GIF_SIGS:
        return None
    w, h = struct.unpack("<HH", raw[6:10])
    return w, h


def _skip_subblocks(raw: bytes, pos: int) -> int:
    while pos < len(raw):
        n = raw[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
    return pos


def _read_subblocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    out = []
    while pos < len(raw):
        n = raw[pos]
        pos += 1
        if n == 0:
            break
        out.append(raw[pos:pos + n])
        pos += n
    return b"".join(out), pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out.reshape(-1)


def _lzw_decode(data: bytes, min_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = min_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    prev: tuple | None = None
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("gif: corrupt LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = entry[:take]
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("gif: LZW stream ended early")
    return out


def decode_gif(raw: bytes) -> np.ndarray | None:
    """First frame -> HxWx3 uint8 RGB (transparency treated opaque)."""
    if len(raw) < 13 or raw[:6] not in _GIF_SIGS:
        return None
    flags = raw[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(raw[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:                     # trailer
            return None
        if b == 0x21:                     # extension: label + sub-blocks
            pos = _skip_subblocks(raw, pos + 2)
            continue
        if b != 0x2C:
            return None                   # corrupt stream
        iw, ih = struct.unpack("<HH", raw[pos + 5:pos + 9])
        iflags = raw[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:                 # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(raw[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            return None
        min_size = raw[pos]
        data, pos = _read_subblocks(raw, pos + 1)
        idx = _lzw_decode(data, min_size, iw * ih)
        if iflags & 0x40:                 # interlaced
            idx = _deinterlace(idx, iw, ih)
        idx = np.minimum(idx, len(pal) - 1)
        return pal[idx].reshape(ih, iw, 3)
    return None


def encode_gif(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB with <= 256 distinct colors -> GIF89a bytes
    (exact palette; uncompressed-LZW literal stream)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    flat = arr.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif requires <= 256 distinct colors")
    # palette size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    psize = 1 << bits
    pad = np.zeros((psize - len(pal), 3), np.uint8)
    ptable = np.concatenate([pal, pad]).tobytes()

    # LZW min code size is fixed at 8 regardless of palette bits (the
    # spec allows min_size >= palette bits): clear = 256, and a clear
    # code every 254 literals keeps the decoder's dictionary below
    # 512, so every code stays exactly 9 bits wide — with a small
    # palette the dictionary would hit the width bump after only
    # (2^(bits+1) - 2^bits - 2) literals and desynchronize
    min_size = 8
    clear = 1 << min_size
    eoi = clear + 1
    width = min_size + 1

    codes: list[int] = [clear]
    for i, v in enumerate(inv):
        if i and i % 254 == 0:
            codes.append(clear)
        codes.append(int(v))
    codes.append(eoi)

    acc = 0
    nbits = 0
    out = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)

    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)

    head = (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | (bits - 1), 0, 0]) + ptable)
    img = (b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
           + bytes([min_size]) + bytes(blocks))
    return head + img + b"\x3B"


def decode_gif_frames(raw: bytes,
                      max_frames: int | None = None) -> list | None:
    """ALL frames -> list of full-canvas HxWx3 uint8 RGB arrays.
    Partial frames composite onto the running canvas at their
    (left, top) offset (disposal methods treated as 'do not dispose' —
    correct for the corpora here and the common web case; background-
    restore disposal would need the GCE walk retained)."""
    if len(raw) < 13 or raw[:6] not in _GIF_SIGS:
        return None
    sw, sh = struct.unpack("<HH", raw[6:10])
    flags = raw[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(raw[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), np.uint8)
    frames: list[np.ndarray] = []
    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos = _skip_subblocks(raw, pos + 2)
            continue
        if b != 0x2C:
            return frames or None
        left, top, iw, ih = struct.unpack("<HHHH", raw[pos + 1:pos + 9])
        iflags = raw[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(raw[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            return frames or None
        min_size = raw[pos]
        data, pos = _read_subblocks(raw, pos + 1)
        idx = _lzw_decode(data, min_size, iw * ih)
        if iflags & 0x40:
            idx = _deinterlace(idx, iw, ih)
        idx = np.minimum(idx, len(pal) - 1)
        region = pal[idx].reshape(ih, iw, 3)
        canvas[top:top + ih, left:left + iw] = region
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames or None


def encode_gif_anim(frames: list) -> bytes:
    """List of same-shape HxWx3 uint8 RGB frames (union of distinct
    colors <= 256) -> animated GIF89a (full-canvas frames, a graphic-
    control extension with a fixed delay before each)."""
    assert frames
    h, w, _ = frames[0].shape
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, inv = np.unique(allpx, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("encode_gif_anim requires <= 256 distinct "
                         "colors across all frames")
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    psize = 1 << bits
    pad = np.zeros((psize - len(pal), 3), np.uint8)
    ptable = np.concatenate([pal, pad]).tobytes()

    out = bytearray(b"GIF89a" + struct.pack("<HH", w, h)
                    + bytes([0x80 | (bits - 1), 0, 0]) + ptable)
    # NETSCAPE loop extension (honest animated-GIF shape)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    fpx = w * h
    for fi in range(len(frames)):
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"   # GCE, 4cs delay
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        seq = inv[fi * fpx:(fi + 1) * fpx]
        out += bytes([8])                            # min_code_size 8
        clear, eoi, width = 256, 257, 9
        codes = [clear]
        for i, v in enumerate(seq):
            if i and i % 254 == 0:
                codes.append(clear)
            codes.append(int(v))
        codes.append(eoi)
        acc = nbits = 0
        packed = bytearray()
        for code in codes:
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                packed.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            packed.append(acc & 0xFF)
        for i in range(0, len(packed), 255):
            chunk = packed[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3B"
    return bytes(out)
