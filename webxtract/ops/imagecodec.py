"""Pure-numpy image codecs for the multimodal stages.

No PIL/ffmpeg exists in this environment, but raster formats need
neither: BMP (24-bit BITMAPINFOHEADER) and binary PPM (P6) are parsed
directly from bytes with numpy, PNG (8-bit, all five color types,
non-interlaced) decodes with stdlib zlib inflate + per-scanline
unfilter, baseline JPEG (sequential DCT, SOF0) decodes with the
pure-numpy ITU-T T.81 implementation in ops/jpegcodec.py, and GIF
(87a/89a first frame, full variable-width LZW + interlace) decodes in
ops/gifcodec.py. Containerized video (mp4/mkv/webm) remains the one
honest env gap (needs ffmpeg); raw MJPEG is real in ops/media.py.

All functions are driver/worker-agnostic pure functions; the Ray
stages in ops/media.py wrap them.
"""

from __future__ import annotations

import struct

import numpy as np

# --- PPM (P6, binary, maxval 255) -----------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary P6 PPM bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_header(raw: bytes) -> tuple[int, int, int] | None:
    """Parse 'P6 <w> <h> <maxval>' allowing comments; returns
    (w, h, pixel_offset) or None."""
    if not raw.startswith(b"P6"):
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(raw):
        ch = raw[pos:pos + 1]
        if ch in b" \t\r\n":
            pos += 1
        elif ch == b"#":
            nl = raw.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        elif ch.isdigit():
            end = pos
            while end < len(raw) and raw[end:end + 1].isdigit():
                end += 1
            fields.append(int(raw[pos:end]))
            pos = end
        else:
            return None
    if len(fields) < 3 or fields[2] != 255:
        return None
    return fields[0], fields[1], pos + 1  # one whitespace after maxval


def decode_ppm(raw: bytes) -> np.ndarray | None:
    hdr = _ppm_header(raw)
    if hdr is None:
        return None
    w, h, off = hdr
    need = w * h * 3
    body = raw[off:off + need]
    if len(body) < need:
        return None
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def ppm_dims(raw: bytes) -> tuple[int, int] | None:
    hdr = _ppm_header(raw)
    return None if hdr is None else (hdr[0], hdr[1])


# --- BMP (BITMAPINFOHEADER, 24bpp, uncompressed) ---------------------------


def encode_bmp24(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) -> 24-bit bottom-up BMP bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    img_size = stride * h
    # pixel data: bottom-up rows, BGR order, rows padded to 4 bytes
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = bgr.reshape(h, row_raw)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def bmp_dims(raw: bytes) -> tuple[int, int] | None:
    """(width, height) from the BMP info header (no pixel decode)."""
    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    w, h = struct.unpack_from("<ii", raw, 18)
    return abs(w), abs(h)


def decode_bmp24(raw: bytes) -> np.ndarray | None:
    """24bpp uncompressed BMP -> HxWx3 uint8 RGB (top-down), or None
    for anything this decoder does not handle (other depths,
    compression, missing data)."""
    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = stride * h
    body = raw[data_off:data_off + need]
    if len(body) < need:
        return None
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


# --- PNG (8-bit, pure stdlib: zlib inflate + per-scanline unfilter) --------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 8-bit truecolor PNG (filter-0 scanlines,
    deterministic zlib level 9) — a real, spec-valid writer used by the
    round-trip tests and the synthetic multimodal corpus."""
    import zlib

    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    lines = np.zeros((h, 1 + w * 3), np.uint8)
    lines[:, 1:] = arr.reshape(h, w * 3)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(lines.tobytes(), 9))
            + chunk(b"IEND", b""))


def _png_chunks(raw: bytes):
    """Yield (tag, data) with CRC verification; stops at IEND."""
    import zlib

    pos = 8
    while pos + 12 <= len(raw):
        (ln,) = struct.unpack_from(">I", raw, pos)
        tag = raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + ln]
        if len(data) < ln or pos + 12 + ln > len(raw):
            return
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            return
        yield tag, data
        if tag == b"IEND":
            return
        pos += 12 + ln


def png_dims(raw: bytes) -> tuple[int, int] | None:
    """(width, height) from IHDR only — no inflate, no pixel pass."""
    if not raw.startswith(_PNG_SIG) or len(raw) < 24 \
            or raw[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", raw, 16)
    return w, h


def _unfilter(lines: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters. None/Sub/Up are vectorized (Sub is
    a wrapping per-byte-lane prefix sum; Up a wrapping row add);
    Average/Paeth carry a genuine per-pixel recurrence on the SAME row
    and fall back to a per-byte loop — encoders here emit filter 0, so
    the loop only runs on foreign files."""
    h = lines.shape[0]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        line = lines[y, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub
            rec = line.copy()
            for o in range(bpp):
                rec[o::bpp] = np.add.accumulate(rec[o::bpp],
                                                dtype=np.uint8)
        elif f == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x])
                          + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            return None
        out[y] = rec
        prev = rec
    return out


def decode_png(raw: bytes) -> np.ndarray | None:
    """8-bit non-interlaced PNG -> HxWx3 uint8 RGB. Handles color types
    0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha) and 6 (RGBA) —
    alpha is dropped, gray/palette expanded. Returns None for anything
    else (16-bit, Adam7 interlace, corrupt CRC/stream) — callers treat
    that as an ok=False DATA row, never a task failure."""
    import zlib

    if not raw.startswith(_PNG_SIG):
        return None
    w = h = None
    ctype = None
    plte = None
    idat: list[bytes] = []
    for tag, data in _png_chunks(raw):
        if tag == b"IHDR":
            if len(data) != 13:
                return None
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or comp or filt or interlace \
                    or ctype not in _PNG_CHANNELS:
                return None
        elif tag == b"PLTE":
            if len(data) % 3:
                return None
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
    if w is None or not w or not h or not idat:
        return None
    try:
        dec = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    if len(dec) != h * (stride + 1):
        return None
    lines = np.frombuffer(dec, np.uint8).reshape(h, stride + 1)
    out = _unfilter(lines, stride, ch)
    if out is None:
        return None
    if ctype == 2:
        return out.reshape(h, w, 3)
    if ctype == 0:
        g = out.reshape(h, w)
        return np.repeat(g[:, :, None], 3, axis=2)
    if ctype == 3:
        if plte is None or (out.max() if out.size else 0) >= len(plte):
            return None
        return plte[out.reshape(h, w)]
    if ctype == 4:
        g = out.reshape(h, w, 2)[:, :, 0]
        return np.repeat(g[:, :, None], 3, axis=2)
    return out.reshape(h, w, 4)[:, :, :3].copy()  # ctype 6


# --- dispatch --------------------------------------------------------------


def sniff(raw: bytes | None) -> str | None:
    if not raw:
        return None
    if raw.startswith(b"BM"):
        return "bmp"
    if raw.startswith(b"P6"):
        return "ppm"
    if raw.startswith(b"\x89PNG"):
        return "png"
    if raw.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if raw.startswith(b"GIF87a") or raw.startswith(b"GIF89a"):
        return "gif"
    if raw.startswith(b"II\x2a\x00") or raw.startswith(b"MM\x00\x2a"):
        return "tiff"
    return None


def decode_image(raw: bytes | None) -> np.ndarray | None:
    """Decode any supported format to HxWx3 uint8 RGB (BMP/PPM
    uncompressed, PNG via stdlib zlib, baseline JPEG via the pure-numpy
    T.81 decoder in ops/jpegcodec)."""
    kind = sniff(raw)
    if kind == "bmp":
        return decode_bmp24(raw)
    if kind == "ppm":
        return decode_ppm(raw)
    if kind == "png":
        return decode_png(raw)
    if kind == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(raw)
    if kind == "gif":
        from .gifcodec import decode_gif

        return decode_gif(raw)
    if kind == "tiff":
        from .tiffcodec import decode_tiff

        g = decode_tiff(raw)
        return None if g is None else np.repeat(g[:, :, None], 3, axis=2)
    return None


def image_dims(raw: bytes | None) -> tuple[int, int] | None:
    """(width, height) from headers only — no pixel pass."""
    kind = sniff(raw)
    if kind == "bmp":
        return bmp_dims(raw)
    if kind == "ppm":
        return ppm_dims(raw)
    if kind == "png":
        return png_dims(raw)
    if kind == "jpeg":
        from .jpegcodec import jpeg_dims

        return jpeg_dims(raw)
    if kind == "gif":
        from .gifcodec import gif_dims

        return gif_dims(raw)
    if kind == "tiff":
        from .tiffcodec import tiff_dims

        return tiff_dims(raw)
    return None


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[yi[:, None], xi[None, :]]
