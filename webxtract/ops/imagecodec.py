"""Pure-numpy image codecs for the multimodal stages.

No PIL/ffmpeg exists in this environment, but uncompressed raster
formats need neither: BMP (24-bit BITMAPINFOHEADER) and binary PPM (P6)
are parsed directly from bytes with numpy. This upgrades the media
pipeline from "fake header only" to REAL decode for real formats —
compressed codecs (JPEG/PNG/video) remain explicitly stubbed.

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
    return None


def decode_image(raw: bytes | None) -> np.ndarray | None:
    """Decode any supported uncompressed format to HxWx3 uint8 RGB."""
    kind = sniff(raw)
    if kind == "bmp":
        return decode_bmp24(raw)
    if kind == "ppm":
        return decode_ppm(raw)
    return None


def image_dims(raw: bytes | None) -> tuple[int, int] | None:
    """(width, height) from headers only — no pixel pass."""
    kind = sniff(raw)
    if kind == "bmp":
        return bmp_dims(raw)
    if kind == "ppm":
        return ppm_dims(raw)
    return None


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    h, w = arr.shape[:2]
    yi = np.minimum((np.arange(height) * h) // height, h - 1)
    xi = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[yi[:, None], xi[None, :]]
