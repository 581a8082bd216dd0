"""Baseline TIFF image decode WITHOUT PIL — strips, PackBits and the
TIFF-variant LZW, from the public TIFF 6.0 spec.

Completes the TIFF story the EXIF channel (ops/exif.py) opened: the
same from-scratch IFD walk now reads the image tags (StripOffsets /
StripByteCounts / RowsPerStrip / Compression / Photometric) and
decodes the pixel data itself, so crawled ``image/tiff`` payloads get
real pixels like BMP/PPM/PNG/GIF/JPEG already do — feeding the same
resize / feature / perceptual-hash dedup stages.

  * `build_tiff_image` — a writer emitting genuine multi-strip
    grayscale TIFFs (II/MM, Compression 1 = none, 32773 = PackBits,
    5 = LZW with the spec's early-change and MSB-first code packing),
    so the decoder is certified against files it did not "remember".
  * `packbits_encode/decode` — the Apple RLE scheme TIFF 6.0 §9.
  * `lzw_encode/decode` — TIFF 6.0 §13: 9->12-bit variable codes,
    ClearCode 256 / EOI 257, table reset at 4094, and the notorious
    EARLY-CHANGE (code width bumps one code before the table fills).
  * `decode_tiff` — IFD walk -> strip assembly -> H x W uint8 array;
    malformed input returns None (poison-row rule upstream).

Scale shape: one image one row, decode map-side, zero exchanges —
identical to the other codecs in ops/imagecodec.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .exif import _IfdBuilder, _read_ifd

TAG_WIDTH = 0x0100
TAG_HEIGHT = 0x0101
TAG_BITS = 0x0102
TAG_COMPRESSION = 0x0103
TAG_PHOTOMETRIC = 0x0106
TAG_STRIP_OFFSETS = 0x0111
TAG_SPP = 0x0115
TAG_ROWS_PER_STRIP = 0x0116
TAG_STRIP_BYTES = 0x0117

COMP_NONE = 1
COMP_LZW = 5
COMP_PACKBITS = 32773


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append((257 - run) & 0xFF)  # -(run-1) as signed byte
            out.append(data[i])
            i += run
        else:
            # literal stretch until the next >=3 run (spec recommends
            # not breaking a literal for a 2-run)
            j = i + 1
            while j < n and j - i < 128:
                r = 1
                while j + r < n and r < 3 and data[j + r] == data[j]:
                    r += 1
                if r >= 3:
                    break
                j += 1
            out.append(j - i - 1)
            out.extend(data[i:j])
            i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:          # literal of b+1 bytes
            out.extend(data[i:i + b + 1])
            i += b + 1
        elif b > 128:        # repeat next byte 257-b times
            if i < n:
                out.extend(bytes([data[i]]) * (257 - b))
                i += 1
        # 128 = NOP per spec
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# TIFF LZW (TIFF 6.0 §13 — MSB-first, early change)
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


class _BitPackerMSB:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def lzw_encode(data: bytes) -> bytes:
    bw = _BitPackerMSB()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bw.put(_CLEAR, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        wc = w + c
        if wc in table:
            w = wc
            continue
        bw.put(table[w], width)
        table[wc] = next_code
        next_code += 1
        # EARLY CHANGE: width bumps when next_code reaches 2^width - 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            bw.put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        bw.put(table[w], width)
    bw.put(_EOI, width)
    return bw.flush()


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):       # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out.extend(entry)
        prev = entry
        # EARLY CHANGE, decoder side: the encoder bumps after ASSIGNING
        # code 2^n - 2 (its next_code hits 2^n - 1), and the decoder's
        # table trails the encoder's by exactly one entry — so the bump
        # lands at table length 2^n - 2 (510 / 1022 / 2046)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def build_tiff_image(arr: np.ndarray, *, compression: int = COMP_NONE,
                     endian: str = "<", rows_per_strip: int = 8) -> bytes:
    """Real multi-strip grayscale (8-bit BlackIsZero) TIFF bytes."""
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("expected HxW uint8 grayscale")
    h, w = arr.shape
    strips_raw = [arr[y:y + rows_per_strip].tobytes()
                  for y in range(0, h, rows_per_strip)]
    if compression == COMP_NONE:
        strips = strips_raw
    elif compression == COMP_PACKBITS:
        strips = [packbits_encode(s) for s in strips_raw]
    elif compression == COMP_LZW:
        strips = [lzw_encode(s) for s in strips_raw]
    else:
        raise ValueError(f"unsupported compression {compression}")

    def render(offsets: list[int]) -> tuple[bytes, bytes]:
        ifd = _IfdBuilder(endian)
        ifd.short(TAG_WIDTH, w)
        ifd.short(TAG_HEIGHT, h)
        ifd.short(TAG_BITS, 8)
        ifd.short(TAG_COMPRESSION, compression)
        ifd.short(TAG_PHOTOMETRIC, 1)  # BlackIsZero
        ifd.longs(TAG_STRIP_OFFSETS, offsets)
        ifd.short(TAG_SPP, 1)
        ifd.short(TAG_ROWS_PER_STRIP, rows_per_strip)
        ifd.longs(TAG_STRIP_BYTES, [len(s) for s in strips])
        return ifd.render(8, 8 + ifd.size(), 0)

    head, vals = render([0] * len(strips))
    base = 8 + len(head) + len(vals)
    offs = []
    acc = base
    for s in strips:
        offs.append(acc)
        acc += len(s)
    head, vals = render(offs)
    hdr = (b"II" if endian == "<" else b"MM") \
        + struct.pack(endian + "H", 42) + struct.pack(endian + "I", 8)
    return hdr + head + vals + b"".join(strips)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_tiff(data: bytes) -> np.ndarray | None:
    """Grayscale baseline TIFF -> HxW uint8, or None if unsupported or
    malformed (the in-repo codec convention)."""
    try:
        if data[:2] == b"II":
            e = "<"
        elif data[:2] == b"MM":
            e = ">"
        else:
            return None
        (magic,) = struct.unpack_from(e + "H", data, 2)
        if magic != 42:
            return None
        (off,) = struct.unpack_from(e + "I", data, 4)
        ifd, _ = _read_ifd(data, e, off, 0, set())
        w = int(ifd.get(TAG_WIDTH) or 0)
        h = int(ifd.get(TAG_HEIGHT) or 0)
        comp = int(ifd.get(TAG_COMPRESSION) or COMP_NONE)
        bits = ifd.get(TAG_BITS, 8)
        spp = int(ifd.get(TAG_SPP) or 1)
        if w <= 0 or h <= 0 or spp != 1 or (bits not in (8, [8])):
            return None
        rps = int(ifd.get(TAG_ROWS_PER_STRIP) or h)
        offs = ifd.get(TAG_STRIP_OFFSETS)
        cnts = ifd.get(TAG_STRIP_BYTES)
        if offs is None or cnts is None:
            return None
        if isinstance(offs, int):
            offs = [offs]
        if isinstance(cnts, int):
            cnts = [cnts]
        out = bytearray()
        for si, (o, c) in enumerate(zip(offs, cnts)):
            nrows = min(rps, h - si * rps)
            expected = nrows * w
            raw = data[int(o):int(o) + int(c)]
            if comp == COMP_NONE:
                out.extend(raw[:expected])
            elif comp == COMP_PACKBITS:
                out.extend(packbits_decode(raw, expected))
            elif comp == COMP_LZW:
                out.extend(lzw_decode(raw, expected))
            else:
                return None
        if len(out) != w * h:
            return None
        return np.frombuffer(bytes(out), np.uint8).reshape(h, w)
    except Exception:  # noqa: BLE001 — poison-row rule
        return None


# ---------------------------------------------------------------------------
# query surface
# ---------------------------------------------------------------------------


def fixture_tiff(i: int) -> bytes:
    """Deterministic grayscale TIFF for doc_id ``i``: pixel(k) =
    (k + 7*i) % 256 row-major over (16 + i%3) x (24 + i%5), so the
    pixel SUM has a pure closed form; compression cycles none /
    PackBits / LZW, byte order and strip height vary."""
    h, w = 16 + i % 3, 24 + i % 5
    arr = ((np.arange(h * w, dtype=np.int64) + 7 * i) % 256) \
        .astype(np.uint8).reshape(h, w)
    comp = (COMP_NONE, COMP_PACKBITS, COMP_LZW)[i % 3]
    return build_tiff_image(arr, compression=comp,
                            endian="<" if i % 2 else ">",
                            rows_per_strip=5 + i % 4)


def _render_tiff_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_tiff(i) for i in ids],
                                       pa.binary())})


def synth_tiff_corpus(sf_dir: str, n: int | None = None):
    from ..fixturecache import cached_ds
    import ray.data as rd

    def build():
        ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])
        if n is not None:
            ids = ids.limit(n)
        try:
            import ray
            ids = ids.repartition(
                max(2, int(ray.cluster_resources().get("CPU", 8))))
        except Exception:
            pass
        return ids.map_batches(_render_tiff_fixture,
                               batch_format="pyarrow", batch_size=64)

    if n is None:
        return cached_ds("tiff_corpus", sf_dir, build,
                         render_fn=_render_tiff_fixture)
    return build()


class DecodeTIFF:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out = {"media_id": [], "ok": [], "width": [], "height": [],
               "compression": [], "pixel_sum": []}
        for i, b in zip(ids, blobs):
            arr = decode_tiff(b)
            out["media_id"].append(i)
            if arr is None:
                out["ok"].append(False)
                out["width"].append(0)
                out["height"].append(0)
                out["compression"].append(0)
                out["pixel_sum"].append(0)
                continue
            comp = COMP_NONE
            try:
                e = "<" if b[:2] == b"II" else ">"
                (off,) = struct.unpack_from(e + "I", b, 4)
                ifd, _ = _read_ifd(b, e, off, 0, set())
                comp = int(ifd.get(TAG_COMPRESSION) or COMP_NONE)
            except Exception:  # noqa: BLE001
                pass
            out["ok"].append(True)
            out["height"].append(arr.shape[0])
            out["width"].append(arr.shape[1])
            out["compression"].append(comp)
            out["pixel_sum"].append(int(arr.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "ok": pa.array(out["ok"], pa.bool_()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "compression": pa.array(out["compression"], pa.int64()),
            "pixel_sum": pa.array(out["pixel_sum"], pa.int64()),
        })


def images_tiff_decode(sf_dir: str):
    """ORACLED: decode the mixed-compression TIFF corpus and report
    (width, height, compression, pixel_sum) — the sum over the
    closed-form pixel pattern certifies EVERY pixel of every strip
    through PackBits and LZW (a single wrong byte shifts the sum),
    across both byte orders and varying strip heights."""
    dec = DecodeTIFF()
    ds = synth_tiff_corpus(sf_dir).map_batches(
        lambda b: dec(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
    return ds.select_columns(["media_id", "width", "height",
                              "compression", "pixel_sum"])


def tiff_dims(raw: bytes | None) -> tuple[int, int] | None:
    """(width, height) from the IFD only — no strip pass (the
    image_dims convention in ops/imagecodec.py)."""
    try:
        e = "<" if raw[:2] == b"II" else ">"
        (off,) = struct.unpack_from(e + "I", raw, 4)
        ifd, _ = _read_ifd(raw, e, off, 0, set())
        w = int(ifd.get(TAG_WIDTH) or 0)
        h = int(ifd.get(TAG_HEIGHT) or 0)
        return (w, h) if w > 0 and h > 0 else None
    except Exception:  # noqa: BLE001
        return None
