"""EXIF / TIFF metadata parsing WITHOUT PIL/exifread — pure-spec IFD walk.

Crawled images carry their provenance in EXIF: orientation (which a
dedup/feature pipeline must honor before hashing pixels), capture
time, camera make/model, GPS position.  The in-repo image surface
decodes pixels (BMP/PPM/PNG/GIF/JPEG) but had no metadata channel;
this module adds it the established container-format way (mp4/mkv/
avi/mpegts/pdf): a from-scratch *writer* so fixtures are REAL files,
a from-public-spec parser (TIFF 6.0 + Exif 2.32 + JPEG APP1
embedding), and a probe that degrades malformed input to ok=False
DATA rows.

  * `build_tiff_exif` — writes a genuine TIFF byte stream: II/MM
    endianness, IFD0 with ascending tags, inline vs offset values,
    ASCII/SHORT/LONG/RATIONAL types, the Exif sub-IFD (0x8769), the
    GPS IFD (0x8825) with degree/minute/second RATIONAL triples, and
    an optional chained IFD1 (the thumbnail-directory convention).
  * `embed_exif_jpeg` — splices the TIFF blob into a real JPEG as the
    APP1 "Exif\\0\\0" segment right after SOI (the Exif spec's
    placement).
  * `parse_exif` — sniffs carrier (bare TIFF vs JPEG), walks the
    IFD chain + sub-IFDs with cycle/depth guards, decodes the
    portable tag set, and normalizes GPS to signed integer
    arc-seconds (deterministic; no float drift).

Scale shape: one image is one row; the walk touches only the ~KB
metadata head — map-side, zero exchanges, file-parallel like the
other container probes.

Reference mapping: part of the beyond-reference multimodal surface
(image columns with typed metadata) the task brief mandates; the
reference treats images as opaque OCR inputs (SURVEY.md §2 M5).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# TIFF field types
_ASCII, _SHORT, _LONG, _RATIONAL = 2, 3, 4, 5
_TYPE_SIZE = {1: 1, _ASCII: 1, _SHORT: 2, _LONG: 4, _RATIONAL: 8,
              6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

TAG_WIDTH = 0x0100
TAG_HEIGHT = 0x0101
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_DT_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
GPS_LAT_REF = 0x0001
GPS_LAT = 0x0002
GPS_LON_REF = 0x0003
GPS_LON = 0x0004


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


class _IfdBuilder:
    """One IFD: entries (tag-ascending per TIFF 6.0 §2) + a shared
    out-of-line data area appended after all IFDs."""

    def __init__(self, endian: str):
        self.e = endian
        self.entries: list[tuple[int, int, int, bytes | None, bytes]] = []
        # (tag, type, count, inline4 | None, outofline_payload)

    def ascii(self, tag: int, s: str) -> None:
        b = s.encode("latin-1") + b"\x00"
        if len(b) <= 4:
            self.entries.append((tag, _ASCII, len(b), b.ljust(4, b"\x00"),
                                 b""))
        else:
            self.entries.append((tag, _ASCII, len(b), None, b))

    def short(self, tag: int, v: int) -> None:
        self.entries.append((tag, _SHORT, 1,
                             struct.pack(self.e + "H", v).ljust(4, b"\x00"),
                             b""))

    def long(self, tag: int, v: int) -> None:
        self.entries.append((tag, _LONG, 1, struct.pack(self.e + "I", v),
                             b""))

    def longs(self, tag: int, vals: list[int]) -> None:
        if len(vals) == 1:
            self.long(tag, vals[0])
            return
        payload = b"".join(struct.pack(self.e + "I", v) for v in vals)
        self.entries.append((tag, _LONG, len(vals), None, payload))

    def rationals(self, tag: int, vals: list[tuple[int, int]]) -> None:
        payload = b"".join(struct.pack(self.e + "II", n, d)
                           for n, d in vals)
        self.entries.append((tag, _RATIONAL, len(vals), None, payload))

    def size(self) -> int:
        return 2 + 12 * len(self.entries) + 4

    def render(self, my_off: int, data_off: int,
               next_ifd: int) -> tuple[bytes, bytes]:
        head = struct.pack(self.e + "H", len(self.entries))
        data = bytearray()
        for tag, typ, cnt, inline, payload in sorted(self.entries):
            head += struct.pack(self.e + "HHI", tag, typ, cnt)
            if inline is not None:
                head += inline
            else:
                head += struct.pack(self.e + "I", data_off + len(data))
                data += payload
                if len(data) % 2:
                    data += b"\x00"  # word-align per spec
        head += struct.pack(self.e + "I", next_ifd)
        return head, bytes(data)


def build_tiff_exif(*, endian: str = "<", width: int, height: int,
                    make: str, model: str, orientation: int,
                    datetime: str, dt_original: str | None = None,
                    gps: tuple | None = None,
                    thumbnail_ifd: bool = False) -> bytes:
    """Real TIFF bytes carrying the EXIF tag set.

    gps: (lat_ref, [(d,1),(m,1),(s,1)], lon_ref, [...]) or None.
    dt_original -> an Exif sub-IFD (0x8769); thumbnail_ifd chains an
    IFD1 with thumbnail dims (the classic layout).
    """
    e = endian
    ifd0 = _IfdBuilder(e)
    ifd0.short(TAG_WIDTH, width)
    ifd0.short(TAG_HEIGHT, height)
    ifd0.ascii(TAG_MAKE, make)
    ifd0.ascii(TAG_MODEL, model)
    ifd0.short(TAG_ORIENTATION, orientation)
    ifd0.ascii(TAG_DATETIME, datetime)
    exif = gpsd = ifd1 = None
    if dt_original is not None:
        exif = _IfdBuilder(e)
        exif.ascii(TAG_DT_ORIGINAL, dt_original)
        exif.long(TAG_PIXEL_X, width)
        exif.long(TAG_PIXEL_Y, height)
    if gps is not None:
        lat_ref, lat, lon_ref, lon = gps
        gpsd = _IfdBuilder(e)
        gpsd.ascii(GPS_LAT_REF, lat_ref)
        gpsd.rationals(GPS_LAT, lat)
        gpsd.ascii(GPS_LON_REF, lon_ref)
        gpsd.rationals(GPS_LON, lon)
    if thumbnail_ifd:
        ifd1 = _IfdBuilder(e)
        ifd1.short(TAG_WIDTH, max(1, width // 8))
        ifd1.short(TAG_HEIGHT, max(1, height // 8))

    # reserve the pointer tags FIRST so IFD0's size is final, then lay
    # out: header(8) | IFD0 | [ExifIFD] | [GPSIFD] | [IFD1] | data
    if exif is not None:
        ifd0.long(TAG_EXIF_IFD, 0)
    if gpsd is not None:
        ifd0.long(TAG_GPS_IFD, 0)
    off = 8
    ifd0_off = off
    off += ifd0.size()
    exif_off = gps_off = ifd1_off = 0
    if exif is not None:
        exif_off = off
        off += exif.size()
    if gpsd is not None:
        gps_off = off
        off += gpsd.size()
    if ifd1 is not None:
        ifd1_off = off
        off += ifd1.size()
    data_off = off
    ifd0.entries = [t for t in ifd0.entries
                    if t[0] not in (TAG_EXIF_IFD, TAG_GPS_IFD)]
    if exif is not None:
        ifd0.long(TAG_EXIF_IFD, exif_off)
    if gpsd is not None:
        ifd0.long(TAG_GPS_IFD, gps_off)

    # data areas are appended per-IFD after ALL directory blocks
    parts: list[bytes] = []
    cur_data = data_off
    head0, d0 = ifd0.render(ifd0_off, cur_data, ifd1_off)
    cur_data += len(d0)
    blocks = [head0]
    datas = [d0]
    for b in (exif, gpsd, ifd1):
        if b is None:
            continue
        nxt = 0
        head, d = b.render(0, cur_data, nxt)
        cur_data += len(d)
        blocks.append(head)
        datas.append(d)
    hdr = (b"II" if e == "<" else b"MM") + struct.pack(e + "H", 42) \
        + struct.pack(e + "I", ifd0_off)
    return hdr + b"".join(blocks) + b"".join(datas)


def embed_exif_jpeg(jpeg: bytes, tiff: bytes) -> bytes:
    """Splice the TIFF blob as the APP1 Exif segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    payload = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _read_ifd(data: bytes, e: str, off: int, depth: int,
              seen: set) -> tuple[dict, int]:
    """-> ({tag: value}, next_ifd_offset). Values decoded per type."""
    if depth > 4 or off in seen or off + 2 > len(data):
        raise ValueError("bad IFD offset")
    seen.add(off)
    (n,) = struct.unpack_from(e + "H", data, off)
    if n > 512:
        raise ValueError("implausible IFD entry count")
    tags: dict[int, object] = {}
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(data):
            raise ValueError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, pos)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, pos + 8)
        if voff + size > len(data):
            pos += 12
            continue  # unreadable value: skip the tag, keep the row
        if typ == _ASCII:
            raw = data[voff:voff + cnt]
            tags[tag] = raw.split(b"\x00", 1)[0].decode("latin-1",
                                                        "replace")
        elif typ == _SHORT:
            tags[tag] = list(struct.unpack_from(e + f"{cnt}H", data, voff)) \
                if cnt > 1 else struct.unpack_from(e + "H", data, voff)[0]
        elif typ == _LONG:
            tags[tag] = list(struct.unpack_from(e + f"{cnt}I", data, voff)) \
                if cnt > 1 else struct.unpack_from(e + "I", data, voff)[0]
        elif typ == _RATIONAL:
            vals = []
            for k in range(cnt):
                num, den = struct.unpack_from(e + "II", data, voff + 8 * k)
                vals.append((num, den))
            tags[tag] = vals
        pos += 12
    (nxt,) = struct.unpack_from(e + "I", data, pos)
    return tags, nxt


def _gps_arcsec(triple, ref: str, neg_ref: str) -> int | None:
    try:
        d = triple[0][0] // max(1, triple[0][1])
        m = triple[1][0] // max(1, triple[1][1])
        s = triple[2][0] // max(1, triple[2][1])
    except Exception:  # noqa: BLE001
        return None
    v = d * 3600 + m * 60 + s
    return -v if ref == neg_ref else v


def parse_exif(data: bytes) -> dict:
    """Sniff carrier (bare TIFF vs JPEG APP1) and walk the chain."""
    kind = None
    tiff = None
    if data[:2] in (b"II", b"MM") and len(data) >= 8:
        kind, tiff = "tiff", data
    elif data[:2] == b"\xff\xd8":
        kind = "jpeg"
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
                tiff = data[pos + 10:pos + 2 + ln]
                break
            if marker == 0xDA:  # SOS: metadata segments are over
                break
            pos += 2 + ln
        if tiff is None:
            raise ValueError("no Exif APP1 segment")
    else:
        raise ValueError("neither TIFF nor JPEG")

    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte order")
    (magic,) = struct.unpack_from(e + "H", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd0_off,) = struct.unpack_from(e + "I", tiff, 4)
    seen: set = set()
    ifd0, nxt = _read_ifd(tiff, e, ifd0_off, 0, seen)
    n_ifds = 1
    while nxt:
        _, nxt = _read_ifd(tiff, e, nxt, 0, seen)
        n_ifds += 1
    out = {
        "kind": kind, "endian": "II" if e == "<" else "MM",
        "width": int(ifd0.get(TAG_WIDTH) or 0),
        "height": int(ifd0.get(TAG_HEIGHT) or 0),
        "make": ifd0.get(TAG_MAKE, ""),
        "model": ifd0.get(TAG_MODEL, ""),
        "orientation": int(ifd0.get(TAG_ORIENTATION) or 0),
        "datetime": ifd0.get(TAG_DATETIME, ""),
        "dt_original": "", "lat_arcsec": None, "lon_arcsec": None,
        "n_ifds": n_ifds, "n_tags": len(ifd0),
    }
    if TAG_EXIF_IFD in ifd0:
        sub, _ = _read_ifd(tiff, e, int(ifd0[TAG_EXIF_IFD]), 1, seen)
        out["dt_original"] = sub.get(TAG_DT_ORIGINAL, "")
    if TAG_GPS_IFD in ifd0:
        g, _ = _read_ifd(tiff, e, int(ifd0[TAG_GPS_IFD]), 1, seen)
        if GPS_LAT in g and GPS_LAT_REF in g:
            out["lat_arcsec"] = _gps_arcsec(g[GPS_LAT], g[GPS_LAT_REF], "S")
        if GPS_LON in g and GPS_LON_REF in g:
            out["lon_arcsec"] = _gps_arcsec(g[GPS_LON], g[GPS_LON_REF], "W")
    return out


def probe_exif(data: bytes) -> dict:
    """Malformed input -> ok=False DATA row, never a task error."""
    try:
        p = parse_exif(data)
        p["ok"] = True
        p["reason"] = ""
        return p
    except Exception as ex:  # noqa: BLE001 — poison-row rule
        return {"ok": False, "reason": f"{type(ex).__name__}: {ex}"[:200],
                "kind": "", "endian": "", "width": 0, "height": 0,
                "make": "", "model": "", "orientation": 0, "datetime": "",
                "dt_original": "", "lat_arcsec": None, "lon_arcsec": None,
                "n_ifds": 0, "n_tags": 0}


class ProbeEXIF:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        cols: dict[str, list] = {k: [] for k in (
            "media_id", "ok", "kind", "endian", "width", "height", "make",
            "model", "orientation", "datetime", "dt_original",
            "lat_arcsec", "lon_arcsec", "n_ifds", "n_tags")}
        for i, b in zip(ids, blobs):
            p = probe_exif(b)
            cols["media_id"].append(i)
            for k in cols:
                if k != "media_id":
                    cols[k].append(p[k])
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.int64()),
            "ok": pa.array(cols["ok"], pa.bool_()),
            "kind": pa.array(cols["kind"], pa.string()),
            "endian": pa.array(cols["endian"], pa.string()),
            "width": pa.array(cols["width"], pa.int64()),
            "height": pa.array(cols["height"], pa.int64()),
            "make": pa.array(cols["make"], pa.string()),
            "model": pa.array(cols["model"], pa.string()),
            "orientation": pa.array(cols["orientation"], pa.int64()),
            "datetime": pa.array(cols["datetime"], pa.string()),
            "dt_original": pa.array(cols["dt_original"], pa.string()),
            "lat_arcsec": pa.array(cols["lat_arcsec"], pa.int64()),
            "lon_arcsec": pa.array(cols["lon_arcsec"], pa.int64()),
            "n_ifds": pa.array(cols["n_ifds"], pa.int64()),
            "n_tags": pa.array(cols["n_tags"], pa.int64()),
        })


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def fixture_exif(i: int) -> bytes:
    """One deterministic EXIF carrier for doc_id ``i``; every probed
    field closed-form:

      carrier    i%2 -> 0: bare TIFF, 1: real JPEG + APP1
      endian     MM when i%3==0 else II
      width      640 + i%17 ; height 480 + i%11
      make       'Make' || i%7 ; model 'Model' || i%13
      orient     1 + i%8
      datetime   '2020:01:DD HH:00:00' (DD = 1+i%28, HH = i%24)
      exif IFD   present when i%4 != 1 (dt_original 2021:06:...)
      gps IFD    present when i%4 != 2; lat (i%90, 7i%60, i%60) signed
                 by i%2 (S negative); lon (i%180, 11i%60, 13i%60)
                 signed by i%3==0 (W negative)
      IFD1       chained thumbnail directory when i%5==0
    """
    dd, hh = 1 + i % 28, i % 24
    exif_present = i % 4 != 1
    gps_present = i % 4 != 2
    gps = None
    if gps_present:
        lat = [(i % 90, 1), ((7 * i) % 60, 1), (i % 60, 1)]
        lon = [(i % 180, 1), ((11 * i) % 60, 1), ((13 * i) % 60, 1)]
        gps = ("N" if i % 2 == 0 else "S", lat,
               "W" if i % 3 == 0 else "E", lon)
    tiff = build_tiff_exif(
        endian=">" if i % 3 == 0 else "<",
        width=640 + i % 17, height=480 + i % 11,
        make=f"Make{i % 7}", model=f"Model{i % 13}",
        orientation=1 + i % 8,
        datetime=f"2020:01:{dd:02d} {hh:02d}:00:00",
        dt_original=(f"2021:06:{1 + i % 30:02d} 12:00:00"
                     if exif_present else None),
        gps=gps, thumbnail_ifd=i % 5 == 0)
    if i % 2 == 0:
        return tiff
    from .jpegcodec import encode_jpeg

    rng = np.random.default_rng(i)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    return embed_exif_jpeg(encode_jpeg(img, quality=80), tiff)


def _render_exif_fixture(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    return pa.table({"media_id": pa.array(ids, pa.int64()),
                     "media": pa.array([fixture_exif(i) for i in ids],
                                       pa.binary())})


def synth_exif_corpus(sf_dir: str, n: int | None = None):
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
        return ids.map_batches(_render_exif_fixture,
                               batch_format="pyarrow", batch_size=64)

    if n is None:
        return cached_ds("exif_corpus", sf_dir, build,
                         render_fn=_render_exif_fixture)
    return build()


def images_exif_probe(sf_dir: str):
    """ORACLED: EXIF probe of the mixed-carrier corpus — every field
    (endianness, dims, make/model, orientation, timestamps, signed GPS
    arc-seconds, IFD/tag counts) closed-form from doc_id.  A parity
    hash certifies the complete TIFF IFD walk (II and MM, inline and
    offset values, RATIONAL triples, Exif + GPS sub-IFDs, the chained
    thumbnail IFD) and the JPEG APP1 extraction."""
    probe = ProbeEXIF()
    ds = synth_exif_corpus(sf_dir).map_batches(
        lambda b: probe(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
    return ds.select_columns(["media_id", "kind", "endian", "width",
                              "height", "make", "model", "orientation",
                              "datetime", "dt_original", "lat_arcsec",
                              "lon_arcsec", "n_ifds", "n_tags"])
