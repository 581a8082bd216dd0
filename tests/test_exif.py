"""EXIF/TIFF parser (ops/exif.py): IFD walk round trips over both byte
orders, inline vs offset values, sub-IFDs, carrier handling, and
malformed-input degradation."""

import struct

import numpy as np
import pytest

from webxtract.ops.exif import (
    build_tiff_exif, embed_exif_jpeg, fixture_exif, parse_exif, probe_exif,
)


def _basic(**kw):
    args = dict(width=800, height=600, make="AB", model="Cam 9000",
                orientation=6, datetime="2022:05:04 10:20:30")
    args.update(kw)
    return build_tiff_exif(**args)


@pytest.mark.parametrize("endian,label", [("<", "II"), (">", "MM")])
def test_roundtrip_both_byte_orders(endian, label):
    p = parse_exif(_basic(endian=endian))
    assert p["endian"] == label
    assert (p["width"], p["height"]) == (800, 600)
    assert p["make"] == "AB"          # <=4 byte ASCII: INLINE value path
    assert p["model"] == "Cam 9000"   # >4 byte ASCII: OFFSET value path
    assert p["orientation"] == 6
    assert p["datetime"] == "2022:05:04 10:20:30"
    assert p["n_ifds"] == 1


def test_exif_subifd_and_gps():
    gps = ("S", [(12, 1), (34, 1), (56, 1)], "E", [(100, 1), (2, 1), (3, 1)])
    p = parse_exif(_basic(dt_original="2019:01:01 00:00:00", gps=gps))
    assert p["dt_original"] == "2019:01:01 00:00:00"
    assert p["lat_arcsec"] == -(12 * 3600 + 34 * 60 + 56)
    assert p["lon_arcsec"] == 100 * 3600 + 2 * 60 + 3
    assert p["n_tags"] == 8  # 6 base + 2 pointer tags


def test_rational_denominators():
    # non-unit denominators floor-divide (deterministic integer policy)
    gps = ("N", [(90, 2), (120, 4), (30, 10)], "E", [(0, 1), (0, 1), (0, 1)])
    p = parse_exif(_basic(gps=gps))
    assert p["lat_arcsec"] == 45 * 3600 + 30 * 60 + 3


def test_thumbnail_ifd_chain():
    p = parse_exif(_basic(thumbnail_ifd=True))
    assert p["n_ifds"] == 2


def test_jpeg_carrier_after_other_segments():
    """APP1 must be found even when other marker segments precede it
    (real files put JFIF APP0 / DQT before Exif)."""
    from webxtract.ops.jpegcodec import decode_jpeg, encode_jpeg

    img = np.zeros((16, 16, 3), np.uint8)
    jpeg = encode_jpeg(img, quality=75)
    tiff = _basic()
    # splice APP1 after the first existing segment (DQT here), not
    # right after SOI — the walk must skip past foreign segments
    (seg1_len,) = struct.unpack_from(">H", jpeg, 4)
    cut = 4 + seg1_len
    payload = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    carrier = jpeg[:cut] + seg + jpeg[cut:]
    p = parse_exif(carrier)
    assert p["kind"] == "jpeg" and p["width"] == 800
    # and the carrier still decodes as an image
    assert decode_jpeg(carrier) is not None


def test_jpeg_without_exif_is_error_row():
    from webxtract.ops.jpegcodec import encode_jpeg

    jpeg = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    p = probe_exif(jpeg)
    assert p["ok"] is False and "APP1" in p["reason"]


def test_embedded_carrier_still_decodes():
    from webxtract.ops.jpegcodec import decode_jpeg

    data = fixture_exif(3)  # JPEG carrier variant
    assert parse_exif(data)["kind"] == "jpeg"
    assert decode_jpeg(data) is not None


def test_unknown_tags_and_types_skipped():
    tiff = bytearray(_basic())
    # append nothing; instead corrupt one tag id to an unknown value —
    # parse must keep the remaining tags
    e = "<"
    (ifd0,) = struct.unpack_from(e + "I", tiff, 4)
    # first entry tag -> 0xFEFE
    struct.pack_into(e + "H", tiff, ifd0 + 2, 0xFEFE)
    p = parse_exif(bytes(tiff))
    assert p["model"] == "Cam 9000"  # later entries intact


def test_cycle_guard():
    tiff = bytearray(_basic())
    e = "<"
    (ifd0,) = struct.unpack_from(e + "I", tiff, 4)
    (n,) = struct.unpack_from(e + "H", tiff, ifd0)
    next_off = ifd0 + 2 + 12 * n
    struct.pack_into(e + "I", tiff, next_off, ifd0)  # IFD0 -> IFD0 loop
    p = probe_exif(bytes(tiff))
    assert p["ok"] is False  # refused, not an infinite loop


def test_truncation_and_bitflips_never_raise():
    for i in (2, 5):
        data = fixture_exif(i)
        for cut in range(0, len(data), max(1, len(data) // 29)):
            assert isinstance(probe_exif(data[:cut])["ok"], bool)
        for k in range(0, len(data), max(1, len(data) // 41)):
            mut = bytearray(data)
            mut[k] ^= 0xFF
            assert isinstance(probe_exif(bytes(mut))["ok"], bool)


def test_fixture_closed_form_sample():
    for i in (0, 1, 2, 3, 4, 5, 6, 10, 12, 15, 30, 59):
        p = probe_exif(fixture_exif(i))
        assert p["ok"], (i, p["reason"])
        assert p["kind"] == ("tiff" if i % 2 == 0 else "jpeg")
        assert p["endian"] == ("MM" if i % 3 == 0 else "II")
        assert p["orientation"] == 1 + i % 8
        assert p["n_ifds"] == 1 + (1 if i % 5 == 0 else 0)
