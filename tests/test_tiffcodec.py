"""TIFF baseline codec (ops/tiffcodec.py): PackBits and TIFF-LZW round
trips (incl. the early-change boundaries and table resets), multi-strip
assembly across both byte orders, and hostile-input degradation."""

import numpy as np
import pytest

from webxtract.ops.tiffcodec import (
    COMP_LZW, COMP_NONE, COMP_PACKBITS, build_tiff_image, decode_tiff,
    fixture_tiff, lzw_decode, lzw_encode, packbits_decode, packbits_encode,
)


@pytest.mark.parametrize("case", [
    b"", b"x", b"ab" * 5000, b"\x00" * 70000,
    bytes(np.random.default_rng(1).integers(0, 256, 20000, dtype=np.uint8)),
    bytes(np.random.default_rng(2).integers(0, 4, 50000, dtype=np.uint8)),
    # > 4094 distinct sequences: forces the ClearCode table reset
    bytes(np.random.default_rng(3).integers(0, 256, 300000,
                                            dtype=np.uint8)),
])
def test_lzw_and_packbits_roundtrip(case):
    assert lzw_decode(lzw_encode(case), len(case)) == case
    assert packbits_decode(packbits_encode(case), len(case)) == case


def test_lzw_early_change_boundary():
    """A stream engineered to cross the 9->10 bit boundary: 300 distinct
    two-byte sequences guarantee codes past 511."""
    data = bytes(v for k in range(300) for v in (k % 256, (k * 7) % 256))
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_packbits_literal_run_mix():
    data = b"aaabccccdefgggggh" * 40
    enc = packbits_encode(data)
    assert len(enc) < len(data)
    assert packbits_decode(enc, len(data)) == data


@pytest.mark.parametrize("endian", ["<", ">"])
@pytest.mark.parametrize("comp", [COMP_NONE, COMP_PACKBITS, COMP_LZW])
def test_image_roundtrip(endian, comp):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (33, 41), dtype=np.uint8)
    data = build_tiff_image(arr, compression=comp, endian=endian,
                            rows_per_strip=7)  # 5 strips, last ragged
    dec = decode_tiff(data)
    assert dec is not None and (dec == arr).all()


def test_fixture_matches_pattern():
    for i in (0, 1, 2, 3, 4, 5, 17, 36, 59):
        h, w = 16 + i % 3, 24 + i % 5
        exp = ((np.arange(h * w, dtype=np.int64) + 7 * i) % 256) \
            .astype(np.uint8).reshape(h, w)
        dec = decode_tiff(fixture_tiff(i))
        assert dec is not None and (dec == exp).all(), i


def test_malformed_returns_none():
    assert decode_tiff(b"") is None
    assert decode_tiff(b"II\x2b\x00") is None  # BigTIFF magic: unsupported
    assert decode_tiff(b"garbage not tiff") is None
    data = fixture_tiff(5)
    for cut in range(0, len(data), max(1, len(data) // 23)):
        r = decode_tiff(data[:cut])
        assert r is None or r.shape == (16 + 5 % 3, 24 + 5 % 5)
    for k in range(0, len(data), max(1, len(data) // 31)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        decode_tiff(bytes(mut))  # must not raise


def test_rgb_or_16bit_unsupported_is_none():
    # hand-tamper BitsPerSample to 16: decoder must refuse, not garble
    import struct

    from webxtract.ops.exif import _read_ifd

    data = bytearray(fixture_tiff(0))
    e = ">"  # fixture 0 is MM
    (off,) = struct.unpack_from(e + "I", data, 4)
    (n,) = struct.unpack_from(e + "H", data, off)
    for k in range(n):
        pos = off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, pos)
        if tag == 0x0102:
            struct.pack_into(e + "H", data, pos + 8, 16)
    assert decode_tiff(bytes(data)) is None
