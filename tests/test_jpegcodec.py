"""Pure-numpy baseline JPEG codec (closes VERDICT r2 "what's missing"
#1): encode->decode round-trips are tolerance-tested per subsampling /
quality / restart-interval combination, restart decode is bit-identical
to the no-restart decode of the same quantized data, headers parse
dims without a pixel pass, unsupported/corrupt inputs return None
(data, not failures), and the planted-pair dHash near-dup gate holds
over JPEG inputs — including cross-container pairs (lossless vs JPEG
of a near-identical image)."""

import numpy as np
import pytest

from webxtract.ops import imagecodec as IC
from webxtract.ops import jpegcodec as JC
from webxtract.ops.media import dhash64


def _rng(seed=7):
    return np.random.default_rng(seed)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(1, w - 1),
        yy * 255 // max(1, h - 1),
        (xx + yy) * 255 // max(1, w + h - 2),
    ], axis=-1).astype(np.uint8)


def _mosaic(seed, blocks=(4, 4), px=8):
    """Constant 8x8 blocks: DC-only under JPEG, near-exact re-encode."""
    b = _rng(seed).integers(0, 256, size=(*blocks, 3), dtype=np.uint8)
    return np.repeat(np.repeat(b, px, axis=0), px, axis=1)


def _ham(a, b):
    return bin(a ^ b).count("1")


# --- round trip ------------------------------------------------------------

@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [75, 90, 95])
def test_roundtrip_gradient(sub, quality):
    img = _gradient(48, 64)
    raw = JC.encode_jpeg(img, quality=quality, subsampling=sub)
    assert IC.sniff(raw) == "jpeg"
    assert JC.jpeg_dims(raw) == (64, 48)
    out = JC.decode_jpeg(raw)
    assert out is not None and out.shape == (48, 64, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # smooth content survives quantization tightly; 4:2:0 pays a bit more
    assert err.max() <= (6 if sub == "444" else 12)
    # generic dispatchers route jpeg too
    assert np.array_equal(IC.decode_image(raw), out)
    assert IC.image_dims(raw) == (64, 48)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_roundtrip_odd_dimensions(sub):
    img = _rng(3).integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    out = JC.decode_jpeg(JC.encode_jpeg(img, quality=85, subsampling=sub))
    assert out is not None and out.shape == (17, 23, 3)


def test_mosaic_near_exact():
    img = _mosaic(11)
    out = JC.decode_jpeg(JC.encode_jpeg(img, quality=95, subsampling="444"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_encode_deterministic():
    img = _rng(5).integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert JC.encode_jpeg(img, 90, "420") == JC.encode_jpeg(img, 90, "420")


# --- restart intervals -----------------------------------------------------

@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [1, 2, 3, 5])
def test_restart_interval_bit_identical(sub, ri):
    """RSTn resync must not perturb a single coefficient: decoding the
    restart-marked stream equals decoding the unmarked stream of the
    same quantized data."""
    img = _rng(7).integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    with_rst = JC.decode_jpeg(
        JC.encode_jpeg(img, quality=90, subsampling=sub,
                       restart_interval=ri))
    without = JC.decode_jpeg(JC.encode_jpeg(img, quality=90,
                                            subsampling=sub))
    assert with_rst is not None and np.array_equal(with_rst, without)


# --- malformed / unsupported inputs ----------------------------------------

def test_garbage_returns_none():
    assert JC.decode_jpeg(b"") is None
    assert JC.decode_jpeg(b"not a jpeg") is None
    assert JC.jpeg_dims(b"not a jpeg") is None
    # SOI + junk, truncated mid-header
    assert JC.decode_jpeg(b"\xff\xd8\xff\xdb\x00\x43") is None


def test_truncated_stream_returns_none_or_partial_never_raises():
    raw = JC.encode_jpeg(_gradient(32, 32), quality=90)
    for cut in (4, len(raw) // 3, len(raw) - 3):
        JC.decode_jpeg(raw[:cut])  # must not raise


def test_out_of_scope_markers_rejected():
    """SOF10 (progressive arithmetic) and SOF3 (lossless) stay out of
    scope -> None, not an exception (SOF9 sequential arithmetic is
    now REAL — tests/test_jpegarith.py); a baseline stream relabeled
    SOF2 carries an invalid progressive scan script (Ss=0, Se=63) and
    must also yield None. A huffman stream relabeled SOF9 feeds
    huffman bytes to the QM coder — that must degrade to None or
    garbage pixels, never an exception."""
    raw = bytearray(JC.encode_jpeg(_gradient(16, 16)))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xCA
    assert JC.decode_jpeg(bytes(raw)) is None
    raw[i + 1] = 0xC3
    assert JC.decode_jpeg(bytes(raw)) is None
    raw[i + 1] = 0xC2
    assert JC.decode_jpeg(bytes(raw)) is None
    raw[i + 1] = 0xC9
    out = JC.decode_jpeg(bytes(raw))
    assert out is None or hasattr(out, "shape")


# --- progressive (SOF2) -----------------------------------------------------

@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [30, 75, 95])
def test_progressive_decode_bit_identical_to_baseline(sub, quality):
    """The 10-scan progressive script reconstructs the exact same
    quantized coefficients, so its decode must equal the baseline
    stream's decode BIT-FOR-BIT (same quant tables, same pixels)."""
    for img in (_gradient(40, 56), _mosaic(3, blocks=(5, 7)),
                _rng(11).integers(0, 256, (37, 53, 3), dtype=np.uint8)):
        base = JC.decode_jpeg(JC.encode_jpeg(
            img, quality=quality, subsampling=sub))
        prog = JC.decode_jpeg(JC.encode_jpeg(
            img, quality=quality, subsampling=sub, progressive=True))
        assert prog is not None
        assert np.array_equal(base, prog)


def test_progressive_eob_runs_and_zrl_paths():
    """Flat image -> maximal EOB runs (>1, exercising the EOBn extra
    bits); single bright pixel -> long zero runs incl. ZRL in both
    first and refinement passes."""
    flat = np.full((128, 128, 3), 130, np.uint8)
    assert np.array_equal(
        JC.decode_jpeg(JC.encode_jpeg(flat, progressive=True)),
        JC.decode_jpeg(JC.encode_jpeg(flat)))
    sp = np.zeros((64, 64, 3), np.uint8)
    sp[32, 32] = 255
    for sub in ("444", "420"):
        assert np.array_equal(
            JC.decode_jpeg(JC.encode_jpeg(
                sp, subsampling=sub, progressive=True)),
            JC.decode_jpeg(JC.encode_jpeg(sp, subsampling=sub)))


def test_progressive_dims_and_truncation():
    raw = JC.encode_jpeg(_gradient(24, 40), progressive=True)
    assert JC.jpeg_dims(raw) == (40, 24)
    # truncation anywhere must never raise
    for cut in (10, len(raw) // 3, len(raw) // 2, len(raw) - 3):
        JC.decode_jpeg(raw[:cut])


def test_progressive_planted_pair_dhash_gate():
    """The dHash near-dup contract holds across a baseline/progressive
    pair of a near-identical image (the images_phash_dupes corpus now
    plants progressive legs): drift <= threshold for the pair, distinct
    mosaics far apart."""
    a = _mosaic(21, blocks=(8, 9))
    b = a.copy()
    b[0, 0, 0] ^= 1
    da = dhash64(JC.decode_jpeg(JC.encode_jpeg(
        a, quality=95, subsampling="420", progressive=True)))
    db = dhash64(JC.decode_jpeg(JC.encode_jpeg(
        b, quality=95, subsampling="420")))
    assert _ham(da, db) <= 4
    dc = dhash64(JC.decode_jpeg(JC.encode_jpeg(
        _mosaic(77, blocks=(8, 9)), progressive=True)))
    assert _ham(da, dc) >= 10


# --- dHash stability across the lossy leg ----------------------------------

def test_dhash_survives_jpeg_reencode():
    """Mosaic corpus images keep their dhash within the neardup
    threshold (<=2 bits) across a q95 JPEG cycle, and at least one
    16-bit LSH band survives untouched (candidate recall)."""
    for seed in range(40):
        img = _mosaic(seed)
        d0 = dhash64(img)
        dj = dhash64(JC.decode_jpeg(
            JC.encode_jpeg(img, quality=95, subsampling="444")))
        assert _ham(d0, dj) <= 2
        assert any(((d0 >> (16 * b)) & 0xFFFF) == ((dj >> (16 * b)) & 0xFFFF)
                   for b in range(4))


def test_dhash_cross_container_planted_pair():
    """The synth corpus shape: base image in a lossless container vs a
    1-subpixel variant as JPEG must stay within max_dist=2, while
    unrelated mosaics stay far apart."""
    for seed in range(20):
        img = _mosaic(seed)
        var = img.copy()
        var[0, 0, 0] ^= 1
        d_lossless = dhash64(IC.decode_png(IC.encode_png(img)))
        d_jpeg = dhash64(JC.decode_jpeg(
            JC.encode_jpeg(var, quality=95, subsampling="444")))
        assert _ham(d_lossless, d_jpeg) <= 2
    assert _ham(dhash64(_mosaic(1)), dhash64(_mosaic(2))) > 10


def test_grayscale_single_component_decodes():
    """1-component scans replicate luma to RGB (hand-built via the
    encoder's luma tables on a gray image: encode 3-channel gray, then
    assert channel agreement within chroma error)."""
    g = _rng(9).integers(0, 256, size=(24, 24), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    out = JC.decode_jpeg(JC.encode_jpeg(img, quality=95))
    assert out is not None
    spread = out.astype(int).max(axis=2) - out.astype(int).min(axis=2)
    assert spread.max() <= 4
