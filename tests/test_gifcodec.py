"""Stdlib GIF codec: encode->decode round-trip is pixel-exact for
paletted images, real variable-width LZW compression (an externally
built growing-dictionary stream) decodes correctly, the interlace row
permutation inverts, extensions skip block-correctly, and corrupt
inputs return None (data, not failures)."""

import struct

import numpy as np
import pytest

from webxtract.ops import imagecodec as IC
from webxtract.ops.gifcodec import (_INTERLACE_PASSES, decode_gif,
                                    encode_gif, gif_dims)


def _rng(seed=7):
    return np.random.default_rng(seed)


def _palette_img(shape, n_colors, seed=7):
    rng = _rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=shape)
    return pal[idx]


@pytest.mark.parametrize("shape,colors", [((1, 1), 1), ((5, 3), 4),
                                          ((16, 16), 16), ((33, 7), 200),
                                          ((64, 64), 256)])
def test_roundtrip(shape, colors):
    img = _palette_img(shape, colors)
    raw = encode_gif(img)
    assert IC.sniff(raw) == "gif"
    assert gif_dims(raw) == (shape[1], shape[0])
    out = decode_gif(raw)
    assert out is not None and np.array_equal(out, img)
    assert np.array_equal(IC.decode_image(raw), img)
    assert IC.image_dims(raw) == (shape[1], shape[0])


def test_too_many_colors_raises():
    img = _rng(9).integers(0, 256, size=(30, 30, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_gif(img)


def test_real_lzw_dictionary_stream_decodes():
    """Build a GENUINE growing-dictionary LZW stream externally (the
    textbook GIF compressor) and check the decoder reproduces the
    exact index sequence — the uncompressed-writer round-trip alone
    never exercises dictionary hits or width growth."""
    rng = _rng(3)
    n = 4000
    seq = rng.integers(0, 4, size=n).astype(np.uint8)  # repetitive

    min_size = 2
    clear, eoi = 4, 5
    table = {(i,): i for i in range(4)}
    next_code = 6
    width = 3
    codes = [clear]
    cur = (int(seq[0]),)
    for s in seq[1:]:
        cand = cur + (int(s),)
        if cand in table:
            cur = cand
            continue
        codes.append(table[cur])
        if next_code < 4096:
            table[cand] = next_code
            # GIF width bump happens when next_code EXCEEDS the
            # current width's range at emission time
            if next_code == (1 << width):
                width_needed = width + 1
            next_code += 1
        cur = (int(s),)
    codes.append(table[cur])
    codes.append(eoi)

    # re-emit with correct width schedule (decoder's view)
    out = bytearray()
    acc = nbits = 0
    w = min_size + 1
    n_entries = 6
    fresh = True        # no dictionary entry for the first code
    for c in codes:     # after a clear (decoder has no prev yet)
        acc |= c << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c == clear:
            w = min_size + 1
            n_entries = 6
            fresh = True
        elif c != eoi:
            if fresh:
                fresh = False
            elif n_entries < 4096:
                n_entries += 1
                if n_entries == (1 << w) and w < 12:
                    w += 1
    if nbits:
        out.append(acc & 0xFF)

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   np.uint8)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    raw = (b"GIF89a" + struct.pack("<HH", 100, 40)
           + bytes([0x80 | 1, 0, 0]) + pal.tobytes()
           + b"\x2C" + struct.pack("<HHHH", 0, 0, 100, 40) + b"\x00"
           + bytes([min_size]) + bytes(blocks) + b"\x3B")
    got = decode_gif(raw)
    assert got is not None
    assert np.array_equal(got.reshape(-1, 3), pal[seq])


def test_interlace_inverts():
    img = _palette_img((32, 9), 7, seed=11)
    raw = bytearray(encode_gif(img))
    # rows are stored in pass order when the interlace flag is set:
    # permute the pixel rows accordingly and flip the flag
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, 32, step))
    permuted = img[order]
    raw2 = bytearray(encode_gif(permuted))
    # set interlace bit in the image descriptor of raw2 (it encodes
    # the permuted rows sequentially; a conforming decoder must undo)
    idx = raw2.index(0x2C, 13)
    raw2[idx + 9] |= 0x40
    got = decode_gif(bytes(raw2))
    assert got is not None and np.array_equal(got, img)


def test_extensions_skipped_and_corrupt_none():
    img = _palette_img((6, 6), 5, seed=2)
    raw = encode_gif(img)
    # splice a graphic-control extension between header+GCT and image
    idx = raw.index(b"\x2C", 13)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = raw[:idx] + ext + raw[idx:]
    assert np.array_equal(decode_gif(spliced), img)
    assert decode_gif(b"GIF89a\x00") is None
    assert decode_gif(b"NOTAGIF") is None
    assert gif_dims(b"GIF89a\x00") is None


def test_anim_roundtrip_and_compositing():
    from webxtract.ops.gifcodec import (decode_gif_frames,
                                        encode_gif_anim)

    frames = [_palette_img((10, 8), 6, seed=s) for s in (1, 2, 3)]
    raw = encode_gif_anim(frames)
    assert IC.sniff(raw) == "gif"
    got = decode_gif_frames(raw)
    assert len(got) == 3
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    # decode_gif (first frame) agrees with frame 0
    assert np.array_equal(IC.decode_image(raw), frames[0])
    # partial-frame compositing: splice a 2x2 sub-frame after frame 0
    # and check it patches the canvas at (left, top) = (3, 4)
    sub = frames[0].copy()
    sub[4:6, 3:5] = frames[1][0:2, 0:2]
    from webxtract.ops.gifcodec import encode_gif
    patch = encode_gif(np.ascontiguousarray(frames[1][0:2, 0:2]))
    # rebuild the patch's image block with its palette moved into a
    # LOCAL color table (encode_gif wrote it as the global table) and
    # rewrite (left, top)
    pbits = (patch[10] & 0x07) + 1
    psize = 1 << pbits
    pal_bytes = patch[13:13 + 3 * psize]
    idx = patch.index(b"\x2C", 13 + 3 * psize)
    desc = bytearray(patch[idx:idx + 10])
    desc[1:5] = struct.pack("<HH", 3, 4)
    desc[9] |= 0x80 | (pbits - 1)        # local-table flag + size
    block = bytes(desc) + pal_bytes + patch[idx + 10:-1]
    one = encode_gif(frames[0])
    spliced = one[:-1] + block + b"\x3B"
    got2 = decode_gif_frames(spliced)
    assert len(got2) == 2
    assert np.array_equal(got2[0], frames[0])
    assert np.array_equal(got2[1], sub)


def test_gifs_anim_planted_pairs(ray_session):
    """End-to-end over the animated corpus: every planted (i-1, i)
    pair for i % 10 == 5 is found, nothing else."""
    from webxtract.ops.media import gifs_anim_dupes

    df = gifs_anim_dupes("/root/testdata/sf0.001").to_pandas()
    exp = {(i - 1, i) for i in range(500) if i % 10 == 5}
    assert set(zip(df.video_a, df.video_b)) == exp
