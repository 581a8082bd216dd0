"""MP4 (ISO BMFF) demux: mux/demux round trips across layout
variants, hostile-input degradation, and the three query surfaces
(probe / frame sample / near-dup mining) over the deterministic
corpora. The probe and frame-sample surfaces are additionally
ORACLED — tests/test_oracle_parity.py sweeps them with the rest."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webxtract.ops.mp4 import (MP4Error, build_mp4, extract_samples,
                               parse_mp4, probe_mp4)


def _track(samples, codec="jpeg", w=72, h=64, ts=12800, deltas=None,
           chunk_sizes=None):
    return {"codec": codec, "width": w, "height": h, "samples": samples,
            "timescale": ts,
            "deltas": deltas or [512] * len(samples),
            "chunk_sizes": chunk_sizes}


def test_roundtrip_all_layouts():
    """Every (v0/v1, stco/co64, chunk pattern) combination round-trips:
    codec/dims/timing demux exactly and the sample extents recover the
    original payload bytes byte-for-byte."""
    samples = [bytes([k]) * (50 + 7 * k) for k in range(7)]
    deltas = [512] * 6 + [1024]  # multi-entry stts
    for v1 in (False, True):
        for co in (False, True):
            for cs in ([1], [2], [3], [2, 3], [5, 1]):
                raw = build_mp4(
                    [_track(samples, deltas=deltas, chunk_sizes=cs)],
                    version1=v1, co64=co)
                info = parse_mp4(raw)
                assert info["brand"] == "isom"
                (t,) = info["tracks"]
                assert (t["codec"], t["width"], t["height"]) == \
                    ("jpeg", 72, 64)
                assert t["n_samples"] == 7
                assert t["duration"] == sum(deltas)
                assert t["handler"] == "vide"
                assert list(t["sample_durations"]) == deltas
                got = [b for _, b in extract_samples(raw, t)]
                assert got == samples, (v1, co, cs)


def test_codec_signalling():
    """stsd codec identification: 'jpeg' direct, 'mp4v' resolves its
    esds DecoderConfigDescriptor to objectTypeIndication 0x6C (the
    ffmpeg mjpeg-in-mp4 signalling), 'avc1' demuxes but is flagged
    not-decodable (bitstream decode is the declared gap)."""
    one = [b"x" * 10]
    assert parse_mp4(build_mp4([_track(one, codec="jpeg")])
                     )["tracks"][0]["codec"] == "jpeg"
    assert parse_mp4(build_mp4([_track(one, codec="mp4v")])
                     )["tracks"][0]["codec"] == "mp4v.6c"
    rows = probe_mp4(build_mp4([_track(one, codec="avc1")]))
    assert rows[0]["codec"] == "avc1" and rows[0]["ok"]
    assert not rows[0]["decodable"]
    for c in ("jpeg", "mp4v"):
        assert probe_mp4(build_mp4([_track(one, codec=c)]))[0]["decodable"]


def test_multitrack_and_probe_fields():
    tracks = [_track([b"a" * 9, b"b" * 11], ts=1000, deltas=[40, 60]),
              _track([b"c" * 30], codec="avc1", w=32, h=24, ts=600,
                     deltas=[20])]
    raw = build_mp4(tracks)
    info = parse_mp4(raw)
    assert [t["track_id"] for t in info["tracks"]] == [1, 2]
    assert [b for _, b in extract_samples(raw, info["tracks"][0])] == \
        [b"a" * 9, b"b" * 11]
    assert [b for _, b in extract_samples(raw, info["tracks"][1])] == \
        [b"c" * 30]
    rows = probe_mp4(raw)
    assert rows[0]["duration_ms"] == 100 and rows[0]["sample_bytes"] == 20
    assert rows[1]["duration_ms"] == 33 and rows[1]["sample_bytes"] == 30


def test_every_n_extraction():
    samples = [bytes([k]) * 5 for k in range(9)]
    raw = build_mp4([_track(samples, chunk_sizes=[4])])
    t = parse_mp4(raw)["tracks"][0]
    got = extract_samples(raw, t, every_n=3)
    assert [k for k, _ in got] == [0, 3, 6]
    assert [b for _, b in got] == [samples[0], samples[3], samples[6]]


def test_fixed_stsz_and_unknown_boxes():
    """A fixed-size stsz (sample_size != 0) and unknown boxes spliced
    between known siblings both demux: unknown boxes skip by size."""
    samples = [b"Q" * 64, b"R" * 64]
    raw = bytearray(build_mp4([_track(samples)]))
    # rewrite stsz to the fixed-size form in place: find the table
    i = bytes(raw).find(b"stsz")
    assert i > 0
    struct.pack_into(">I", raw, i + 8, 64)  # sample_size = 64
    t = parse_mp4(bytes(raw))["tracks"][0]
    assert list(t["sample_sizes"]) == [64, 64]
    assert [b for _, b in extract_samples(bytes(raw), t)] == samples
    # splice an unknown top-level box between ftyp and mdat
    ftyp_end = struct.unpack_from(">I", raw, 0)[0]
    junk = struct.pack(">I", 16) + b"zzzz" + b"\x00" * 8
    spliced = bytes(raw[:ftyp_end]) + junk + bytes(raw[ftyp_end:])
    # chunk offsets shifted by the splice -> extents now point 16 B
    # early; the demux itself must still walk the tree fine
    info = parse_mp4(spliced)
    assert info["tracks"][0]["n_samples"] == 2


def test_hostile_inputs_degrade_to_data():
    """Garbage, truncation, missing tables and lying tables are DATA
    (ok=False probe rows), never raises out of probe_mp4."""
    assert probe_mp4(None)[0]["ok"] is False
    assert probe_mp4(b"")[0]["ok"] is False
    assert probe_mp4(b"garbage bytes that are not boxes")[0]["ok"] is False
    raw = build_mp4([_track([b"y" * 100])])
    assert probe_mp4(raw[:len(raw) // 2])[0]["ok"] is False  # no moov
    # declared size overrunning the file
    bad = bytearray(raw)
    struct.pack_into(">I", bad, 0, len(raw) + 999)
    assert probe_mp4(bytes(bad))[0]["ok"] is False
    # stsz/stts disagreement: patch stts run count field
    i = bytes(raw).find(b"stts")
    bad = bytearray(raw)
    struct.pack_into(">I", bad, i + 8 + 4, 99)  # first run: 99 samples
    assert probe_mp4(bytes(bad))[0]["ok"] is False
    # sample extent beyond EOF: truncate mdat tail but keep moov by
    # rebuilding: mdat payload shortened -> rebuild file with lying stco
    i = bytes(raw).find(b"stco")
    bad = bytearray(raw)
    struct.pack_into(">I", bad, i + 12, len(raw) - 10)  # offset near EOF
    assert probe_mp4(bytes(bad))[0]["ok"] is False
    with pytest.raises(MP4Error):
        parse_mp4(b"\x00" * 32)


def test_largesize_box():
    """A size==1 largesize mdat (the >4 GiB layout) demuxes: rebuild
    the fixture file with the mdat box widened to the 16-byte header
    and offsets shifted accordingly."""
    samples = [b"L" * 33, b"M" * 41]
    raw = build_mp4([_track(samples, chunk_sizes=[1])])
    ftyp_end = struct.unpack_from(">I", raw, 0)[0]
    mdat_size = struct.unpack_from(">I", raw, ftyp_end)[0]
    payload = raw[ftyp_end + 8:ftyp_end + mdat_size]
    wide_mdat = struct.pack(">I", 1) + b"mdat" + \
        struct.pack(">Q", 16 + len(payload)) + payload
    moov = bytearray(raw[ftyp_end + mdat_size:])
    # both stco offsets shift +8 (the widened header)
    i = bytes(moov).find(b"stco")
    for k in range(2):
        off = struct.unpack_from(">I", moov, i + 12 + 4 * k)[0]
        struct.pack_into(">I", moov, i + 12 + 4 * k, off + 8)
    rebuilt = raw[:ftyp_end] + wide_mdat + bytes(moov)
    t = parse_mp4(rebuilt)["tracks"][0]
    assert [b for _, b in extract_samples(rebuilt, t)] == samples


def test_mp4_surfaces_end_to_end(ray_session):
    """The three query surfaces over sf0.001: probe fields match the
    fixture closed form, sampled frames carry real decoded SOF dims,
    and near-dup mining recovers exactly the planted (i-1, i) pairs
    under both count-attachment paths."""
    import pyarrow.parquet as pq

    from webxtract.ops.mp4 import (mp4_neardup_pairs, sample_mp4_frames,
                                   synth_mp4_corpus, videos_mp4_probe)

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()

    probe = videos_mp4_probe(sf).to_pandas().set_index("media_id")
    assert len(probe) == len(ids)
    codecs = ["avc1", "jpeg", "mp4v.6c"]
    for i in ids[:50]:
        r = probe.loc[i]
        ns = 3 + i % 6
        delta = 512 + 256 * (i % 3)
        assert r["codec"] == codecs[i % 3]
        assert (r["width"], r["height"]) == (64 + 8 * (i % 5),
                                             48 + 8 * (i % 4))
        assert r["n_samples"] == ns
        assert r["duration_ms"] == ((ns + 1) * delta) * 1000 // 12800
        assert r["sample_bytes"] == sum(200 + (13 * i + 7 * k) % 100
                                        for k in range(ns))
        assert bool(r["decodable"]) == (i % 3 != 0)

    frames = sample_mp4_frames(synth_mp4_corpus(sf), every_n=2).to_pandas()
    assert (frames.width == 72).all() and (frames.height == 64).all()
    assert (frames.frame_idx % 2 == 0).all()
    nf = {i: 4 + (i - 1) % 5 - 1 if i % 10 == 5 else 4 + i % 5
          for i in ids}
    got_nf = frames.groupby("media_id").n_frames.first().to_dict()
    assert got_nf == nf

    expect = sorted((i - 1, i) for i in ids
                    if i % 10 == 5 and (i - 1) in ids)
    results = {}
    for verify in ("broadcast", "join"):
        df = (mp4_neardup_pairs(synth_mp4_corpus(sf), every_n=2,
                                max_dist=4, min_overlap=0.5,
                                verify=verify).to_pandas()
              .sort_values(["video_a", "video_b"]).reset_index(drop=True))
        got = sorted(zip(df.video_a.astype(int), df.video_b.astype(int)))
        assert got == expect, verify
        results[verify] = df[["video_a", "video_b", "matched"]]
    assert results["broadcast"].equals(results["join"])


def test_decoded_mp4_pixels_match_mjpeg_twin():
    """The MJPEG-in-MP4 corpus carries the SAME frames as the raw
    MJPEG corpus: decode frame 0 of one doc through BOTH containers
    and require identical pixels (container must not touch payload)."""
    from webxtract.ops.jpegcodec import decode_jpeg
    from webxtract.ops.media import split_mjpeg
    from webxtract.ops.mp4 import _render_mjpeg_mp4
    import pyarrow as pa

    from webxtract.ops.media import synth_video_corpus  # noqa: F401
    # render doc 7 via both fixtures' batch fns
    batch = pa.table({"doc_id": pa.array([7], pa.int64())})
    mp4_raw = _render_mjpeg_mp4(batch).column("media")[0].as_py()
    t = parse_mp4(mp4_raw)["tracks"][0]
    mp4_frame0 = extract_samples(mp4_raw, t)[0][1]

    rng = np.random.default_rng(7 + (1 << 40))
    blocks = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    from webxtract.ops.media import encode_mjpeg
    mjpeg_frame0 = split_mjpeg(encode_mjpeg([np.ascontiguousarray(img)],
                                            quality=95))[0]
    assert mp4_frame0 == mjpeg_frame0  # identical bytes, not just pixels
    assert decode_jpeg(mp4_frame0) is not None
