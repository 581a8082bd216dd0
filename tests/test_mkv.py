"""Matroska/WebM (EBML) demux: vint/lacing round trips, hostile-input
degradation, and the three query surfaces over the deterministic
corpora. probe/frame-sample are ORACLED — the parity sweep covers
them with the rest."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webxtract.ops.mkv import (MKVError, _read_vint, _signed_vint,
                               _write_vint, build_mkv, parse_mkv,
                               probe_mkv)


def _track(frames, codec="V_MJPEG", w=72, h=64, frame_ms=40):
    return {"codec": codec, "width": w, "height": h, "frames": frames,
            "frame_ms": frame_ms}


def test_vint_roundtrip():
    for v in (0, 1, 126, 127, 128, 16382, 16383, 16384, 2 ** 35,
              2 ** 49 - 2):
        got, j = _read_vint(_write_vint(v), 0)
        assert got == v and j == len(_write_vint(v))
    # all-ones is the unknown-size form
    from webxtract.ops.mkv import _UNKNOWN
    assert _read_vint(b"\xff", 0)[0] is _UNKNOWN
    with pytest.raises(MKVError):
        _read_vint(b"\x00\x01", 0)  # >8-byte vint


def test_roundtrip_all_lacings_doctypes_segments():
    """Every (lacing, doctype, segment-size form, cluster size)
    combination recovers frame bytes AND spec-exact timestamps
    (laced frames spaced by the track DefaultDuration)."""
    for lacing in ("none", "xiph", "ebml", "fixed"):
        frames = ([bytes([k]) * 64 for k in range(7)]
                  if lacing == "fixed"
                  else [bytes([k]) * (50 + 37 * k) for k in range(7)])
        for unk in (False, True):
            for fpc in (1, 3, 4, 7):
                raw = build_mkv([_track(frames)], doctype="webm",
                                frames_per_cluster=fpc, lacing=lacing,
                                unknown_segment_size=unk)
                info = parse_mkv(raw)
                assert info["doctype"] == "webm"
                assert info["duration_ms"] == 280
                (t,) = info["tracks"]
                assert (t["codec"], t["width"], t["height"]) == \
                    ("V_MJPEG", 72, 64)
                assert [f for _, f in t["frames"]] == frames
                assert [ts for ts, _ in t["frames"]] == \
                    [k * 40 for k in range(7)], (lacing, unk, fpc)


def test_xiph_255_boundary():
    """Xiph lacing encodes sizes as 255-runs: a 255-byte and a
    510-byte frame exercise the boundary exactly."""
    frames = [b"a" * 255, b"b" * 510, b"c" * 3]
    raw = build_mkv([_track(frames)], lacing="xiph",
                    frames_per_cluster=3)
    assert [f for _, f in parse_mkv(raw)["tracks"][0]["frames"]] == frames


def test_ebml_lacing_negative_delta():
    """EBML lacing stores signed size deltas — a shrinking sequence
    forces the negative-delta arm."""
    frames = [b"x" * 500, b"y" * 90, b"z" * 40, b"w" * 7]
    raw = build_mkv([_track(frames)], lacing="ebml",
                    frames_per_cluster=4)
    assert [f for _, f in parse_mkv(raw)["tracks"][0]["frames"]] == frames
    # signed vint symmetry
    from webxtract.ops.mkv import _UNKNOWN  # noqa: F401
    for d in (-63, -1, 0, 1, 63, -8000, 8000):
        raw_sv = _signed_vint(d)
        v, j = _read_vint(raw_sv, 0, keep_marker=True)
        length = j
        assert (v - (1 << (7 * length))) - ((1 << (7 * length - 1)) - 1) == d


def test_multitrack():
    t1 = _track([b"a" * 9, b"b" * 11], codec="V_MJPEG")
    t2 = _track([b"c" * 30], codec="V_VP9", w=32, h=24)
    info = parse_mkv(build_mkv([t1, t2]))
    assert [t["track_id"] for t in info["tracks"]] == [1, 2]
    assert info["tracks"][1]["codec"] == "V_VP9"
    assert [f for _, f in info["tracks"][0]["frames"]] == [b"a" * 9,
                                                           b"b" * 11]
    rows = probe_mkv(build_mkv([t1, t2]))
    assert [r["decodable"] for r in rows] == [True, False]
    assert rows[1]["frame_bytes"] == 30


def test_unknown_elements_skipped():
    """Foreign elements (a Void, a SeekHead-shaped blob) inside the
    Segment are skipped by size, not tripped over."""
    raw = bytes(build_mkv([_track([b"q" * 20])]))
    # splice a Void element (id 0xEC) right after the Segment header
    # by rebuilding the segment around the original payload
    seg_id = raw.find(b"\x18\x53\x80\x67")
    assert seg_id >= 0
    from webxtract.ops.mkv import _read_vint as rv
    size, payload0 = rv(raw, seg_id + 4)
    void = b"\xec\x85" + b"\x00" * 5
    payload = void + raw[payload0:payload0 + size]
    rebuilt = raw[:seg_id + 4] + _write_vint(len(payload)) + payload
    info = parse_mkv(rebuilt)
    assert [f for _, f in info["tracks"][0]["frames"]] == [b"q" * 20]


def test_hostile_inputs_degrade_to_data():
    assert probe_mkv(None)[0]["ok"] is False
    assert probe_mkv(b"")[0]["ok"] is False
    assert probe_mkv(b"not ebml at all, just text!!")[0]["ok"] is False
    raw = build_mkv([_track([b"y" * 100])])
    assert probe_mkv(raw[:30])[0]["ok"] is False
    # lying element size overrunning the parent
    bad = bytearray(raw)
    i = bytes(raw).find(b"\x1f\x43\xb6\x75")  # Cluster id
    bad[i + 4] = 0x41  # size marker byte -> huge declared size
    bad[i + 5] = 0xFF
    assert probe_mkv(bytes(bad))[0]["ok"] is False
    # block referencing an undeclared track
    raw2 = build_mkv([_track([b"z" * 10])])
    c = bytes(raw2).find(b"\x1f\x43\xb6\x75")  # Cluster id
    j = bytes(raw2).find(b"\xa3", c)  # SimpleBlock id inside Cluster
    bad2 = bytearray(raw2)
    bad2[j + 2] = 0x85  # track number vint -> 5 (undeclared)
    assert probe_mkv(bytes(bad2))[0]["ok"] is False


def test_mkv_surfaces_end_to_end(ray_session):
    """probe fields match the fixture closed form; sampled frames
    carry real decoded SOF dims; near-dup mining recovers exactly the
    planted pairs."""
    import pyarrow.parquet as pq

    from webxtract.ops.mkv import (sample_mkv_frames, synth_mkv_corpus,
                                   videos_mkv_dupes, videos_mkv_probe)

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()

    probe = videos_mkv_probe(sf).to_pandas().set_index("media_id")
    assert len(probe) == len(ids)
    codecs = ["V_VP9", "V_MJPEG", "V_AV1"]
    for i in ids[:50]:
        r = probe.loc[i]
        nf = 3 + i % 6
        fixed = i % 4 == 3
        assert r["codec"] == codecs[i % 3]
        assert r["doctype"] == ("webm" if i % 5 == 0 else "matroska")
        assert (r["width"], r["height"]) == (64 + 8 * (i % 5),
                                             48 + 8 * (i % 4))
        assert r["n_frames"] == nf
        assert r["duration_ms"] == nf * 40
        assert r["frame_bytes"] == sum(
            120 + (11 * i + (0 if fixed else 5 * k)) % 80
            for k in range(nf))
        assert bool(r["decodable"]) == (i % 3 == 1)

    frames = sample_mkv_frames(synth_mkv_corpus(sf), every_n=2).to_pandas()
    assert (frames.width == 72).all() and (frames.height == 64).all()
    nf = {i: 4 + (i - 1) % 5 - 1 if i % 10 == 5 else 4 + i % 5
          for i in ids}
    assert frames.groupby("media_id").n_frames.first().to_dict() == nf

    expect = sorted((i - 1, i) for i in ids
                    if i % 10 == 5 and (i - 1) in ids)
    df = videos_mkv_dupes(sf).to_pandas()
    got = sorted(zip(df.video_a.astype(int), df.video_b.astype(int)))
    assert got == expect


def test_container_transparency_across_all_three():
    """Frame 0 of doc 7 is byte-identical whether carried as raw
    MJPEG, MJPEG-in-MP4, or MJPEG-in-Matroska — containers must never
    touch payload bytes."""
    import pyarrow as pa

    from webxtract.ops.media import encode_mjpeg, split_mjpeg
    from webxtract.ops.mkv import _render_mjpeg_mkv
    from webxtract.ops.mp4 import _render_mjpeg_mp4, extract_samples
    from webxtract.ops.mp4 import parse_mp4

    batch = pa.table({"doc_id": pa.array([7], pa.int64())})
    mkv_raw = _render_mjpeg_mkv(batch).column("media")[0].as_py()
    mkv_f0 = parse_mkv(mkv_raw)["tracks"][0]["frames"][0][1]
    mp4_raw = _render_mjpeg_mp4(batch).column("media")[0].as_py()
    mp4_f0 = extract_samples(mp4_raw, parse_mp4(mp4_raw)["tracks"][0])[0][1]

    rng = np.random.default_rng(7 + (1 << 40))
    blocks = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    raw_f0 = split_mjpeg(encode_mjpeg([np.ascontiguousarray(img)],
                                      quality=95))[0]
    assert mkv_f0 == mp4_f0 == raw_f0
