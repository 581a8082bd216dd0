"""AVI (RIFF) demux: round trips across idx1 conventions, hostile
inputs, and the three query surfaces. probe/frame-sample are ORACLED
— the parity sweep covers them."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webxtract.ops.avi import (AVIError, build_avi, parse_avi, probe_avi)


def _stream(frames, handler="MJPG", w=72, h=64, num=25, den=1):
    return {"handler": handler, "width": w, "height": h,
            "frames": frames, "fps_num": num, "fps_den": den}


def test_roundtrip_idx1_matrix():
    """No-idx1 / movi-relative idx1 / absolute idx1 all recover the
    frames; odd frame sizes exercise RIFF even-padding."""
    frames = [bytes([k]) * (51 + 13 * k) for k in range(7)]
    for with_idx in (False, True):
        for absolute in (False, True):
            raw = build_avi([_stream(frames)], with_idx1=with_idx,
                            idx1_absolute=absolute)
            info = parse_avi(raw)
            st = info["streams"][0]
            assert (st["handler"], st["width"], st["height"]) == \
                ("MJPG", 72, 64)
            assert [raw[o:o + sz] for o, sz in st["frames"]] == frames
            assert info["usec_per_frame"] == 40000
            assert st["compression"] == "MJPG"


def test_multistream_and_probe():
    raw = build_avi([_stream([b"a" * 9, b"b" * 11]),
                     _stream([b"c" * 30], handler="XVID", w=32, h=24,
                             num=30)])
    info = parse_avi(raw)
    assert [len(s["frames"]) for s in info["streams"]] == [2, 1]
    rows = probe_avi(raw)
    assert [r["decodable"] for r in rows] == [True, False]
    assert rows[0]["duration_ms"] == 80  # 2 frames at 25 fps
    assert rows[1]["duration_ms"] == 33
    assert rows[1]["frame_bytes"] == 30


def test_hostile_inputs_degrade_to_data():
    assert probe_avi(None)[0]["ok"] is False
    assert probe_avi(b"")[0]["ok"] is False
    assert probe_avi(b"RIFFxxxxWAVE")[0]["ok"] is False  # not AVI
    raw = build_avi([_stream([b"y" * 100])])
    assert probe_avi(raw[:40])[0]["ok"] is False
    # a lying idx1 entry must degrade the file, not mis-slice a frame
    bad = bytearray(raw)
    i = bytes(raw).find(b"idx1")
    struct.pack_into("<I", bad, i + 8 + 8, 999999)
    assert probe_avi(bytes(bad))[0]["ok"] is False
    # frame chunk for an undeclared stream
    raw2 = build_avi([_stream([b"z" * 10])])
    bad2 = bytearray(raw2.replace(b"00dc", b"07dc"))
    assert probe_avi(bytes(bad2))[0]["ok"] is False
    # RIFF size overrunning the file
    bad3 = bytearray(raw)
    struct.pack_into("<I", bad3, 4, len(raw) + 50)
    assert probe_avi(bytes(bad3))[0]["ok"] is False


def test_avi_surfaces_end_to_end(ray_session):
    import pyarrow.parquet as pq

    from webxtract.ops.avi import (sample_avi_frames, synth_avi_corpus,
                                   videos_avi_dupes, videos_avi_probe)

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()

    probe = videos_avi_probe(sf).to_pandas().set_index("media_id")
    assert len(probe) == len(ids)
    handlers = ["XVID", "MJPG", "H264"]
    for i in ids[:50]:
        r = probe.loc[i]
        nf = 3 + i % 6
        assert r["handler"] == handlers[i % 3]
        assert (r["width"], r["height"]) == (64 + 8 * (i % 5),
                                             48 + 8 * (i % 4))
        assert r["n_frames"] == nf
        assert r["duration_ms"] == nf * 40
        assert r["frame_bytes"] == sum(150 + (17 * i + 9 * k) % 120
                                       for k in range(nf))
        assert bool(r["decodable"]) == (i % 3 == 1)

    frames = sample_avi_frames(synth_avi_corpus(sf), every_n=2).to_pandas()
    assert (frames.width == 72).all() and (frames.height == 64).all()
    nf = {i: 4 + (i - 1) % 5 - 1 if i % 10 == 5 else 4 + i % 5
          for i in ids}
    assert frames.groupby("media_id").n_frames.first().to_dict() == nf

    expect = sorted((i - 1, i) for i in ids
                    if i % 10 == 5 and (i - 1) in ids)
    df = videos_avi_dupes(sf).to_pandas()
    got = sorted(zip(df.video_a.astype(int), df.video_b.astype(int)))
    assert got == expect


def test_frame0_byte_identity_all_four_carriers():
    """Frame 0 of doc 7 is byte-identical across raw MJPEG, MP4,
    Matroska AND AVI — no container touches payload bytes."""
    import pyarrow as pa

    from webxtract.ops.avi import _render_mjpg_avi
    from webxtract.ops.media import encode_mjpeg, split_mjpeg
    from webxtract.ops.mkv import _render_mjpeg_mkv, parse_mkv
    from webxtract.ops.mp4 import (_render_mjpeg_mp4, extract_samples,
                                   parse_mp4)

    batch = pa.table({"doc_id": pa.array([7], pa.int64())})
    avi_raw = _render_mjpg_avi(batch).column("media")[0].as_py()
    o, sz = parse_avi(avi_raw)["streams"][0]["frames"][0]
    avi_f0 = avi_raw[o:o + sz]
    mkv_raw = _render_mjpeg_mkv(batch).column("media")[0].as_py()
    mkv_f0 = parse_mkv(mkv_raw)["tracks"][0]["frames"][0][1]
    mp4_raw = _render_mjpeg_mp4(batch).column("media")[0].as_py()
    mp4_f0 = extract_samples(mp4_raw, parse_mp4(mp4_raw)["tracks"][0])[0][1]

    rng = np.random.default_rng(7 + (1 << 40))
    blocks = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    raw_f0 = split_mjpeg(encode_mjpeg([np.ascontiguousarray(img)],
                                      quality=95))[0]
    assert avi_f0 == mkv_f0 == mp4_f0 == raw_f0
