"""MPEG-TS demux: PES/PSI round trips across both length forms,
packet-loss resilience as data, hostile inputs, and the oracled probe
surface."""

from __future__ import annotations

import struct

import pytest

from webxtract.ops.mpegts import (TSError, _crc32_mpeg, build_ts,
                                  parse_ts, probe_ts)


def _units(n, base=400):
    return [(k * 3600, bytes([k]) * (base + 37 * k)) for k in range(n)]


def test_crc32_mpeg_vector():
    # classic check value for the MPEG/CRC-32 variant ("123456789")
    assert _crc32_mpeg(b"123456789") == 0x0376E6E7


def test_roundtrip_forms():
    """Bounded and unbounded PES, with and without null-packet
    sprinkling, recover every (pts, payload) unit exactly."""
    for bounded in (True, False):
        for null_every in (0, 2):
            units = _units(5)
            raw = build_ts([{"stream_type": 0x1B, "pid": 0x100,
                             "units": units}],
                           bounded_pes=bounded, null_every=null_every)
            assert len(raw) % 188 == 0
            s = parse_ts(raw)["streams"][0]
            assert s["codec"] == "h264"
            assert s["cc_errors"] == 0 and s["pes_errors"] == 0
            assert s["units"] == units, (bounded, null_every)


def test_multistream_probe_fields():
    tt = [{"stream_type": 0x1B, "pid": 0x100,
           "units": [(0, b"v" * 500), (3600, b"w" * 300)]},
          {"stream_type": 0x0F, "pid": 0x101, "units": [(0, b"a" * 120)]}]
    rows = probe_ts(build_ts(tt))
    assert [(r["pid"], r["codec"], r["n_pes"], r["payload_bytes"],
             r["duration_ms"]) for r in rows] == \
        [(0x100, "h264", 2, 800, 40), (0x101, "aac", 1, 120, 0)]


def test_packet_loss_is_data_not_failure():
    """Dropping a continuation packet costs ONE cc error and ONE
    damaged PES; the other units still demux (the ffmpeg posture —
    damaged HLS segments are the norm)."""
    raw = build_ts([{"stream_type": 0x1B, "pid": 0x100,
                     "units": _units(4)}])
    pkts = [raw[i:i + 188] for i in range(0, len(raw), 188)]
    drop = next(i for i, p in enumerate(pkts)
                if ((p[1] & 0x1F) << 8 | p[2]) == 0x100
                and not p[1] & 0x40)
    r = probe_ts(b"".join(pkts[:drop] + pkts[drop + 1:]))[0]
    assert (r["ok"], r["cc_errors"], r["pes_errors"], r["n_pes"]) == \
        (True, 1, 1, 3)


def test_resync_and_hostile_inputs():
    raw = build_ts([{"stream_type": 0x02, "pid": 0x100,
                     "units": [(0, b"q" * 50)]}])
    # garbage prefix: resync finds the grid
    assert probe_ts(b"\x12\x34\x56" + raw)[0]["ok"] is True
    assert probe_ts(None)[0]["ok"] is False
    assert probe_ts(b"")[0]["ok"] is False
    assert probe_ts(b"x" * 1000)[0]["ok"] is False
    # corrupt the PAT CRC -> file-level failure (can't trust programs).
    # The PSI section rides at the packet tail (adaptation stuffing
    # precedes the payload), so flip a byte there.
    bad = bytearray(raw)
    af_len = raw[4]
    pat_start = 4 + 1 + af_len
    bad[pat_start + 5] ^= 0xFF  # inside the PAT section body
    assert probe_ts(bytes(bad))[0]["ok"] is False


def test_ts_probe_surface_end_to_end(ray_session):
    import pyarrow.parquet as pq

    from webxtract.ops.mpegts import videos_ts_probe

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()
    probe = videos_ts_probe(sf).to_pandas().set_index("media_id")
    assert len(probe) == len(ids)
    codecs = ["h264", "private_pes", "mpeg2video"]
    for i in ids[:50]:
        r = probe.loc[i]
        nf = 3 + i % 6
        assert r["pid"] == 0x100
        assert r["codec"] == codecs[i % 3]
        assert r["n_pes"] == nf
        assert r["duration_ms"] == (nf - 1) * 40
        assert r["payload_bytes"] == sum(180 + (19 * i + 11 * k) % 150
                                         for k in range(nf))
        assert r["cc_errors"] == 0 and r["pes_errors"] == 0
