"""Hostile-input fuzz for the four container demuxers (VERDICT r4 ask
#8): bit-flip and truncate MUXED fixtures the way test_web_fuzz covers
the web parsers. Contract (the M1 posture): probe_* NEVER raises — a
mutation either still parses (ok=True rows) or degrades to ok=False
DATA rows; the frame-sample stage yields zero rows for broken files;
and a corrupted corpus runs through the Ray stages with zero task
errors."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webxtract.ops.avi import build_avi, probe_avi
from webxtract.ops.mkv import build_mkv, probe_mkv
from webxtract.ops.mp4 import (ProbeMP4, SampleMP4Frames, build_mp4,
                               probe_mp4)
from webxtract.ops.mpegts import build_ts, probe_ts


def _mp4_fixture() -> bytes:
    samples = [bytes([k]) * (50 + 7 * k) for k in range(5)]
    return build_mp4([{"codec": "jpeg", "width": 72, "height": 64,
                       "samples": samples, "timescale": 12800,
                       "deltas": [512] * 5, "chunk_sizes": [2, 3]}])


def _mkv_fixture() -> bytes:
    frames = [bytes([k]) * (40 + 11 * k) for k in range(4)]
    return build_mkv([{"codec": "V_MJPEG", "width": 72, "height": 64,
                       "frames": frames, "frame_ms": 40}])


def _avi_fixture() -> bytes:
    frames = [bytes([k]) * (40 + 11 * k) for k in range(4)]
    return build_avi([{"handler": "MJPG", "width": 72, "height": 64,
                       "frames": frames, "fps_num": 25, "fps_den": 1}])


def _ts_fixture() -> bytes:
    units = [(k * 3600, bytes([k]) * (400 + 37 * k)) for k in range(4)]
    return build_ts([{"stream_type": 0x1B, "pid": 0x100,
                      "units": units}])


FIXTURES = {
    "mp4": (_mp4_fixture(), probe_mp4),
    "mkv": (_mkv_fixture(), probe_mkv),
    "avi": (_avi_fixture(), probe_avi),
    "ts": (_ts_fixture(), probe_ts),
}


def _mutate(raw: bytes, kind: str, pos_frac: float, burst: int,
            seed: int) -> bytes:
    """Deterministic corruption: truncate at a fraction, flip a burst
    of bits, or splice random bytes over a window."""
    if not raw:
        return raw
    pos = min(len(raw) - 1, int(pos_frac * len(raw)))
    if kind == "truncate":
        return raw[:pos]
    buf = bytearray(raw)
    rng = np.random.default_rng(seed)
    if kind == "bitflip":
        for k in range(burst):
            p = (pos + k * 7) % len(buf)
            buf[p] ^= 1 << int(rng.integers(0, 8))
    else:  # splice
        end = min(len(buf), pos + burst)
        buf[pos:end] = bytes(rng.integers(0, 256, end - pos,
                                          dtype=np.uint8))
    return bytes(buf)


_MUT = st.tuples(
    st.sampled_from(["truncate", "bitflip", "splice"]),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=0, max_value=2 ** 31),
)


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
@settings(max_examples=120, deadline=None)
@given(_MUT)
def test_probe_never_raises_on_mutation(fmt, mut):
    raw, probe = FIXTURES[fmt]
    kind, pos, burst, seed = mut
    rows = probe(_mutate(raw, kind, pos, burst, seed))
    assert isinstance(rows, list) and len(rows) >= 1
    for r in rows:
        assert isinstance(r["ok"], bool)
        if not r["ok"]:
            assert isinstance(r["error"], str) and r["error"]


@pytest.mark.parametrize("fmt", sorted(FIXTURES))
@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600))
def test_probe_never_raises_on_noise(fmt, noise):
    _, probe = FIXTURES[fmt]
    rows = probe(noise)
    assert isinstance(rows, list) and len(rows) >= 1


@settings(max_examples=120, deadline=None)
@given(_MUT)
def test_mp4_frame_sample_degrades_to_zero_rows(mut):
    kind, pos, burst, seed = mut
    raw = _mutate(FIXTURES["mp4"][0], kind, pos, burst, seed)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "media": pa.array([raw], pa.binary())})
    out = SampleMP4Frames()(batch)
    # every emitted row must reference the input file; broken files
    # simply emit nothing (their diagnosis lives on the probe surface)
    assert out.num_rows >= 0
    if out.num_rows:
        assert set(out.column("media_id").to_pylist()) == {1}


def test_corrupted_corpus_through_ray_stages(ray_session):
    """A 64-file corpus of valid + mutated + noise blobs runs through
    every Probe stage under map_batches with ZERO task errors; mutated
    rows come back as ok=False data or fewer tracks, never exceptions."""
    import ray.data as rd

    from webxtract.ops.avi import ProbeAVI
    from webxtract.ops.mkv import ProbeMKV
    from webxtract.ops.mpegts import ProbeTS

    for fmt, stage in [("mp4", ProbeMP4()), ("mkv", ProbeMKV()),
                       ("avi", ProbeAVI()), ("ts", ProbeTS())]:
        raw = FIXTURES[fmt][0]
        blobs, ids = [], []
        for i in range(64):
            kind = ["truncate", "bitflip", "splice", "valid"][i % 4]
            blobs.append(raw if kind == "valid" else _mutate(
                raw, kind, (i % 16) / 16.0, 1 + i % 13, i))
            ids.append(i)
        ds = rd.from_arrow(pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media": pa.array(blobs, pa.binary())}))
        out = ds.map_batches(stage, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=16).to_pandas()
        assert len(out) >= 64 // 4  # at least the valid quarter
        assert set(out[out["ok"]]["media_id"]) >= set(range(3, 64, 4))
