"""Pure-numpy WAV (RIFF PCM) codec + audio feature stages.

Like ops/imagecodec.py for images: uncompressed audio needs no external
library. 16-bit PCM WAV is parsed straight from bytes (RIFF chunk walk,
tolerant of extra chunks), giving the audio modality a REAL decode
path; compressed codecs (mp3/aac/...) remain explicitly unavailable.

Feature extraction is classic DSP over the sample array: duration,
RMS, peak, zero-crossing rate — all vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """1-D (mono) or 2-D (frames, channels) int16 -> WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    assert samples.dtype == np.int16
    frames, channels = samples.shape
    data = samples.tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(raw: bytes | None) -> tuple[np.ndarray, int] | None:
    """WAV bytes -> ((frames, channels) int16 array, sample_rate), or
    None for non-PCM16/corrupt input. Walks RIFF chunks, so files with
    LIST/INFO chunks before 'data' parse fine."""
    if not raw or len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        chunk = raw[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(chunk) >= 16:
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16 or channels < 1:
        return None
    n = len(data) // (2 * channels)
    if n == 0:
        return None
    arr = np.frombuffer(data[:n * 2 * channels], dtype="<i2")
    return arr.reshape(n, channels), rate


def wav_info(raw: bytes | None) -> dict | None:
    """Header-only metadata (no sample copy beyond the frombuffer view)."""
    out = decode_wav(raw)
    if out is None:
        return None
    arr, rate = out
    return {"rate": rate, "channels": int(arr.shape[1]),
            "n_frames": int(arr.shape[0]),
            "duration_s": round(arr.shape[0] / rate, 6)}


AUDIO_META = pa.struct([
    ("ok", pa.bool_()),
    ("rate", pa.int32()),
    ("channels", pa.int32()),
    ("n_frames", pa.int64()),
    ("duration_s", pa.float64()),
    ("error", pa.string()),
])


class DecodeAudio:
    """Actor-pool stage: binary ``media`` column -> AUDIO_META struct.
    Same contract as DecodeImage: bad payloads become ok=False DATA
    rows, never task failures."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = []
        for v in batch.column("media").to_pylist():
            if not v:
                metas.append({"ok": False, "rate": 0, "channels": 0,
                              "n_frames": 0, "duration_s": 0.0,
                              "error": "empty"})
                continue
            info = wav_info(v)
            if info is None:
                err = ("codec_unavailable" if v[:3] in (b"ID3", b"\xff\xfb")
                       else "unsupported_format")
                metas.append({"ok": False, "rate": 0, "channels": 0,
                              "n_frames": 0, "duration_s": 0.0,
                              "error": err})
            else:
                metas.append({"ok": True, "error": None, **info})
        return batch.append_column("audio_meta", pa.array(metas, AUDIO_META))


class ExtractAudioFeatures:
    """Actor-pool stage: decoded features per clip — RMS, peak,
    zero-crossing rate, and an ``n_bands`` mean-|amplitude| envelope
    over equal time slices (all vectorized numpy over the mono mix).
    Undecodable rows get a null feature vector."""

    def __init__(self, n_bands: int = 8):
        self.n_bands = n_bands

    def _features(self, arr: np.ndarray) -> list[float]:
        mono = arr.astype(np.float64).mean(axis=1) / 32768.0
        rms = float(np.sqrt((mono ** 2).mean()))
        peak = float(np.abs(mono).max())
        sign = np.signbit(mono)
        zcr = float(np.count_nonzero(sign[1:] != sign[:-1])) / max(
            1, mono.size - 1)
        edges = (np.arange(self.n_bands + 1) * mono.size) // self.n_bands
        env = [float(np.abs(mono[a:b]).mean()) if b > a else 0.0
               for a, b in zip(edges[:-1], edges[1:])]
        return [round(x, 9) for x in ([rms, peak, zcr] + env)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for v in batch.column("media").to_pylist():
            out = decode_wav(v)
            feats.append(None if out is None else self._features(out[0]))
        return batch.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float64())))


def resample_nearest(samples: np.ndarray, src_rate: int,
                     dst_rate: int) -> np.ndarray:
    """Nearest-sample resample (no filtering) — the plumbing-level
    rate-normalization stage; swap for a polyphase filter when scipy
    exists."""
    if src_rate == dst_rate:
        return samples
    n_out = int(round(samples.shape[0] * dst_rate / src_rate))
    idx = np.minimum((np.arange(n_out) * src_rate) // dst_rate,
                     samples.shape[0] - 1)
    return samples[idx]
