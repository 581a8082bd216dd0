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


# --- envelope hashing + near-duplicate audio --------------------------------

def envelope_hash64(samples: np.ndarray) -> int:
    """64-bit audio difference hash (the dhash64 analog): mono mix ->
    65-segment mean-|amplitude| envelope -> adjacent-difference sign
    bits. Robust to re-encoding/level-preserving edits; 8 B per clip."""
    mono = samples.astype(np.float64).mean(axis=1)
    n = mono.size
    if n < 65:
        mono = np.pad(mono, (0, 65 - n))
        n = 65
    edges = (np.arange(66, dtype=np.int64) * n) // 65
    c = np.concatenate([[0.0], np.cumsum(np.abs(mono))])
    seg = (c[edges[1:]] - c[edges[:-1]]) / np.maximum(
        edges[1:] - edges[:-1], 1)
    bits = seg[1:] > seg[:-1]
    return int(np.packbits(bits).view(">u8")[0])


class EnvHashAudio:
    """media (WAV bytes) -> banded signature rows (doc_id, band,
    band_key, sig) — the same schema the ops/dedup banded-LSH +
    hamming-verify machinery consumes (shared with images)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        out_doc, out_band, out_key, out_sig = [], [], [], []
        for i, raw in zip(ids, blobs):
            out = decode_wav(raw)
            if out is None:
                continue
            sig = envelope_hash64(out[0])
            for band in range(4):
                out_doc.append(i)
                out_band.append(band)
                out_key.append((sig >> (16 * band)) & 0xFFFF)
                out_sig.append(sig - (1 << 63))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            "sig": pa.array(out_sig, pa.int64()),
        })


def audio_neardup_pairs(ds, max_dist: int = 4, verify: str = "auto"):
    """media Dataset (media_id, media WAV bytes) -> near-duplicate clip
    pairs (hamming over envelope_hash64 <= max_dist); banded-LSH
    candidates + hamming verify shared verbatim with the image path
    (ops/dedup.banded_hamming_pairs) — signatures are 8 B/clip, samples
    never shuffle."""
    from .dedup import banded_hamming_pairs

    hasher = EnvHashAudio()
    sig = ds.map_batches(lambda b: hasher(b), batch_format="pyarrow",
                         zero_copy_batch=True,
                         batch_size=64).materialize()
    return banded_hamming_pairs(sig, max_dist, verify)


def synth_audio_corpus(sf_dir: str, n: int | None = None,
                       rate: int = 8000, seconds: float = 0.5):
    """Deterministic WAV corpus keyed on the documents table ids:
    seeded 65-segment random amplitude envelopes carried by unit noise
    (so the envelope hash has full 64-bit entropy), every 10th clip a
    sub-threshold variant of its predecessor (one envelope segment
    nudged 2%). Pure plumbing fixture — real corpora read binary
    columns from parquet."""
    import ray.data as rd

    n_samp = int(rate * seconds)

    def render(batch: pa.Table) -> pa.Table:
        out_id, out_raw = [], []
        for i in batch.column("doc_id").to_pylist():
            seed = i - 1 if i % 10 == 5 else i
            rng = np.random.default_rng(seed)
            env = rng.uniform(0.05, 1.0, size=65)
            noise = rng.uniform(-1.0, 1.0, size=n_samp)
            if i % 10 == 5:
                env = env.copy()
                env[i % 65] *= 1.02  # sub-threshold nudge
            seg = (np.arange(n_samp, dtype=np.int64) * 65) // n_samp
            mono = noise * env[seg]
            pcm = np.clip(np.round(mono * 20000), -32768,
                          32767).astype(np.int16)[:, None]
            out_id.append(i)
            out_raw.append(encode_wav(pcm, rate))
        return pa.table({"media_id": pa.array(out_id, pa.int64()),
                         "media": pa.array(out_raw, pa.binary())})

    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    if n is not None:
        ids = ids.limit(n)
    try:
        import ray

        ids = ids.repartition(
            max(2, int(ray.cluster_resources().get("CPU", 8))))
    except Exception:
        pass
    return ids.map_batches(render, batch_format="pyarrow", batch_size=64)


def audios_envelope_dupes(sf_dir: str):
    """Query-surface wrapper: synthesize the deterministic WAV corpus
    for sf_dir's documents and mine near-dup clip pairs (rows-only;
    planted pairs asserted in tests)."""
    pairs = audio_neardup_pairs(synth_audio_corpus(sf_dir), max_dist=4)
    return pairs.sort(["doc_a", "doc_b"])
