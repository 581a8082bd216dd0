"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
container — task brief: make the Ray-side plumbing real and tested, gate
the real decode behind an import-try). What IS real:

  * the column convention: ``media`` (binary payload) + ``media_type``
    (string) + typed metadata struct appended by the decode stage;
  * actor-pool stage shape (decoder state loaded once per actor);
  * small-batch sizing for blob-heavy rows (SURVEY.md §4.2 skew note);
  * deterministic fake decode for tests: a 16-byte header
    ``WXMEDIA!<u32 w><u32 h>`` is parsed as an "image", giving the
    stage observable, checkable behavior end to end.

Real-image path: if PIL is importable the stage uses it; this container
never has it, so the fake-header path is the tested one.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

FAKE_MAGIC = b"WXMEDIA!"

MEDIA_META = pa.struct([
    ("ok", pa.bool_()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_bytes", pa.int64()),
    ("error", pa.string()),
])

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def make_fake_image(width: int, height: int, payload: bytes = b"") -> bytes:
    """Deterministic fake image bytes for tests/fixtures."""
    return FAKE_MAGIC + struct.pack("<II", width, height) + payload


class DecodeImage:
    """Actor-pool stage: binary media column -> metadata struct column.

    Run with a SMALL batch_size (e.g. 32) — media rows are large and
    batch x blob must fit the worker heap. Decode failures are data
    (ok=False + error), never task failures."""

    def __init__(self) -> None:
        self.have_pil = _HAVE_PIL

    def _decode_one(self, raw: bytes | None) -> tuple[bool, int, int, str | None]:
        if raw is None or len(raw) == 0:
            return False, 0, 0, "empty"
        if raw.startswith(FAKE_MAGIC):
            if len(raw) < 16:
                return False, 0, 0, "truncated_header"
            w, h = struct.unpack("<II", raw[8:16])
            return True, w, h, None
        if self.have_pil:  # pragma: no cover
            import io

            try:
                img = Image.open(io.BytesIO(raw))
                return True, img.width, img.height, None
            except Exception as e:
                return False, 0, 0, type(e).__name__
        return False, 0, 0, "unsupported_format"

    def __call__(self, batch: pa.Table) -> pa.Table:
        raws = batch.column("media")
        metas = []
        for i in range(len(raws)):
            ok, w, h, err = self._decode_one(raws[i].as_py())
            metas.append({
                "ok": ok, "width": w, "height": h,
                "n_bytes": len(raws[i].as_py() or b""), "error": err,
            })
        return batch.append_column("media_meta", pa.array(metas, MEDIA_META))


class ExtractImageFeatures:
    """Feature-extraction stage stub: emits a deterministic feature vector
    derived from the payload bytes (stands in for a vision model; the
    actor shape — model "loaded" in __init__, batched inference in
    __call__ — is the real contract)."""

    def __init__(self, dim: int = 16):
        self.dim = dim
        # stand-in "model weights": fixed projection seeded deterministically
        rng = np.random.RandomState(123)
        self.proj = rng.standard_normal((256, dim)).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for v in batch.column("media").to_pylist():
            if not v:
                feats.append([0.0] * self.dim)
                continue
            hist = np.bincount(
                np.frombuffer(v, dtype=np.uint8), minlength=256
            ).astype(np.float64)
            hist /= max(1.0, hist.sum())
            feats.append(np.round(hist @ self.proj, 9).tolist())
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64())))


def frame_sample_stub(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Video frame-sampling stub: real frame decode needs ffmpeg (absent);
    raises to make the gap explicit rather than silently fake."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg, not available in this "
        "environment; plumbing contract: media binary in, one row per "
        "sampled frame out (flat_map shape)")
