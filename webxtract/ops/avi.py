"""AVI (RIFF) demux WITHOUT ffmpeg — the third container family.

AVI is the classic carrier of Motion-JPEG ('MJPG' handler — what
digital cameras and capture hardware have written for thirty years),
and RIFF is a public Microsoft/IBM spec (the same chunk grammar as
WAV, which ops/audiocodec.py already walks). Together with
ops/mp4.py (ISO BMFF) and ops/mkv.py (EBML) this scopes the
containerized-video gap down to MPEG-TS + compressed bitstreams.

Real here:

  * `build_avi` — muxer: RIFF('AVI ') with LIST hdrl (avih +
    per-stream LIST strl: strh/strf BITMAPINFOHEADER), LIST movi
    ('##dc' frame chunks, odd sizes padded to even per RIFF), and
    an optional idx1 index written in EITHER offset convention —
    movi-relative (the spec) or absolute (what many real muxers
    emit; ffmpeg sniffs which, and so do we);
  * `parse_avi` — chunk walk + header parse + sequential movi frame
    recovery; when idx1 is present its extents are resolved by
    sniffing the offset convention against the first frame chunk
    and cross-checked against the walk (disagreement degrades the
    file to an error row, never a wrong frame);
  * REAL decode for MJPG streams via the in-repo T.81 codec;
    other handlers (XVID/H264/...) demux and yield
    decodable=false.

Scale shape identical to the other containers: file = row,
demux = map-side arithmetic, near-dup ships 8 B signatures.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


class AVIError(ValueError):
    pass


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def build_avi(streams: list[dict], with_idx1: bool = True,
              idx1_absolute: bool = False) -> bytes:
    """Mux frame payloads into a valid AVI.

    Each stream dict: ``handler`` (4cc, e.g. 'MJPG', 'XVID'),
    ``width``, ``height``, ``frames`` (list[bytes]), ``fps_num`` /
    ``fps_den`` (rate/scale). ``with_idx1`` appends the idx1 index;
    ``idx1_absolute`` writes file-absolute offsets instead of the
    spec's movi-relative ones (both occur in the wild)."""
    n_streams = len(streams)
    total = max((len(s["frames"]) for s in streams), default=0)
    s0 = streams[0] if streams else {"fps_num": 25, "fps_den": 1,
                                     "width": 0, "height": 0}
    usec = s0["fps_den"] * 1_000_000 // s0["fps_num"]
    avih = _chunk(b"avih", struct.pack(
        "<14I", usec, 0, 0, 0x10, total, 0, n_streams, 0,
        s0["width"], s0["height"], 0, 0, 0, 0))
    strls = b""
    for s in streams:
        strh = _chunk(b"strh", b"vids" + s["handler"].encode("ascii")
                      + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                    s["fps_den"], s["fps_num"], 0,
                                    len(s["frames"]), 0, 0xFFFFFFFF, 0)
                      + struct.pack("<4h", 0, 0, s["width"], s["height"]))
        strf = _chunk(b"strf", struct.pack(
            "<IiiHH4sIiiII", 40, s["width"], s["height"], 1, 24,
            s["handler"].encode("ascii"),
            sum(len(f) for f in s["frames"]), 0, 0, 0, 0))
        strls += _list(b"strl", strh + strf)
    hdrl = _list(b"hdrl", avih + strls)

    movi_payload = b""
    index = []  # (ckid, rel_offset, size)
    for si, s in enumerate(streams):
        cid = f"{si:02d}dc".encode("ascii")
        for f in s["frames"]:
            index.append((cid, 4 + len(movi_payload), len(f)))
            movi_payload += _chunk(cid, f)
    movi = _list(b"movi", movi_payload)

    riff_payload = b"AVI " + hdrl + movi
    if with_idx1:
        # movi-relative offsets point at the chunk HEADER measured
        # from the start of the LIST payload ('movi' fourcc = 0);
        # absolute offsets add the position of that payload in file.
        movi_pos = 12 + len(hdrl) + 8  # RIFF hdr + hdrl + LIST hdr
        entries = b""
        for cid, rel, size in index:
            off = rel + movi_pos if idx1_absolute else rel
            entries += cid + struct.pack("<III", 0x10, off, size)
        riff_payload += _chunk(b"idx1", entries)
    return _chunk(b"RIFF", riff_payload)


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end); chunks are
    even-aligned per RIFF."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i:i + 4]
        size = struct.unpack_from("<I", buf, i + 4)[0]
        ps = i + 8
        if ps + size > end:
            raise AVIError(f"chunk {fourcc!r} overruns container")
        yield fourcc, ps, ps + size
        i = ps + size + (size % 2)
    if i < end:
        raise AVIError("trailing bytes are not a chunk")


def parse_avi(raw: bytes) -> dict:
    """Full demux: returns ``{"usec_per_frame", "streams": [...]}``
    where each stream carries handler/compression/dims/fps and
    ``frames`` — (offset, size) extents into ``raw`` recovered by the
    movi walk, cross-checked against idx1 when present."""
    if raw is None or len(raw) < 20 or raw[:4] != b"RIFF" \
            or raw[8:12] != b"AVI ":
        raise AVIError("not a RIFF AVI")
    size = struct.unpack_from("<I", raw, 4)[0]
    end = min(8 + size, len(raw))
    if 8 + size > len(raw):
        raise AVIError("RIFF size overruns file")

    usec = 0
    streams: list[dict] = []
    movi_span = None
    idx1_span = None
    for fourcc, s, e in _chunks(raw, 12, end):
        if fourcc == b"LIST":
            kind = raw[s:s + 4]
            if kind == b"hdrl":
                for f2, s2, e2 in _chunks(raw, s + 4, e):
                    if f2 == b"avih":
                        usec = struct.unpack_from("<I", raw, s2)[0]
                    elif f2 == b"LIST" and raw[s2:s2 + 4] == b"strl":
                        st: dict = {}
                        for f3, s3, e3 in _chunks(raw, s2 + 4, e2):
                            if f3 == b"strh":
                                st["type"] = raw[s3:s3 + 4].decode(
                                    "latin-1")
                                st["handler"] = raw[s3 + 4:s3 + 8].decode(
                                    "latin-1").strip("\x00 ")
                                scale, rate = struct.unpack_from(
                                    "<II", raw, s3 + 20)
                                st["fps_num"], st["fps_den"] = rate, scale
                                st["declared_frames"] = \
                                    struct.unpack_from(
                                        "<I", raw, s3 + 32)[0]
                            elif f3 == b"strf":
                                (_, w, h) = struct.unpack_from(
                                    "<Iii", raw, s3)
                                st["width"], st["height"] = w, abs(h)
                                st["compression"] = \
                                    raw[s3 + 16:s3 + 20].decode(
                                        "latin-1").strip("\x00 ")
                        streams.append(st)
            elif kind == b"movi":
                movi_span = (s + 4, e)
        elif fourcc == b"idx1":
            idx1_span = (s, e)
    if movi_span is None or not streams:
        raise AVIError("missing movi list or stream headers")

    frames: list[list[tuple[int, int]]] = [[] for _ in streams]
    for fourcc, s, e in _chunks(raw, movi_span[0], movi_span[1]):
        tag = fourcc.decode("latin-1", "replace")
        if len(tag) == 4 and tag[:2].isdigit() and tag[2:] in ("dc", "db"):
            si = int(tag[:2])
            if si >= len(streams):
                raise AVIError(f"frame chunk for undeclared stream {si}")
            frames[si].append((s, e - s))

    if idx1_span is not None:
        # sniff the offset convention against the first frame chunk:
        # spec says movi-payload-relative ('movi' fourcc at 0), many
        # muxers write absolute. Then cross-check every entry.
        entries = []
        s, e = idx1_span
        for o in range(s, e, 16):
            cid = raw[o:o + 4].decode("latin-1", "replace")
            off, sz = struct.unpack_from("<II", raw, o + 8)
            entries.append((cid, off, sz))
        data_entries = [x for x in entries
                        if len(x[0]) == 4 and x[0][:2].isdigit()]
        if data_entries:
            first_walk = min((f[0] for fl in frames for f in fl),
                             default=None)
            if first_walk is not None:
                base_rel = movi_span[0] - 4  # 'movi' fourcc position
                off0 = data_entries[0][1]
                base = base_rel if abs((off0 + base_rel + 8)
                                       - first_walk) <= 8 else 0
                walk_set = {(f[0], f[1]) for fl in frames for f in fl}
                for cid, off, sz in data_entries:
                    ext = (off + base + 8, sz)
                    if ext not in walk_set:
                        raise AVIError(
                            "idx1 disagrees with the movi walk "
                            f"({cid} @ {off})")
    for st, fl in zip(streams, frames):
        st["frames"] = fl
    return {"usec_per_frame": usec, "streams": streams}


_DECODABLE = ("MJPG",)


def probe_avi(raw: bytes | None) -> list[dict]:
    try:
        info = parse_avi(raw)
    except (ValueError, struct.error, IndexError, KeyError, OverflowError) as exc:
        return [{"stream_id": -1, "handler": "", "compression": "",
                 "width": -1, "height": -1, "n_frames": -1,
                 "duration_ms": -1, "frame_bytes": -1,
                 "decodable": False, "ok": False, "error": str(exc)[:120]}]
    rows = []
    for si, st in enumerate(info["streams"]):
        nf = len(st["frames"])
        dur = (nf * 1000 * st["fps_den"] // st["fps_num"]
               if st.get("fps_num") else -1)
        rows.append({
            "stream_id": si, "handler": st.get("handler", ""),
            "compression": st.get("compression", ""),
            "width": st.get("width", -1), "height": st.get("height", -1),
            "n_frames": nf, "duration_ms": dur,
            "frame_bytes": sum(sz for _, sz in st["frames"]),
            "decodable": st.get("handler") in _DECODABLE,
            "ok": True, "error": None,
        })
    if not rows:
        return [{"stream_id": -1, "handler": "", "compression": "",
                 "width": -1, "height": -1, "n_frames": -1,
                 "duration_ms": -1, "frame_bytes": -1,
                 "decodable": False, "ok": False, "error": "no streams"}]
    return rows


# ---------------------------------------------------------------------------
# Ray stages + surfaces
# ---------------------------------------------------------------------------


class ProbeAVI:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        cols = {k: [] for k in ("media_id", "stream_id", "handler",
                                "compression", "width", "height",
                                "n_frames", "duration_ms", "frame_bytes",
                                "decodable", "ok", "error")}
        for mid, raw in zip(ids, blobs):
            for row in probe_avi(raw):
                cols["media_id"].append(mid)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.int64()),
            "stream_id": pa.array(cols["stream_id"], pa.int64()),
            "handler": pa.array(cols["handler"], pa.string()),
            "compression": pa.array(cols["compression"], pa.string()),
            "width": pa.array(cols["width"], pa.int64()),
            "height": pa.array(cols["height"], pa.int64()),
            "n_frames": pa.array(cols["n_frames"], pa.int64()),
            "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
            "frame_bytes": pa.array(cols["frame_bytes"], pa.int64()),
            "decodable": pa.array(cols["decodable"], pa.bool_()),
            "ok": pa.array(cols["ok"], pa.bool_()),
            "error": pa.array(cols["error"], pa.string()),
        })


class SampleAVIFrames:
    """Flat stage: one AVI row in -> one row per sampled frame of its
    FIRST MJPG stream out; same schema as the MP4/MKV/MJPEG samplers
    so the shared near-dup back half composes unchanged."""

    def __init__(self, every_n: int = 1):
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpegcodec import jpeg_dims

        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        o_id, o_idx, o_n, o_raw, o_w, o_h = [], [], [], [], [], []
        for mid, raw in zip(ids, blobs):
            try:
                info = parse_avi(raw)
            except (ValueError, struct.error, IndexError, KeyError, OverflowError):
                continue
            st = next((s for s in info["streams"]
                       if s.get("handler") in _DECODABLE), None)
            if st is None:
                continue
            fl = st["frames"]
            for k in range(0, len(fl), self.every_n):
                o, sz = fl[k]
                frame = raw[o:o + sz]
                dims = jpeg_dims(frame)
                w, h = dims if dims else (-1, -1)
                o_id.append(mid)
                o_idx.append(k)
                o_n.append(len(fl))
                o_raw.append(frame)
                o_w.append(w)
                o_h.append(h)
        return pa.table({
            "media_id": pa.array(o_id, pa.int64()),
            "frame_idx": pa.array(o_idx, pa.int64()),
            "n_frames": pa.array(o_n, pa.int64()),
            "media": pa.array(o_raw, pa.binary()),
            "width": pa.array(o_w, pa.int32()),
            "height": pa.array(o_h, pa.int32()),
        })


def sample_avi_frames(ds, every_n: int = 1, batch_size: int = 16):
    stage = SampleAVIFrames(every_n)
    return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


# --- fixtures + surfaces ----------------------------------------------------


def synth_avi_probe_corpus(sf_dir: str, n: int | None = None):
    """Deterministic mixed-handler AVI corpus; every probed field
    closed-form from doc_id:

      handler:   doc_id % 3 -> 0: XVID, 1: MJPG, 2: H264
      n_frames:  3 + doc_id % 6; fps 25/1
      dims:      (64 + 8*(doc_id % 5), 48 + 8*(doc_id % 4))
      frame k:   150 + (17*doc_id + 9*k) % 120 bytes (odd sizes
                 exercise RIFF even-padding)
      idx1:      absent when doc_id % 5 == 0; absolute offsets when
                 doc_id % 5 in (1, 2); movi-relative otherwise"""
    from ..fixturecache import cached_ds
    import ray.data as rd

    def build():
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
        return ids.map_batches(_render_probe_fixture,
                               batch_format="pyarrow", batch_size=64)

    if n is None:
        return cached_ds("avi_probe_corpus", sf_dir, build,
                         render_fn=_render_probe_fixture)
    return build()


def _render_probe_fixture(batch: pa.Table) -> pa.Table:
    handlers = ["XVID", "MJPG", "H264"]
    out_id, out_raw = [], []
    for i in batch.column("doc_id").to_pylist():
        nf = 3 + i % 6
        frames = [bytes([(i + k) & 0xFF]) * (150 + (17 * i + 9 * k) % 120)
                  for k in range(nf)]
        stream = {"handler": handlers[i % 3],
                  "width": 64 + 8 * (i % 5), "height": 48 + 8 * (i % 4),
                  "frames": frames, "fps_num": 25, "fps_den": 1}
        out_id.append(i)
        out_raw.append(build_avi(
            [stream], with_idx1=i % 5 != 0,
            idx1_absolute=i % 5 in (1, 2)))
    return pa.table({"media_id": pa.array(out_id, pa.int64()),
                     "media": pa.array(out_raw, pa.binary())})


def synth_avi_corpus(sf_dir: str, n: int | None = None):
    """MJPG-in-AVI twin of synth_video_corpus (same mosaic frames and
    planted near-dup scheme), idx1 conventions varied per file."""
    from ..fixturecache import cached_ds
    import ray.data as rd

    def build():
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
        return ids.map_batches(_render_mjpg_avi, batch_format="pyarrow",
                               batch_size=32)

    if n is None:
        return cached_ds("avi_mjpg_corpus", sf_dir, build,
                         render_fn=_render_mjpg_avi)
    return build()


def _render_mjpg_avi(batch: pa.Table) -> pa.Table:
    from .jpegcodec import encode_jpeg

    out_id, out_raw = [], []
    for i in batch.column("doc_id").to_pylist():
        dup = i % 10 == 5
        seed = i - 1 if dup else i
        rng = np.random.default_rng(seed + (1 << 40))  # video family
        blocks = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
        nf = 4 + seed % 5 - (1 if dup else 0)
        frames = []
        for k in range(nf):
            img = np.repeat(np.repeat(np.roll(blocks, -k, axis=1),
                                      8, axis=0), 8, axis=1)
            if dup:
                img = img.copy()
                img[0, 0, 0] ^= 1
            frames.append(encode_jpeg(np.ascontiguousarray(img),
                                      quality=95, subsampling="444"))
        stream = {"handler": "MJPG", "width": 72, "height": 64,
                  "frames": frames, "fps_num": 25, "fps_den": 1}
        out_id.append(i)
        out_raw.append(build_avi(
            [stream], with_idx1=i % 5 != 0,
            idx1_absolute=i % 5 in (1, 2)))
    return pa.table({"media_id": pa.array(out_id, pa.int64()),
                     "media": pa.array(out_raw, pa.binary())})


def videos_avi_probe(sf_dir: str):
    """Query surface, ORACLED: probe the mixed-handler AVI corpus;
    every field closed-form from doc_id (see synth_avi_probe_corpus)."""
    probe = ProbeAVI()
    ds = synth_avi_probe_corpus(sf_dir).map_batches(
        lambda b: probe(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
    return ds.select_columns(["media_id", "handler", "width", "height",
                              "n_frames", "duration_ms", "frame_bytes",
                              "decodable"])


def videos_avi_frame_sample(sf_dir: str):
    """Query surface, ORACLED: demux the MJPG-in-AVI corpus, sample
    every 2nd frame through the REAL RIFF walk + T.81 SOF parse; same
    closed form as the MJPEG/MP4/MKV twins."""
    frames = sample_avi_frames(synth_avi_corpus(sf_dir), every_n=2)
    return frames.select_columns(
        ["media_id", "frame_idx", "n_frames", "width", "height"])


def videos_avi_dupes(sf_dir: str):
    """Query surface (rows-only): frame-level perceptual near-dup
    mining over the AVI corpus; planted pairs asserted in
    tests/test_avi.py."""
    from .media import frame_neardup_pairs

    pairs = frame_neardup_pairs(
        sample_avi_frames(synth_avi_corpus(sf_dir), every_n=2),
        max_dist=4, min_overlap=0.5, verify="auto")
    return pairs.sort(["video_a", "video_b"])
