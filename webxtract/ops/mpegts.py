"""MPEG-TS demux WITHOUT ffmpeg — the last container family.

MPEG transport streams (ISO/IEC 13818-1) are the HLS segment format
(.ts), so a web crawl sees them constantly. The container is
188-byte fixed packets + PSI tables (PAT -> PMT) + PES packets; demux
needs no codec library. Unlike MP4/MKV/AVI there is NO standard
JPEG-in-TS stream type, so this module is honest ffprobe-level
support: program/stream enumeration, PES payload reassembly, PTS
timing, continuity-counter integrity — the payloads themselves are
compressed bitstreams (H.264/MPEG-2/AAC), the declared ffmpeg gap.

Real here:

  * `build_ts` — muxer: PAT + PMT with spec CRC32-MPEG, PES
    packetization into 188-byte cells with adaptation-field
    stuffing, per-PID continuity counters, optional PCR, null
    packets, and BOTH PES length forms (bounded, and the
    length=0 "unbounded video" form ended by the next PUSI);
  * `parse_ts` — the packet-grid walk (resyncs on lost 0x47),
    PAT/PMT parse with CRC verification, per-PID PES reassembly,
    PTS extraction, continuity-counter gap counting (cc_errors as
    DATA — corrupted-in-transit segments are the norm, not an
    exception);
  * `probe_ts` — ffprobe-shaped per-elementary-stream rows;
    malformed input degrades to ok=False rows.

Scale shape: same as the other containers — file (HLS segment) =
row, demux map-side; at 100 TB the unit of parallelism is the
segment file, which HLS conveniently pre-shards to ~2-10 s each.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_PKT = 188
_PID_PAT = 0x0000
_PID_NULL = 0x1FFF

_STREAM_TYPES = {0x01: "mpeg1video", 0x02: "mpeg2video", 0x03: "mp2",
                 0x0F: "aac", 0x06: "private_pes", 0x1B: "h264",
                 0x24: "hevc", 0x21: "jpeg2000"}


class TSError(ValueError):
    pass


def _crc32_mpeg(data: bytes) -> int:
    """MPEG-2/DVB PSI CRC32: poly 0x04C11DB7, init 0xFFFFFFFF, no
    reflection, no final xor."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------


class _Packetizer:
    def __init__(self):
        self.out = bytearray()
        self.cc = {}

    def _header(self, pid: int, pusi: bool, adaptation: bool,
                payload: bool) -> bytes:
        cc = self.cc.get(pid, 0)
        if payload:
            self.cc[pid] = (cc + 1) & 0x0F
        b1 = (0x40 if pusi else 0) | (pid >> 8)
        b3 = ((0x20 if adaptation else 0) | (0x10 if payload else 0)
              | cc)
        return bytes([0x47, b1, pid & 0xFF, b3])

    def emit(self, pid: int, data: bytes, pcr: int | None = None):
        """Packetize one PES/PSI unit onto this PID: PUSI on the first
        cell, adaptation-field stuffing on the last partial cell."""
        i = 0
        first = True
        while i < len(data) or first:
            room = _PKT - 4
            chunk = data[i:i + room]
            need_af = len(chunk) < room or (first and pcr is not None)
            af = b""
            if need_af:
                stuff = room - len(chunk)
                if first and pcr is not None:
                    base = pcr // 300
                    ext = pcr % 300
                    pcr_f = bytes([
                        (base >> 25) & 0xFF, (base >> 17) & 0xFF,
                        (base >> 9) & 0xFF, (base >> 1) & 0xFF,
                        ((base & 1) << 7) | 0x7E | (ext >> 8),
                        ext & 0xFF])
                    body = bytes([0x10]) + pcr_f
                else:
                    body = b"\x00"
                if stuff < len(body) + 1:
                    # not enough room: split chunk smaller
                    chunk = data[i:i + room - len(body) - 1]
                    stuff = room - len(chunk)
                af = bytes([stuff - 1]) + body \
                    + b"\xff" * (stuff - 1 - len(body))
            self.out += self._header(pid, first, bool(af), True)
            self.out += af + chunk
            assert len(self.out) % _PKT == 0
            i += len(chunk)
            first = False
            pcr = None

    def null(self):
        self.out += bytes([0x47, 0x1F, 0xFF, 0x10]) + b"\xff" * 184


def _psi_section(table_id: int, table_id_ext: int, body: bytes) -> bytes:
    sec = bytes([table_id])
    payload = struct.pack(">HBBB", table_id_ext, 0xC1, 0, 0) + body
    length = len(payload) + 4  # + CRC
    sec += struct.pack(">H", 0xB000 | length) + payload
    sec += struct.pack(">I", _crc32_mpeg(sec))
    return b"\x00" + sec  # pointer_field = 0


def _pes(stream_id: int, payload: bytes, pts: int,
         bounded: bool) -> bytes:
    flags = struct.pack(">BBB", 0x80, 0x80, 5)  # PTS only
    p = bytes([
        0x20 | (((pts >> 30) & 7) << 1) | 1,
        (pts >> 22) & 0xFF, (((pts >> 15) & 0x7F) << 1) | 1,
        (pts >> 7) & 0xFF, ((pts & 0x7F) << 1) | 1])
    inner = flags + p + payload
    length = len(inner) if bounded else 0
    if length > 0xFFFF:
        raise ValueError("bounded PES too long")
    return b"\x00\x00\x01" + bytes([stream_id]) \
        + struct.pack(">H", length) + inner


def build_ts(streams: list[dict], bounded_pes: bool = True,
             with_pcr: bool = True, null_every: int = 0) -> bytes:
    """Mux elementary streams into a single-program transport stream.

    Each stream dict: ``stream_type`` (13818-1 code, e.g. 0x1B),
    ``pid``, ``units`` (list of (pts_90khz, payload bytes)).
    ``bounded_pes=False`` writes the length-0 unbounded video form
    (ended by the next PUSI — the form real encoders use for video).
    ``null_every`` sprinkles a null packet after every Nth PES."""
    pk = _Packetizer()
    pmt_pid = 0x0080
    # PAT: program 1 -> PMT PID
    pk.emit(_PID_PAT, _psi_section(
        0x00, 1, struct.pack(">HH", 1, 0xE000 | pmt_pid)))
    # PMT
    es = b"".join(struct.pack(">BHH", s["stream_type"],
                              0xE000 | s["pid"], 0xF000)
                  for s in streams)
    pcr_pid = streams[0]["pid"] if streams else 0x1FFF
    pk.emit(pmt_pid, _psi_section(
        0x02, 1, struct.pack(">HH", 0xE000 | pcr_pid, 0xF000) + es))
    # PES units in PTS order per stream, interleaved by unit index
    max_units = max((len(s["units"]) for s in streams), default=0)
    count = 0
    for k in range(max_units):
        for s in streams:
            if k >= len(s["units"]):
                continue
            pts, payload = s["units"][k]
            pk.emit(s["pid"],
                    _pes(0xE0, payload, pts, bounded_pes),
                    pcr=pts * 300 if with_pcr and k == 0 else None)
            count += 1
            if null_every and count % null_every == 0:
                pk.null()
    return bytes(pk.out)


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------


def _parse_psi(payload: bytes):
    """pointer_field-led PSI section -> (table_id, body, ok_crc)."""
    ptr = payload[0]
    s = 1 + ptr
    table_id = payload[s]
    length = struct.unpack_from(">H", payload, s + 1)[0] & 0x0FFF
    sec = payload[s:s + 3 + length]
    if len(sec) < 3 + length:
        raise TSError("truncated PSI section")
    crc_ok = _crc32_mpeg(sec[:-4]) == struct.unpack(">I", sec[-4:])[0]
    body = sec[8:-4]  # past table_id_ext/version/section numbers
    return table_id, body, crc_ok


def _parse_pes(data: bytes):
    """Reassembled PES bytes -> (pts | None, payload bytes)."""
    if data[:3] != b"\x00\x00\x01":
        raise TSError("PES start code missing")
    length = struct.unpack_from(">H", data, 4)[0]
    hdr_len = data[8]
    pts = None
    if data[7] & 0x80:
        p = data[9:14]
        pts = (((p[0] >> 1) & 7) << 30) | (p[1] << 22) \
            | ((p[2] >> 1) << 15) | (p[3] << 7) | (p[4] >> 1)
    start = 9 + hdr_len
    end = 6 + length if length else len(data)
    if end > len(data):
        raise TSError("PES length overruns data")
    return pts, data[start:end]


def parse_ts(raw: bytes) -> dict:
    """Full demux: packet grid walk (resync on lost 0x47) -> PAT/PMT
    (CRC-verified) -> per-PID PES reassembly with continuity-counter
    gap counting. Returns ``{"programs": {num: pmt_pid},
    "streams": [{pid, stream_type, codec, units: [(pts, bytes)],
    cc_errors}]}``."""
    if raw is None or len(raw) < _PKT:
        raise TSError("not a transport stream: too short")
    # resync: find the first offset where 5 consecutive sync bytes hold
    sync = -1
    for o in range(min(len(raw) - _PKT, _PKT * 2)):
        if all(raw[o + j * _PKT] == 0x47
               for j in range(min(5, (len(raw) - o) // _PKT))):
            sync = o
            break
    if sync < 0:
        raise TSError("no TS sync")

    programs: dict[int, int] = {}
    es_types: dict[int, int] = {}
    buffers: dict[int, bytearray] = {}
    units: dict[int, list] = {}
    cc_last: dict[int, int] = {}
    cc_errors: dict[int, int] = {}
    pes_errors: dict[int, int] = {}
    pmt_pids: set[int] = set()

    def flush(pid: int):
        buf = buffers.get(pid)
        if not buf:
            return
        data = bytes(buf)
        buffers[pid] = bytearray()
        try:
            pts, payload = _parse_pes(data)
        except (ValueError, struct.error, IndexError, KeyError, OverflowError):
            # a transit-damaged PES (lost packet) is DATA, not a file
            # failure — count it and keep demuxing, like ffmpeg
            pes_errors[pid] = pes_errors.get(pid, 0) + 1
            return
        units.setdefault(pid, []).append((pts, payload))

    n = (len(raw) - sync) // _PKT
    for j in range(n):
        o = sync + j * _PKT
        if raw[o] != 0x47:
            continue  # tolerate isolated corruption
        b1, b2, b3 = raw[o + 1], raw[o + 2], raw[o + 3]
        pid = ((b1 & 0x1F) << 8) | b2
        pusi = bool(b1 & 0x40)
        has_af = bool(b3 & 0x20)
        has_pl = bool(b3 & 0x10)
        cc = b3 & 0x0F
        if pid == _PID_NULL or not has_pl:
            continue
        p = o + 4
        if has_af:
            p += 1 + raw[p]
        if p > o + _PKT:
            raise TSError("adaptation field overruns packet")
        payload = raw[p:o + _PKT]
        if pid in cc_last and ((cc_last[pid] + 1) & 0x0F) != cc:
            cc_errors[pid] = cc_errors.get(pid, 0) + 1
        cc_last[pid] = cc

        if pid == _PID_PAT:
            tid, body, ok = _parse_psi(payload)
            if not ok:
                raise TSError("PAT CRC mismatch")
            for q in range(0, len(body), 4):
                prog, ppid = struct.unpack_from(">HH", body, q)
                if prog != 0:
                    programs[prog] = ppid & 0x1FFF
                    pmt_pids.add(ppid & 0x1FFF)
        elif pid in pmt_pids:
            tid, body, ok = _parse_psi(payload)
            if not ok:
                raise TSError("PMT CRC mismatch")
            q = 4  # past PCR PID + program_info_length (no descriptors)
            info_len = struct.unpack_from(">H", body, 2)[0] & 0x0FFF
            q += info_len
            while q + 5 <= len(body):
                st = body[q]
                epid = struct.unpack_from(">H", body, q + 1)[0] & 0x1FFF
                eil = struct.unpack_from(">H", body, q + 3)[0] & 0x0FFF
                es_types[epid] = st
                q += 5 + eil
        elif pid in es_types:
            if pusi:
                flush(pid)
            buffers.setdefault(pid, bytearray()).extend(payload)
    for pid in list(buffers):
        flush(pid)
    streams = []
    for pid in sorted(es_types):
        st = es_types[pid]
        streams.append({
            "pid": pid, "stream_type": st,
            "codec": _STREAM_TYPES.get(st, f"0x{st:02x}"),
            "units": units.get(pid, []),
            "cc_errors": cc_errors.get(pid, 0),
            "pes_errors": pes_errors.get(pid, 0),
        })
    if not programs:
        raise TSError("no PAT program")
    return {"programs": programs, "streams": streams}


def probe_ts(raw: bytes | None) -> list[dict]:
    """ffprobe-shaped per-elementary-stream rows; malformed input
    degrades to ok=False DATA rows. duration_ms spans first->last PTS
    plus one nominal frame (the convention that makes a single-PES
    stream non-zero-length is NOT applied — duration is the PTS span,
    matching ffprobe's start/end report)."""
    try:
        info = parse_ts(raw)
    except (ValueError, struct.error, IndexError, KeyError, OverflowError) as exc:
        return [{"pid": -1, "stream_type": -1, "codec": "",
                 "n_pes": -1, "payload_bytes": -1, "duration_ms": -1,
                 "cc_errors": -1, "pes_errors": -1,
                 "ok": False, "error": str(exc)[:120]}]
    rows = []
    for s in info["streams"]:
        pts = [p for p, _ in s["units"] if p is not None]
        dur = (max(pts) - min(pts)) // 90 if pts else -1
        rows.append({
            "pid": s["pid"], "stream_type": s["stream_type"],
            "codec": s["codec"], "n_pes": len(s["units"]),
            "payload_bytes": sum(len(b) for _, b in s["units"]),
            "duration_ms": dur, "cc_errors": s["cc_errors"],
            "pes_errors": s["pes_errors"],
            "ok": True, "error": None,
        })
    if not rows:
        return [{"pid": -1, "stream_type": -1, "codec": "",
                 "n_pes": -1, "payload_bytes": -1, "duration_ms": -1,
                 "cc_errors": -1, "pes_errors": -1,
                 "ok": False, "error": "no streams"}]
    return rows


# ---------------------------------------------------------------------------
# Ray stage + surfaces
# ---------------------------------------------------------------------------


class ProbeTS:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        blobs = batch.column("media").to_pylist()
        cols = {k: [] for k in ("media_id", "pid", "stream_type",
                                "codec", "n_pes", "payload_bytes",
                                "duration_ms", "cc_errors",
                                "pes_errors", "ok", "error")}
        for mid, raw in zip(ids, blobs):
            for row in probe_ts(raw):
                cols["media_id"].append(mid)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.table({
            "media_id": pa.array(cols["media_id"], pa.int64()),
            "pid": pa.array(cols["pid"], pa.int64()),
            "stream_type": pa.array(cols["stream_type"], pa.int64()),
            "codec": pa.array(cols["codec"], pa.string()),
            "n_pes": pa.array(cols["n_pes"], pa.int64()),
            "payload_bytes": pa.array(cols["payload_bytes"], pa.int64()),
            "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
            "cc_errors": pa.array(cols["cc_errors"], pa.int64()),
            "pes_errors": pa.array(cols["pes_errors"], pa.int64()),
            "ok": pa.array(cols["ok"], pa.bool_()),
            "error": pa.array(cols["error"], pa.string()),
        })


def synth_ts_probe_corpus(sf_dir: str, n: int | None = None):
    """Deterministic HLS-segment corpus; every probed field
    closed-form from doc_id:

      stream_type: doc_id % 3 -> 0: 0x1B (h264), 1: 0x06
                   (private_pes), 2: 0x02 (mpeg2video); pid 0x100
      n_pes:       3 + doc_id % 6; PTS = k * 3600 (40 ms at 90 kHz)
      unit k:      180 + (19*doc_id + 11*k) % 150 bytes (spans
                   multiple 188-byte cells)
      PES form:    bounded when doc_id % 2 else unbounded (length 0)
      extras:      PCR on the first unit; a null packet after every
                   2nd PES when doc_id % 4 == 0"""
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
        return cached_ds("ts_probe_corpus", sf_dir, build,
                         render_fn=_render_probe_fixture)
    return build()


def _render_probe_fixture(batch: pa.Table) -> pa.Table:
    stypes = [0x1B, 0x06, 0x02]
    out_id, out_raw = [], []
    for i in batch.column("doc_id").to_pylist():
        nf = 3 + i % 6
        units = [(k * 3600,
                  bytes([(i + k) & 0xFF]) * (180 + (19 * i + 11 * k) % 150))
                 for k in range(nf)]
        stream = {"stream_type": stypes[i % 3], "pid": 0x100,
                  "units": units}
        out_id.append(i)
        out_raw.append(build_ts(
            [stream], bounded_pes=i % 2 == 0, with_pcr=True,
            null_every=2 if i % 4 == 0 else 0))
    return pa.table({"media_id": pa.array(out_id, pa.int64()),
                     "media": pa.array(out_raw, pa.binary())})


def videos_ts_probe(sf_dir: str):
    """Query surface, ORACLED: probe the transport-stream corpus;
    every field closed-form from doc_id — a hash match certifies the
    packet-grid walk, PAT/PMT CRC parse, both PES length forms,
    adaptation-field/PCR handling and PTS reassembly."""
    probe = ProbeTS()
    ds = synth_ts_probe_corpus(sf_dir).map_batches(
        lambda b: probe(b), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=64)
    return ds.select_columns(["media_id", "pid", "stream_type", "codec",
                              "n_pes", "payload_bytes", "duration_ms",
                              "cc_errors", "pes_errors"])
