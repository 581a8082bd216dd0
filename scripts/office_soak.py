"""Scale soak for the office-family readers and the TIFF codec, full
per-file closed-form verification in the consumer tasks (no sampling):
DOCX / ODT / RTF paragraph extraction and TIFF strip decode.

Usage: PYTHONPATH=/root/repo python scripts/office_soak.py [N]
One JSON line per part; record results in BASELINE.md."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _ids_ds(n: int, cpus: int):
    import ray.data as rd

    return rd.range(n).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow").repartition(cpus * 2)


def _soak(name: str, n: int, cpus: int, render, check) -> dict:
    t0 = time.monotonic()
    ds = _ids_ds(n, cpus).map_batches(render, batch_format="pyarrow",
                                      batch_size=128).materialize()
    t_render = time.monotonic() - t0
    t0 = time.monotonic()
    df = ds.map_batches(check, batch_format="pyarrow",
                        batch_size=128).to_pandas()
    t_run = time.monotonic() - t0
    return {"part": name, "files": n, "render_s": round(t_render, 1),
            "run_s": round(t_run, 1),
            "files_per_s": round(n / t_run),
            "bad": int(df["bad"].sum())}


def soak_docx(n: int, cpus: int) -> dict:
    from webxtract.ops.docx import _render_docx_fixture, probe_docx

    def check(batch: pa.Table) -> pa.Table:
        bad = 0
        for i, b in zip(batch.column("media_id").to_pylist(),
                        batch.column("media").to_pylist()):
            p = probe_docx(b)
            exp = [" ".join(f"d{(23 * i + 11 * q + 5 * k) % 89}"
                            for k in range(3 + (i + q) % 3))
                   for q in range(2 + i % 4)]
            if not p["ok"] or p["paragraphs"] != exp:
                bad += 1
        return pa.table({"bad": pa.array([bad], pa.int64())})

    return _soak("docx", n, cpus, _render_docx_fixture, check)


def soak_office(n: int, cpus: int) -> dict:
    from webxtract.ops.office import (_render_office_fixture,
                                      odt_paragraphs, rtf_text)

    def check(batch: pa.Table) -> pa.Table:
        bad = 0
        for i, o, r in zip(batch.column("media_id").to_pylist(),
                           batch.column("odt").to_pylist(),
                           batch.column("rtf").to_pylist()):
            exp_o = [" ".join(f"o{(29 * i + 13 * q + 3 * k) % 83}"
                              for k in range(2 + (i + q) % 4))
                     for q in range(1 + i % 3)]
            exp_r = [" ".join(f"r{(37 * i + 17 * q + 7 * k) % 79}"
                              for k in range(2 + (i + q) % 3))
                     for q in range(2 + i % 3)]
            try:
                if odt_paragraphs(o) != exp_o or rtf_text(r) != exp_r:
                    bad += 1
            except Exception:  # noqa: BLE001
                bad += 1
        return pa.table({"bad": pa.array([bad], pa.int64())})

    return _soak("odt+rtf", n, cpus, _render_office_fixture, check)


def soak_tiff(n: int, cpus: int) -> dict:
    from webxtract.ops.tiffcodec import _render_tiff_fixture, decode_tiff

    def check(batch: pa.Table) -> pa.Table:
        bad = 0
        for i, b in zip(batch.column("media_id").to_pylist(),
                        batch.column("media").to_pylist()):
            h, w = 16 + i % 3, 24 + i % 5
            exp = ((np.arange(h * w, dtype=np.int64) + 7 * i) % 256) \
                .astype(np.uint8).reshape(h, w)
            dec = decode_tiff(b)
            if dec is None or dec.shape != (h, w) or not (dec == exp).all():
                bad += 1
        return pa.table({"bad": pa.array([bad], pa.int64())})

    return _soak("tiff", n, cpus, _render_tiff_fixture, check)


def main() -> None:
    import ray
    import ray.data as rd

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    for rec in (soak_docx(n, cpus), soak_office(n, cpus),
                soak_tiff(n, cpus)):
        print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
