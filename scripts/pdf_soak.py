"""Scale soak for the round-5 format additions: real-PDF parse/extract
and the EXIF IFD walk, the established soak posture (full verification
per file via the closed forms — no sampling):

  1. PDF: N files (every layout variant of the fixture matrix) through
     ProbePDF + ExtractPDFText under map_batches; EVERY probe field and
     EVERY extracted byte checked against the closed form in the
     consumer tasks.
  2. EXIF: M mixed-carrier files through ProbeEXIF; every field checked
     closed-form.

Usage: PYTHONPATH=/root/repo python scripts/pdf_soak.py [N] [M]
Writes one JSON line per part; record results in BASELINE.md."""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _ids_ds(n: int, cpus: int):
    import ray.data as rd

    return rd.range(n).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow").repartition(cpus * 2)


def soak_pdf(n: int, cpus: int) -> dict:
    import ray.data as rd  # noqa: F401
    from webxtract.ops.pdf import (ExtractPDFText, ProbePDF,
                                   _render_pdf_fixture)

    t0 = time.monotonic()
    ds = _ids_ds(n, cpus).map_batches(_render_pdf_fixture,
                                      batch_format="pyarrow",
                                      batch_size=64).materialize()
    t_render = time.monotonic() - t0

    def check_probe(batch: pa.Table) -> pa.Table:
        probe = ProbePDF()
        out = probe(batch)
        bad = 0
        for r in out.to_pylist():
            i = r["media_id"]
            np_ = 1 + i % 3
            sh = ch = 0
            for p in range(np_):
                nl = 3 + (i + p) % 4
                for l in range(nl):  # noqa: E741
                    sel = (i + p + l) % 3
                    nw = 2 + sel
                    sh += 1 if sel == 1 else nw
                    ch += sum(
                        len(f"w{(31 * i + 17 * p + 7 * l + w) % 97}")
                        for w in range(nw))
                sh += 2
                ch += 3 + len(f"v{(13 * i + p) % 100}")
            exp = dict(
                ok=True, n_pages=np_,
                xref_kind=("table", "xrefstream", "objstm")[i % 3],
                content_filter=("ahx+flate" if i % 10 == 0 else
                                "ahx" if i % 5 == 0 else
                                "flate" if i % 2 == 0 else "plain"),
                n_objects=3 + 2 * np_ + (1 if i % 9 == 0 else 0)
                + (0, 1, 2)[i % 3]
                + ((1 + (1 if i % 3 != 0 else 0)) if i % 11 == 0 else 0),
                n_xref_sections=1 + (1 if i % 11 == 0 else 0),
                n_shows=sh, n_chars=ch)
            if any(r[k] != v for k, v in exp.items()):
                bad += 1
        return pa.table({"n": pa.array([out.num_rows], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    def check_text(batch: pa.Table) -> pa.Table:
        ex = ExtractPDFText()
        out = ex(batch)
        got: dict[tuple, str] = {}
        for r in out.to_pylist():
            got[(r["media_id"], r["page"])] = r["text"]
        bad = 0
        n_pages = 0
        for i in batch.column("media_id").to_pylist():
            for p in range(1 + i % 3):
                n_pages += 1
                nl = 3 + (i + p) % 4
                exp_lines = [
                    " ".join(f"w{(31 * i + 17 * p + 7 * l + w) % 97}"
                             for w in range(2 + (i + p + l) % 3))
                    for l in range(nl)]
                exp_lines.append(f"k{(i + p) % 10}: v{(13 * i + p) % 100}")
                if got.get((i, p)) != "\n".join(exp_lines):
                    bad += 1
        return pa.table({"n": pa.array([n_pages], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    t0 = time.monotonic()
    pr = ds.map_batches(check_probe, batch_format="pyarrow",
                        batch_size=64).to_pandas()
    t_probe = time.monotonic() - t0
    t0 = time.monotonic()
    tx = ds.map_batches(check_text, batch_format="pyarrow",
                        batch_size=64).to_pandas()
    t_text = time.monotonic() - t0
    return {"part": "pdf", "files": n,
            "render_s": round(t_render, 1),
            "probe_s": round(t_probe, 1),
            "probe_files_per_s": round(n / t_probe),
            "probe_bad": int(pr["bad"].sum()),
            "extract_s": round(t_text, 1),
            "extract_pages": int(tx["n"].sum()),
            "extract_pages_per_s": round(int(tx["n"].sum()) / t_text),
            "extract_bad": int(tx["bad"].sum())}


def soak_exif(n: int, cpus: int) -> dict:
    from webxtract.ops.exif import ProbeEXIF, _render_exif_fixture

    t0 = time.monotonic()
    ds = _ids_ds(n, cpus).map_batches(_render_exif_fixture,
                                      batch_format="pyarrow",
                                      batch_size=64).materialize()
    t_render = time.monotonic() - t0

    def check(batch: pa.Table) -> pa.Table:
        probe = ProbeEXIF()
        out = probe(batch)
        bad = 0
        for r in out.to_pylist():
            i = r["media_id"]
            gps = i % 4 != 2
            exp = dict(
                ok=True,
                kind="tiff" if i % 2 == 0 else "jpeg",
                endian="MM" if i % 3 == 0 else "II",
                width=640 + i % 17, height=480 + i % 11,
                make=f"Make{i % 7}", model=f"Model{i % 13}",
                orientation=1 + i % 8,
                datetime=f"2020:01:{1 + i % 28:02d} {i % 24:02d}:00:00",
                dt_original=(f"2021:06:{1 + i % 30:02d} 12:00:00"
                             if i % 4 != 1 else ""),
                lat_arcsec=((1 if i % 2 == 0 else -1)
                            * ((i % 90) * 3600 + ((7 * i) % 60) * 60
                               + i % 60)) if gps else None,
                lon_arcsec=((-1 if i % 3 == 0 else 1)
                            * ((i % 180) * 3600 + ((11 * i) % 60) * 60
                               + (13 * i) % 60)) if gps else None,
                n_ifds=1 + (1 if i % 5 == 0 else 0),
                n_tags=6 + (1 if i % 4 != 1 else 0) + (1 if gps else 0))
            if any(r[k] != v for k, v in exp.items()):
                bad += 1
        return pa.table({"n": pa.array([out.num_rows], pa.int64()),
                         "bad": pa.array([bad], pa.int64())})

    t0 = time.monotonic()
    df = ds.map_batches(check, batch_format="pyarrow",
                        batch_size=64).to_pandas()
    t_probe = time.monotonic() - t0
    return {"part": "exif", "files": n,
            "render_s": round(t_render, 1),
            "probe_s": round(t_probe, 1),
            "probe_files_per_s": round(n / t_probe),
            "probe_bad": int(df["bad"].sum())}


def main() -> None:
    import ray
    import ray.data as rd

    n_pdf = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_exif = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    for rec in (soak_pdf(n_pdf, cpus), soak_exif(n_exif, cpus)):
        print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
