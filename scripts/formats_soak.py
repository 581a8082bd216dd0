"""Scale soak for the second wave of round-5 format readers: XLSX,
PPTX, EPUB, email/MIME, CSV, tar and iCalendar — 300k files each,
full per-file closed-form verification in the consumer tasks.

Usage: PYTHONPATH=/root/repo python scripts/formats_soak.py [N]
"""

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


def _soak(name, n, cpus, render, check) -> dict:
    t0 = time.monotonic()
    ds = _ids_ds(n, cpus).map_batches(render, batch_format="pyarrow",
                                      batch_size=128).materialize()
    t_render = time.monotonic() - t0
    t0 = time.monotonic()
    df = ds.map_batches(check, batch_format="pyarrow",
                        batch_size=128).to_pandas()
    t_run = time.monotonic() - t0
    return {"part": name, "files": n, "render_s": round(t_render, 1),
            "run_s": round(t_run, 1), "files_per_s": round(n / t_run),
            "bad": int(df["bad"].sum())}


def _counter(fn):
    def check(batch: pa.Table) -> pa.Table:
        bad = 0
        for i, b in zip(batch.column("media_id").to_pylist(),
                        batch.column("media").to_pylist()):
            try:
                if not fn(i, b):
                    bad += 1
            except Exception:  # noqa: BLE001
                bad += 1
        return pa.table({"bad": pa.array([bad], pa.int64())})

    return check


def main() -> None:
    import ray
    import ray.data as rd

    from webxtract.ops.csvtext import (_CANDIDATES, _cell,
                                       _render_csv_fixture, parse_csv,
                                       sniff_delimiter)
    from webxtract.ops.epub import _render_epub_fixture, epub_chapters
    from webxtract.ops.ical import _render_ics_fixture, parse_ics
    from webxtract.ops.mime import (_render_email_fixture, email_text,
                                    parse_email)
    from webxtract.ops.pptx import _render_pptx_fixture, pptx_slides
    from webxtract.ops.tarwalk import _render_tar_fixture, parse_tar
    from webxtract.ops.xlsx import _render_xlsx_fixture, xlsx_cells

    def ok_xlsx(i, b):
        got = xlsx_cells(b)
        exp = []
        for r in range(2 + i % 3):
            for c in range(2 + (i + r) % 3):
                sel = (i + r + c) % 3
                if sel == 0:
                    exp.append((r, c, "s",
                                f"s{(19 * i + 7 * r + 3 * c) % 23}"))
                elif sel == 1:
                    exp.append((r, c, "n",
                                str((13 * i + 5 * r + c) % 1000)))
                else:
                    exp.append((r, c, "inline",
                                f"x{(17 * i + 3 * r + c) % 61}"))
        return got == exp

    def ok_pptx(i, b):
        return pptx_slides(b) == [
            [" ".join(f"p{(41 * i + 19 * s + 7 * p + 3 * k) % 73}"
                      for k in range(2 + (i + s + p) % 2))
             for p in range(2 + (i + s) % 3)]
            for s in range(1 + i % 3)]

    def ok_epub(i, b):
        return epub_chapters(b) == [
            [" ".join(f"e{(43 * i + 23 * s + 11 * p + 5 * k) % 67}"
                      for k in range(2 + (i + s + p) % 2))
             for p in range(2 + (i + s) % 3)]
            for s in range(1 + i % 4)]

    def ok_email(i, b):
        msg = parse_email(b)
        subj = (f"Subject {i % 100} report" if i % 3 == 0
                else f"S\xfcbject {i % 100} report")
        return (msg["subject"] == subj
                and len(msg["parts"]) == 1 + i % 2
                and email_text(b) == (
                    f"caf\xe9 report {(7 * i) % 1000}\n"
                    f"line id={(11 * i) % 500} end"))

    def ok_csv(i, b):
        text = b.decode("utf-8")
        d = sniff_delimiter(text)
        if d != _CANDIDATES[i % 4]:
            return False
        return parse_csv(text, d) == [
            [_cell(i, r, c, d) for c in range(2 + i % 3)]
            for r in range(2 + (i + 1) % 3)]

    def ok_tar(i, b):
        ms = parse_tar(b)
        if len(ms) != 2 + i % 3:
            return False
        for k, m in enumerate(ms):
            exp_text = f"tar {(17 * i + 7 * k) % 991} content"
            if m["payload"].decode() != exp_text:
                return False
        return True

    def ok_ics(i, b):
        evs = parse_ics(b)
        if len(evs) != 1 + i % 3:
            return False
        for e, ev in enumerate(evs):
            n = (53 * i + 29 * e) % 983
            if ev["summary"] != (f"Event {n} "
                                 + "agenda item review " * 4
                                 + "wrap; up, done"):
                return False
        return True

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    parts = [
        ("xlsx", _render_xlsx_fixture, ok_xlsx),
        ("pptx", _render_pptx_fixture, ok_pptx),
        ("epub", _render_epub_fixture, ok_epub),
        ("email", _render_email_fixture, ok_email),
        ("csv", _render_csv_fixture, ok_csv),
        ("tar", _render_tar_fixture, ok_tar),
        ("ics", _render_ics_fixture, ok_ics),
    ]
    for name, render, fn in parts:
        print(json.dumps(_soak(name, n, cpus, render, _counter(fn))),
              flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
