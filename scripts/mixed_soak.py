"""Capstone soak: the FLAGSHIP pipeline over a mixed-format crawl —
HTML, real PDF, DOCX, ODT and RTF payloads interleaved in one pages
table, extracted in one `extract_pipeline` run, with the office/pdf
rows' extracted fields verified closed-form in the consumer tasks.

This is the integration the round added: one corpus, five payload
kinds, one streaming pipeline, no routing code in user space.

Usage: PYTHONPATH=/root/repo python scripts/mixed_soak.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _vendor(i: int) -> list[str]:
    return [f"Vendor{i % 50}", "Corp"]


def _render(batch: pa.Table) -> pa.Table:
    from webxtract.ops.docx import build_docx
    from webxtract.ops.office import build_odt, build_rtf
    from webxtract.ops.pdf import build_pdf

    ids = batch.column("doc_id").to_pylist()
    urls, payloads = [], []
    for i in ids:
        fam = i % 5
        v = _vendor(i)
        body = [v, ["Invoice", f"number{i % 997}"],
                ["Total:", f"${(i % 9000) / 100 + 1:.2f}"]]
        if fam == 0:
            html = ("<html><body><h1>" + " ".join(v) + "</h1><p>"
                    + " ".join(body[1]) + "</p><p>Total: "
                    + body[2][1] + "</p>"
                    + "<p>filler words here to pass the quality gate "
                    "with enough prose text for the ratio</p>" * 3
                    + "</body></html>").encode()
        elif fam == 1:
            html = build_pdf([{"lines": [
                {"x": 72.0, "y": 720.0, "size": 12, "words": v,
                 "op": "tj"},
                {"x": 72.0, "y": 704.0, "size": 12, "words": body[1],
                 "op": "tjarr"}],
                "kv": ("Total:", body[2][1], 72.0, 680.0, 12)}])
        elif fam == 2:
            html = build_docx(body)
        elif fam == 3:
            html = build_odt(body)
        else:
            html = build_rtf(body)
        urls.append(f"https://mixed.example/{i}")
        payloads.append(html)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([1_600_000_000_000_000 + i for i in ids],
                            pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.array([""] * len(ids), pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
    })


def _check(batch: pa.Table) -> pa.Table:
    ids = [int(u.rsplit("/", 1)[1])
           for u in batch.column("url").to_pylist()]
    vendors = batch.column("vendor_value").to_pylist()
    routes = batch.column("route").to_pylist()
    bad = 0
    n_office = 0
    for i, v, r in zip(ids, vendors, routes):
        if i % 5 == 0:
            if r == "rejected":
                bad += 1
            continue
        n_office += 1
        if v != " ".join(_vendor(i)) or r == "rejected":
            bad += 1
    return pa.table({"n": pa.array([len(ids)], pa.int64()),
                     "n_office": pa.array([n_office], pa.int64()),
                     "bad": pa.array([bad], pa.int64())})


def main() -> None:
    import ray
    import ray.data as rd

    from webxtract import pipeline

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    t0 = time.monotonic()
    src = rd.range(n).map_batches(
        lambda b: pa.table({"doc_id": b.column("id")}),
        batch_format="pyarrow").repartition(cpus * 2) \
        .map_batches(_render, batch_format="pyarrow",
                     batch_size=256).materialize()
    t_render = time.monotonic() - t0
    t0 = time.monotonic()
    res = pipeline.extract_pipeline(src)
    df = res.map_batches(_check, batch_format="pyarrow",
                         batch_size=1024).to_pandas()
    t_run = time.monotonic() - t0
    print(json.dumps({
        "part": "mixed_flagship", "docs": n,
        "render_s": round(t_render, 1),
        "extract_s": round(t_run, 1),
        "docs_per_s": round(n / t_run),
        "rows_out": int(df["n"].sum()),
        "office_pdf_rows_verified": int(df["n_office"].sum()),
        "bad": int(df["bad"].sum())}))
    ray.shutdown()


if __name__ == "__main__":
    main()
