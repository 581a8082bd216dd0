"""Web-suite soak: the five DOM operators at 40x query-fixture scale.

200,000 synthetic pages over 5,000 hosts — each page carries outlinks
(with noise anchors), a table, a head section and a JSON-LD block —
rendered once, materialized, then driven through the REAL operators:

    extract_links        -> distinct edge set == numpy closed form
    anchor_text_profile  -> total anchor count == closed form
    extract_html_tables  -> cell count == closed form, sample exact
    extract_html_meta    -> sample rows exact
    extract_jsonld       -> row count == closed form

Run: python scripts/web_soak.py [--docs 200000] [--cpus 32]
Prints per-op wall times; exits nonzero on any mismatch.
"""

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HOSTS = 5000


def render(batch: pa.Table) -> pa.Table:
    out_u, out_h = [], []
    for i in batch.column("doc_id").to_pylist():
        h = i % HOSTS
        anchors = ['<nav><a href="/home">Home</a></nav>']
        for j in range(1 + i % 3):
            t = (i * 7 + 13 * j + 1) % HOSTS
            anchors.append(
                f'<a href="https://site{t}.example/p/{j}">ref{j}</a>')
        if i % 5 == 0:
            anchors.append(f'<a href="//site{(i * 3 + 2) % HOSTS}'
                           '.example/pr">proto-rel</a>')
        anchors.append('<a href="mailto:x@y.example">mail</a>')
        R = 2 + i % 3
        table = ("<table><tr><th>K</th><th>V</th></tr>" + "".join(
            f"<tr><td>k{r}</td><td>v{r}_{i}</td></tr>"
            for r in range(R)) + "</table>")
        head = (f"<head><title>Doc {i}</title>"
                f'<link rel="canonical" href="https://site{h}'
                f'.example/p/{i}">'
                '<script type="application/ld+json">'
                f'{{"@type": "Article", "name": "Item {i}"}}'
                "</script></head>")
        out_u.append(f"https://site{h}.example/p/{i}")
        out_h.append(f"<html>{head}<body>{''.join(anchors)}{table}"
                     "</body></html>".encode())
    return pa.table({"doc_id": batch.column("doc_id"),
                     "url": pa.array(out_u, pa.string()),
                     "html": pa.array(out_h, pa.binary())})


def expected_edges(n: int) -> np.ndarray:
    """Distinct (src, dst) pairs, packed src * HOSTS + dst."""
    i = np.arange(n, dtype=np.int64)
    h = i % HOSTS
    pairs = []
    for j in range(3):
        m = (i % 3) >= j
        t = (i[m] * 7 + 13 * j + 1) % HOSTS
        pairs.append(np.stack([h[m], t]))
    m = (i % 5) == 0
    pairs.append(np.stack([h[m], (i[m] * 3 + 2) % HOSTS]))
    p = np.concatenate(pairs, axis=1)
    p = p[:, p[0] != p[1]]
    return np.unique(p[0] * HOSTS + p[1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.web import (anchor_text_profile,
                                   extract_html_meta,
                                   extract_html_tables,
                                   extract_jsonld, extract_links)

    N = args.docs
    t0 = time.monotonic()
    ids = rd.range(N).map_batches(
        lambda t: pa.table({"doc_id": t.column("id")}),
        batch_format="pyarrow", zero_copy_batch=True) \
        .repartition(args.cpus * 4)
    pages = ids.map_batches(render, batch_format="pyarrow",
                            batch_size=512).materialize()
    print(f"render+materialize {N} pages: "
          f"{time.monotonic() - t0:.1f}s", flush=True)
    fails = 0

    t0 = time.monotonic()
    e = extract_links(pages).to_pandas()
    got = np.unique(
        np.array([int(s[4:s.index(".")]) for s in e.src_host],
                 np.int64) * HOSTS
        + np.array([int(s[4:s.index(".")]) for s in e.dst_host],
                   np.int64))
    want = expected_edges(N)
    ok = got.shape == want.shape and (got == want).all()
    print(f"extract_links: {len(e)} edges in "
          f"{time.monotonic() - t0:.1f}s exact={ok}", flush=True)
    fails += not ok

    t0 = time.monotonic()
    a = anchor_text_profile(pages).to_pandas()
    i = np.arange(N, dtype=np.int64)
    h = i % HOSTS
    total = 0
    for j in range(3):
        m = (i % 3) >= j
        total += int((((i[m] * 7 + 13 * j + 1) % HOSTS) != h[m]).sum())
    m = (i % 5) == 0
    total += int((((i[m] * 3 + 2) % HOSTS) != h[m]).sum())
    ok = int(a.n.sum()) == total
    print(f"anchor_text_profile: {len(a)} rows, {int(a.n.sum())} "
          f"anchors in {time.monotonic() - t0:.1f}s exact={ok}",
          flush=True)
    fails += not ok

    t0 = time.monotonic()
    c = extract_html_tables(pages)
    n_cells = c.count()
    want_cells = int((2 + (2 + i % 3) * 2).sum())
    ok = n_cells == want_cells
    s = c.filter(lambda r: r["doc_id"] == 7).to_pandas() \
        .sort_values(["row", "col"])
    want_texts = ["K", "V"] + [t for r in range(2 + 7 % 3)
                               for t in (f"k{r}", f"v{r}_7")]
    ok2 = list(s.text) == want_texts
    print(f"html_tables: {n_cells} cells in "
          f"{time.monotonic() - t0:.1f}s exact={ok and ok2}",
          flush=True)
    fails += not (ok and ok2)

    t0 = time.monotonic()
    mrows = extract_html_meta(pages)
    sample = mrows.filter(lambda r: r["doc_id"] % 9973 == 0) \
        .to_pandas().sort_values("doc_id")
    ok = all(r.title == f"Doc {r.doc_id}"
             and r.canonical ==
             f"https://site{r.doc_id % HOSTS}.example/p/{r.doc_id}"
             for r in sample.itertuples()) and len(sample) == (
        (N - 1) // 9973 + 1)
    print(f"html_meta: sampled {len(sample)} rows in "
          f"{time.monotonic() - t0:.1f}s exact={ok}", flush=True)
    fails += not ok

    t0 = time.monotonic()
    jl = extract_jsonld(pages)
    ok = jl.count() == N
    print(f"jsonld: {N} items in {time.monotonic() - t0:.1f}s "
          f"exact={ok}", flush=True)
    fails += not ok

    print("RESULT:", "PASS" if fails == 0 else f"FAIL({fails})")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
