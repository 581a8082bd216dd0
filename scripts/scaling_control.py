"""Hardware-ceiling control for the 8->32 single-box scaling figure
(VERDICT r4 ask #6): run the headline EXTRACTION compute — the exact
per-document parse+normalize path (quality gate, charset decode, DOM
walk, boilerplate scoring, normalizers) — under bare multiprocessing
with NO Ray, no object store, no exchanges, at 1 / 8 / 32 workers on
identical fixed work slices.

If aggregate throughput under pure processes shows the same efficiency
rolloff at 32 workers as the Ray pipeline does, the ceiling is the
box (DRAM bandwidth / SMT sharing / turbo-clock droop), not engine
coordination: there is nothing between the workers here but the
kernel. Complements the round-2 bare-ray-task control.

Usage: python scripts/scaling_control.py [docs_per_worker]
Writes one JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _slice_worker(args) -> int:
    """Parse+normalize a fixed slice of the pages corpus; returns docs
    processed. Imports inside the worker so each process pays its own
    parser-state build, like a Ray worker's first batch."""
    path, lo, hi = args
    import pyarrow.parquet as pq

    from webxtract.pipeline import Extractor

    tbl = pq.read_table(path).slice(lo, hi - lo)
    ex = Extractor()
    done = 0
    step = 1024
    for s in range(0, tbl.num_rows, step):
        ex(tbl.slice(s, min(step, tbl.num_rows - s)))
        done += min(step, tbl.num_rows - s)
    return done


def run(docs_per_worker: int) -> dict:
    from webxtract.testdata import pages_path, rows_for_sf_dir

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = rows_for_sf_dir(sf_dir)
    src = pages_path(n)
    # warm the page cache so the timed window is compute, not disk
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(src, f) for f in os.listdir(src)
        if f.endswith(".parquet")) if os.path.isdir(src) else [src]
    rows = []
    for f in files:
        nrows = pq.read_metadata(f).num_rows
        rows.append((f, nrows))
        pq.read_table(f)

    def make_tasks(k: int):
        """k tasks of EXACTLY docs_per_worker docs each, round-robin
        over files (wrapping within a file when needed) — fixed work
        per worker so aggregate throughput comparisons are exact."""
        tasks = []
        fi, off = 0, 0
        for _ in range(k):
            f, nrows = rows[fi % len(rows)]
            lo = off % max(nrows - docs_per_worker, 1)
            tasks.append((f, lo, lo + docs_per_worker))
            fi += 1
            off += docs_per_worker
        return tasks

    out = {"docs_per_worker": docs_per_worker, "levels": {}}
    base_rate = None
    for k in (1, 8, 32):
        tasks = make_tasks(k)
        t0 = time.monotonic()
        if k == 1:
            done = sum(map(_slice_worker, tasks))
        else:
            with mp.get_context("spawn").Pool(k) as pool:
                done = sum(pool.map(_slice_worker, tasks))
        sec = time.monotonic() - t0
        rate = done / sec
        out["levels"][str(k)] = {
            "sec": round(sec, 2), "docs": done,
            "docs_per_sec": round(rate, 1),
        }
        if k == 1:
            base_rate = rate
        out["levels"][str(k)]["efficiency_vs_1"] = round(
            rate / (k * base_rate), 3)
    l8, l32 = out["levels"]["8"], out["levels"]["32"]
    out["eff_8_to_32"] = round(
        l32["docs_per_sec"] / (4 * l8["docs_per_sec"]), 3)
    return out


if __name__ == "__main__":
    dpw = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000
    print(json.dumps(run(dpw)))
