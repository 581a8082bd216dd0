"""Long-job scaling measurement: the headline extraction pipeline over
a 4x-longer input (2.4M pages) at 8 vs 32 CPUs, fresh process per
level with one untimed warm pass (the bench.py --scaling protocol).

Motivation (BASELINE.md round-5 note): at the bench's 600k-page job
length the 32-cpu wall is ~6.9 s, of which a roughly fixed ~1 s is
pipeline fill/drain — so the measured 8->32 ratio swings 0.74-0.88
with the ambient speed of the 8-cpu leg. Quadrupling the job length
amortizes the fixed part and shows the steady-state step efficiency.

Usage: PYTHONPATH=/root/repo python scripts/scaling_long.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, shutil, sys, time
import ray
import ray.data as rd

cpus, rows = int(sys.argv[1]), int(sys.argv[2])
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
rd.DataContext.get_current().enable_progress_bars = False
from webxtract import pipeline
from webxtract.testdata import pages_path

src = pages_path(rows)
rd.read_parquet(src).count()  # page-cache warm

def run(tag):
    out = f"/tmp/webxtract_scalelong_{cpus}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    ds = rd.read_parquet(src)
    pipeline.extract_pipeline(ds, source_path=src).write_parquet(out)
    return time.monotonic() - t0

cold = run("cold")   # includes one-time worker spin-up
warm = run("warm")   # steady state
print(json.dumps({"cpus": cpus, "rows": rows,
                  "cold_sec": round(cold, 2), "sec": round(warm, 2),
                  "docs_per_sec": round(rows / warm, 1)}))
ray.shutdown()
"""


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    # materialize the corpus once, outside the timed children
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from webxtract.testdata import pages_path

    pages_path(rows)
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(cpus), str(rows)],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line, flush=True)
    eff = results[32]["docs_per_sec"] / results[8]["docs_per_sec"] / 4
    print(json.dumps({"rows": rows,
                      "scaling_efficiency_8_to_32": round(eff, 3)}))


if __name__ == "__main__":
    main()
