"""AllPairs cosine-simjoin soak: the prefix-filtered exact similarity
join at 500k docs with CLOSED-FORM planted truth — the scale-path
validation for ops.dedup.cosine_simjoin_pairs, companion to
span_soak.py / lsh_soak.py / fuzzy_soak.py.

Corpus (fully deterministic, no RNG): doc i carries 20 background
tokens b{(i + j*997) % 10000} (distinct within a doc since
gcd(997, 10000) = 1; df ~ N/500 — heavy) plus 10 unique tokens
u{i}_{j} (df = 1). Every doc with i % 100 == 0 gets a twin at i+1:
the same token list with the last unique token replaced, so the twin
pair shares na-1 of na tokens (cosine (na-1)/na ~ 0.967 >= 0.95)
while any non-twin pair shares at most the 20 background tokens
(cosine <= 20/30 = 0.667 — far below threshold). Ground truth is
therefore EXACTLY the N/100 planted pairs.

Why this shape stresses the right thing: at t = 19/20 each 30-token
doc's prefix is its 3 LOWEST-df tokens — the uniques — so the
df-ascending global order must steer candidate generation entirely
into df<=2 buckets and keep the heavy background tokens (df ~ 1000+)
out of every prefix. A naive shared-token join would generate ~N^2/500
candidates here; the prefix filter must generate ~N/100.

Phases in fresh Ray sessions: synth -> join (full cosine_simjoin_pairs
over the corpus, gates: rows == N/100, every pair is (i, i+1) with
i % 100 == 0, overlap == na-1) .

Run:  python scripts/simjoin_soak.py [--n 500000] [--cpus 32]
Prints one JSON line; recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PHASES = ("synth", "join")


def _tokens(i: int) -> list[str]:
    toks = [f"b{(i + j * 997) % 10000}" for j in range(20)]
    toks += [f"u{i}_{j}" for j in range(10)]
    return toks


def _doc_text(i: int) -> str:
    if i % 100 == 1:                      # twin of i-1
        toks = _tokens(i - 1)
        toks[-1] = f"v{i}"
        return " ".join(toks)
    return " ".join(_tokens(i))


def run_phase(phase: str, args) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    res: dict = {}
    doc_path = os.path.join(args.dir, "documents.parquet")
    out_path = os.path.join(args.dir, "pairs.parquet")

    if phase == "synth":
        marker = os.path.join(args.dir, f"_DONE_{args.n}")
        if not os.path.exists(marker):
            shutil.rmtree(args.dir, ignore_errors=True)
            os.makedirs(args.dir, exist_ok=True)
            t0 = time.monotonic()

            def render(batch: dict) -> pa.Table:
                ids = batch["id"]
                return pa.table({
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array([_doc_text(int(i)) for i in ids],
                                     pa.string())})

            (rd.range(args.n).repartition(args.cpus * 2)
             .map_batches(render, batch_format="numpy")
             .write_parquet(doc_path))
            with open(marker, "w") as f:
                f.write("ok")
            res["synth_s"] = round(time.monotonic() - t0, 1)

    elif phase == "join":
        from webxtract.ops.dedup import cosine_simjoin_pairs

        t0 = time.monotonic()
        ds = rd.read_parquet(doc_path, columns=["doc_id", "text"])
        out = cosine_simjoin_pairs(ds, tp=19, tq=20)
        shutil.rmtree(out_path, ignore_errors=True)
        out.write_parquet(out_path)
        res["join_s"] = round(time.monotonic() - t0, 1)
        t = pq.read_table(out_path)
        res["pairs"] = t.num_rows
        expect = args.n // 100 if args.n % 100 == 0 \
            else args.n // 100 + (1 if args.n % 100 > 1 else 0)
        res["expected"] = expect
        da = t.column("doc_a").to_numpy()
        db = t.column("doc_b").to_numpy()
        ov = t.column("overlap").to_numpy()
        na = t.column("na").to_numpy()
        planted = bool(((da % 100 == 0) & (db == da + 1)).all())
        res["all_planted_shape"] = planted
        res["overlap_ok"] = bool((ov == na - 1).all())
        res["docs_per_s"] = round(args.n / max(res["join_s"], 1e-9))
        res["gates_pass"] = bool(t.num_rows == expect and planted
                                 and res["overlap_ok"])

    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dir", default="/tmp/simjoin_soak")
    ap.add_argument("--phase", default="all", choices=("all",) + PHASES)
    args = ap.parse_args()

    if args.phase != "all":
        print(json.dumps(run_phase(args.phase, args)))
        return

    res: dict = {"n": args.n, "cpus": args.cpus}
    for phase in PHASES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", phase, "--n", str(args.n),
             "--cpus", str(args.cpus), "--dir", args.dir],
            capture_output=True, text=True)
        if out.returncode != 0:
            res[phase] = {"error": out.stderr[-2000:]}
            print(json.dumps(res))
            sys.exit(1)
        res[phase] = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
