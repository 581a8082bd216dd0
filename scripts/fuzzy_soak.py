"""Fuzzy-linkage soak: the SymSpell deletion-neighborhood join at 1M
strings, with a brute-force subsample argmin as ground truth — the
scale-path validation for ops.fuzzy.parts_fuzzy_match, companion to
scripts/span_soak.py / lsh_soak.py.

Corpus: a part table of N rows written to <dir>/part.parquet — keys
1..N, names cycled deterministically from the 64 distinct p_name
values of the shipped test data, so canonical strings are
``<name> #<key>`` (unique) and the operator's own closed-form dirty
synthesis applies unchanged. At 1M keys the digit blocks collide
heavily (every key shares a deletion variant with ~10 same-prefix
neighbours), so the candidate stream is ~20x input — the realistic
stress for the verify stage.

Phases run in fresh Ray sessions (the lsh_soak disk-spill lesson):
  1. synth  -> <dir>/part.parquet
  2. match  -> full-scale parts_fuzzy_match: every dirty name matched
               (rows == N), all dist <= 1, self-match rate >= 0.9
  3. truth  -> brute-force argmin (lev01_batch against ALL canon,
               length-prefiltered, chunked) for a deterministic
               subsample of dirty names; must equal the distributed
               result row-for-row.

Run:  python scripts/fuzzy_soak.py [--n 1000000] [--cpus 32]
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

PHASES = ("synth", "match", "truth")
SUBSAMPLE = 200
SUB_STRIDE = 4999  # deterministic subsample: keys 1, 1+4999, ...


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
    part_dir = os.path.join(args.dir, "part.parquet")
    out_path = os.path.join(args.dir, "matched.parquet")

    def base_names() -> list[str]:
        t = pq.read_table("/root/testdata/sf0.1/part.parquet",
                          columns=["p_name"])
        return sorted(set(t.column("p_name").to_pylist()))

    if phase == "synth":
        marker = os.path.join(args.dir, f"_DONE_{args.n}")
        if not os.path.exists(marker):
            shutil.rmtree(args.dir, ignore_errors=True)
            os.makedirs(args.dir, exist_ok=True)
            names = base_names()
            t0 = time.monotonic()

            def render(batch: dict) -> pa.Table:
                ks = batch["id"] + 1
                nm = [names[int(k) % len(names)] for k in ks]
                return pa.table({
                    "p_partkey": pa.array(ks, pa.int64()),
                    "p_name": pa.array(nm, pa.string())})

            (rd.range(args.n).repartition(args.cpus)
             .map_batches(render, batch_format="numpy")
             .write_parquet(part_dir))
            with open(marker, "w") as f:
                f.write("ok")
            res["synth_s"] = round(time.monotonic() - t0, 1)

    elif phase == "match":
        from webxtract.ops.fuzzy import parts_fuzzy_match

        t0 = time.monotonic()
        out = parts_fuzzy_match(args.dir)
        shutil.rmtree(out_path, ignore_errors=True)
        out.write_parquet(out_path)
        res["match_s"] = round(time.monotonic() - t0, 1)
        t = pq.read_table(out_path)
        res["rows"] = t.num_rows
        res["all_matched"] = bool(t.num_rows == args.n)
        dist = t.column("dist").to_numpy()
        res["all_dist_le_1"] = bool((dist <= 1).all())
        self_rate = float(
            (t.column("p_partkey").to_numpy()
             == t.column("matched_partkey").to_numpy()).mean())
        res["self_match_rate"] = round(self_rate, 4)
        # self rate is informational — digit-collision cross-matches
        # are CORRECT (the truth phase checks them); the hard gates
        # are coverage and the distance bound
        res["gates_pass"] = bool(res["all_matched"]
                                 and res["all_dist_le_1"]
                                 and self_rate >= 0.8)

    elif phase == "truth":
        from webxtract.ops.fuzzy import _synth_dirty, lev01_batch

        names = base_names()
        sub_keys = list(range(1, args.n, SUB_STRIDE))[:SUBSAMPLE]
        sub_canon = [f"{names[k % len(names)]} #{k}" for k in sub_keys]
        sub_dirty = _synth_dirty(sub_canon,
                                 np.array(sub_keys, np.int64))
        dl = np.array([len(s) for s in sub_dirty], np.int64)

        best_d = np.full(len(sub_keys), 2, np.int64)
        best_k = np.full(len(sub_keys), 2 ** 62, np.int64)
        t0 = time.monotonic()
        CH = 4000
        for lo in range(0, args.n, CH):
            ks = np.arange(lo + 1, min(lo + CH, args.n) + 1)
            canon = [f"{names[int(k) % len(names)]} #{k}" for k in ks]
            cl = np.array([len(s) for s in canon], np.int64)
            # length prefilter: lev<=1 needs |len diff| <= 1
            for i, (ds_, ldi) in enumerate(zip(sub_dirty, dl)):
                sel = np.abs(cl - ldi) <= 1
                if not sel.any():
                    continue
                idx = np.flatnonzero(sel)
                d = lev01_batch([ds_] * idx.size,
                                [canon[j] for j in idx])
                ok = d <= 1
                if not ok.any():
                    continue
                jbest = np.lexsort((ks[idx[ok]], d[ok]))[0]
                dd, kk = int(d[ok][jbest]), int(ks[idx[ok]][jbest])
                if (dd, kk) < (int(best_d[i]), int(best_k[i])):
                    best_d[i], best_k[i] = dd, kk
        res["truth_s"] = round(time.monotonic() - t0, 1)

        t = pq.read_table(out_path)
        got = {int(k): (int(m), int(d)) for k, m, d in
               zip(t.column("p_partkey").to_pylist(),
                   t.column("matched_partkey").to_pylist(),
                   t.column("dist").to_pylist())}
        mism = []
        for i, k in enumerate(sub_keys):
            expect = (int(best_k[i]), int(best_d[i]))
            if got.get(k) != expect:
                mism.append((k, got.get(k), expect))
        res["subsample"] = len(sub_keys)
        res["mismatches"] = len(mism)
        res["truth_match"] = not mism
        if mism:
            res["first_mismatches"] = mism[:5]

    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dir", default="/tmp/fuzzy_soak")
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
