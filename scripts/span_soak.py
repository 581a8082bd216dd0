"""Span-dedup soak: ExactSubstr-style duplicated-span coverage at 1M+
docs with the JOIN path (Bloom prefilter + copartitioned semi-join)
exercised both FORCED and via the auto-gate — the scale-path
validation for docs_dup_span_frac, companion to scripts/lsh_soak.py.

Corpus: the same deterministic fmix64 token generator as the LSH soak
(written as ``<dir>/documents.parquet`` so the sf_dir-shaped ops read
it): every doc_id % 37 == 1 is its predecessor's 30-token sequence
with ONE position mutated, so each planted pair shares exact 8-gram
spans on both sides of the mutation — ground truth: dup_frac > 0 for
exactly the 2 * floor-ish/37 planted docs, 0 for everyone else (an
accidental 8-token run collision over fmix64-hashed tokens is
impossible in practice).

The dup-gram set grows ~456k grams per 1M docs, so the 2M-doc run
crosses DUP_SPAN_BROADCAST_MAX=500k and "auto" genuinely lands on the
join path — reported (auto_is_join), not assumed; the join path is
additionally FORCED at every size.

Phases run in fresh Ray sessions (the lsh_soak disk-spill lesson):
  1. synth -> <dir>/documents.parquet
  2. dup_frac with verify="join" at full scale: count docs with
     dup_frac > 0 vs planted truth; assert auto-gate == join
  3. subsample equivalence: one shard through broadcast AND join —
     identical (doc_id, n_tokens, dup_frac) triples.

Run:  python scripts/span_soak.py [--docs 1000000] [--cpus 32]
Prints one JSON line; recorded in BASELINE.md §7.
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

PHASES = ("synth", "join", "subsample")
DUP_STRIDE = 37


def run_phase(phase: str, args) -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from scripts.lsh_soak import synth_corpus
    from webxtract.ops.text import (DUP_SPAN_BROADCAST_MAX, _dup_gram_ds,
                                    docs_dup_span_frac)

    res: dict = {}
    doc_dir = os.path.join(args.dir, "documents.parquet")

    if phase == "synth":
        marker = os.path.join(args.dir, f"_DONE_{args.docs}")
        if not os.path.exists(marker):
            shutil.rmtree(args.dir, ignore_errors=True)
            os.makedirs(args.dir, exist_ok=True)
            t0 = time.monotonic()
            synth_corpus(doc_dir, args.docs)
            with open(marker, "w") as f:
                f.write("ok")
            res["synth_s"] = round(time.monotonic() - t0, 1)

    elif phase == "join":
        n_dup = _dup_gram_ds(args.dir, 8).count()
        res["dup_grams"] = n_dup
        res["auto_is_join"] = bool(n_dup > DUP_SPAN_BROADCAST_MAX)
        t0 = time.monotonic()
        out = docs_dup_span_frac(args.dir, verify="join")
        n_pos = out.filter(expr="dup_frac > 0").count()
        res["join_s"] = round(time.monotonic() - t0, 1)
        res["docs_with_dup_spans"] = n_pos
        # planted truth: both members of every (i-1, i%37==1) pair
        res["planted_docs"] = 2 * sum(
            1 for i in range(1, args.docs) if i % DUP_STRIDE == 1)
        res["truth_match"] = bool(n_pos == res["planted_docs"])

    elif phase == "subsample":
        files = sorted(os.path.join(doc_dir, f)
                       for f in os.listdir(doc_dir)
                       if f.endswith(".parquet"))[:1]
        sub_dir = args.dir + "_sub"
        shutil.rmtree(sub_dir, ignore_errors=True)
        os.makedirs(sub_dir)
        os.symlink(os.path.abspath(files[0]),
                   os.path.join(sub_dir, "documents.parquet"))
        res["subsample_docs"] = rd.read_parquet(files).count()

        def triples(ds) -> set:
            out = set()
            for b in ds.iter_batches(batch_format="pyarrow"):
                out.update(zip(b.column("doc_id").to_pylist(),
                               b.column("n_tokens").to_pylist(),
                               b.column("dup_frac").to_pylist()))
            return out

        bc = triples(docs_dup_span_frac(sub_dir, verify="broadcast"))
        jn = triples(docs_dup_span_frac(sub_dir, verify="join"))
        res["subsample_rows"] = {"broadcast": len(bc), "join": len(jn)}
        res["subsample_match"] = bool(bc == jn)

    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dir", default="/tmp/span_soak")
    ap.add_argument("--phase", default="all", choices=("all",) + PHASES)
    args = ap.parse_args()

    if args.phase != "all":
        print(json.dumps(run_phase(args.phase, args)))
        return

    res: dict = {"docs": args.docs, "cpus": args.cpus}
    for phase in PHASES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", phase, "--docs", str(args.docs),
             "--cpus", str(args.cpus), "--dir", args.dir],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(f"phase {phase} failed rc={out.returncode}")
        res.update(json.loads(out.stdout.strip().splitlines()[-1]))
        sys.stderr.write(f"[soak] {phase} done\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
