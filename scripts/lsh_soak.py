"""LSH soak (BASELINE.md §6): near-dup dedup at millions of docs with
the scale paths FORCED ON — validates the auto-gate thresholds
empirically (VERDICT r2 item 8).

Deterministically synthesizes a documents corpus with planted
near-dups (every doc_id % 37 == 1 is a one-token mutation of its
predecessor; token-set Jaccard ~0.93), then:

  1. minhash_lsh_pairs with verify="join" (the 100 TB path: the pair
     list joins the docs table twice, no broadcast dict) at full scale;
  2. simhash_pairs with verify="join";
  3. dedup_clusters with mode="distributed" (pointer-jumping over
     edges⋈labels hash joins) vs mode="local" — assignments counted;
  4. a COMMON-SUBSAMPLE equivalence gate: the first shard runs
     through both verify="broadcast" and verify="join"; the verified
     pair SETS must match exactly.

Each phase runs in a FRESH Ray session (own subprocess): a single
session accumulates object-store spill across phases (the pair list
pinned by materialize() plus per-phase shuffle partitions), which
filled the sandbox disk at 6M docs. Phases hand off through parquet —
exactly how a resumable production run would stage them.

Run:  python scripts/lsh_soak.py [--docs 6000000] [--cpus 32]
Prints one JSON line; results are recorded in BASELINE.md §6.
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

import numpy as np
import pyarrow as pa

P1 = np.uint64(0x9E3779B97F4A7C15)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
VOCAB = 50_000
DOC_LEN = 30
DUP_STRIDE = 37  # doc_id % 37 == 1  ->  near-dup of doc_id - 1
PHASES = ("synth", "minhash", "cc", "simhash", "subsample")


def synth_corpus(out_dir: str, n_docs: int, files: int = 64) -> None:
    """Deterministic (doc_id-keyed, no RNG state) corpus: text is a
    hash-derived token sequence, so any partitioning regenerates the
    same bytes. Runs as a Ray pipeline (range -> map_batches)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        is_dup = (ids % DUP_STRIDE) == 1
        base = np.where(is_dup, ids - 1, ids).astype(np.uint64)
        j = np.arange(DOC_LEN, dtype=np.uint64)
        x = base[:, None] * P1 + j[None, :] * P2
        # fmix64 finalizer: without it the token streams are samples of
        # one 2-D lattice, and doc-id deltas d with d*P1 = m*P2 (mod
        # 2^64, small m) produce ACCIDENTAL genuine near-dups (measured
        # at d=168644: whole shifted sequences, jaccard 0.82)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        toks = (x % np.uint64(VOCAB)).astype(np.int64)
        # near-dup: mutate ONE position, value keyed to the dup's own id
        mut_pos = (ids % DOC_LEN).astype(np.int64)
        mut_val = ((ids.astype(np.uint64) * P2) >> np.uint64(13)) \
            % np.uint64(VOCAB)
        rows = np.where(is_dup)[0]
        toks[rows, mut_pos[rows]] = mut_val.astype(np.int64)[rows]
        texts = [" ".join(map(str, row)) for row in toks]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    shutil.rmtree(out_dir, ignore_errors=True)
    (rd.range(n_docs, override_num_blocks=files)
       .map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
       .write_parquet(out_dir))


def pair_set(pairs_ds) -> set[tuple[int, int]]:
    out = set()
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        out.update(zip(b.column("doc_a").to_pylist(),
                       b.column("doc_b").to_pylist()))
    return out


def _init_ray(cpus: int):
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def run_phase(phase: str, args) -> dict:
    ray = _init_ray(args.cpus)
    import ray.data as rd

    from webxtract.ops import dedup as D

    res: dict = {}
    pairs_dir = args.corpus + "_pairs"

    if phase == "synth":
        marker = os.path.join(args.corpus, f"_DONE_{args.docs}")
        if not os.path.exists(marker):
            t0 = time.monotonic()
            synth_corpus(args.corpus, args.docs)
            with open(marker, "w") as f:
                f.write("ok")
            res["synth_s"] = round(time.monotonic() - t0, 1)

    elif phase == "minhash":
        docs = rd.read_parquet(args.corpus)
        t0 = time.monotonic()
        mh = D.minhash_lsh_pairs(docs, threshold=0.7, verify="join")
        shutil.rmtree(pairs_dir, ignore_errors=True)
        mh.write_parquet(pairs_dir)
        res["minhash_join_s"] = round(time.monotonic() - t0, 1)
        res["minhash_pairs"] = rd.read_parquet(pairs_dir).count()

    elif phase == "cc":
        pairs = rd.read_parquet(pairs_dir)
        t0 = time.monotonic()
        n_d = D.dedup_clusters(pairs, mode="distributed").count()
        res["cc_distributed_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        n_l = D.dedup_clusters(pairs, mode="local").count()
        res["cc_local_s"] = round(time.monotonic() - t0, 1)
        res["cc_rows"] = {"distributed": n_d, "local": n_l}
        res["cc_match"] = bool(n_d == n_l)

    elif phase == "simhash":
        docs = rd.read_parquet(args.corpus)
        t0 = time.monotonic()
        sh_n = D.simhash_pairs(docs, verify="join").count()
        res["simhash_join_s"] = round(time.monotonic() - t0, 1)
        res["simhash_pairs"] = sh_n

    elif phase == "subsample":
        sub_files = sorted(
            os.path.join(args.corpus, f) for f in os.listdir(args.corpus)
            if f.endswith(".parquet"))[:1]
        sub = rd.read_parquet(sub_files)
        res["subsample_docs"] = sub.count()
        bc = pair_set(D.minhash_lsh_pairs(sub, threshold=0.7,
                                          verify="broadcast"))
        jn = pair_set(D.minhash_lsh_pairs(sub, threshold=0.7,
                                          verify="join"))
        res["subsample_pairs"] = {"broadcast": len(bc), "join": len(jn)}
        res["subsample_match"] = bool(bc == jn)

    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=6_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--corpus", default="/tmp/lsh_soak_corpus")
    ap.add_argument("--phase", default="all",
                    choices=("all",) + PHASES)
    args = ap.parse_args()

    if args.phase != "all":
        print(json.dumps(run_phase(args.phase, args)))
        return

    res: dict = {"docs": args.docs, "cpus": args.cpus}
    for phase in PHASES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", phase, "--docs", str(args.docs),
             "--cpus", str(args.cpus), "--corpus", args.corpus],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(f"phase {phase} failed rc={out.returncode}")
        res.update(json.loads(out.stdout.strip().splitlines()[-1]))
        sys.stderr.write(f"[soak] {phase} done\n")

    res["planted_pairs"] = sum(1 for i in range(1, args.docs)
                               if i % DUP_STRIDE == 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
