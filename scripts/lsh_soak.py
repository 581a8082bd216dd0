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
  4. a COMMON-SUBSAMPLE equivalence gate: the first 50k docs run
     through both verify="broadcast" and verify="join"; the verified
     pair SETS must match exactly.

Run:  python scripts/lsh_soak.py [--docs 6000000] [--cpus 32]
Prints one JSON line; results are recorded in BASELINE.md §6.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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
        toks = ((base[:, None] * P1 + j[None, :] * P2) >> np.uint64(17)) \
            % np.uint64(VOCAB)
        toks = toks.astype(np.int64)
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=6_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--corpus", default="/tmp/lsh_soak_corpus")
    args = ap.parse_args()

    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from webxtract.ops import dedup as D

    res: dict = {"docs": args.docs, "cpus": args.cpus}

    marker = os.path.join(args.corpus, f"_DONE_{args.docs}")
    if not os.path.exists(marker):
        t0 = time.monotonic()
        synth_corpus(args.corpus, args.docs)
        with open(marker, "w") as f:
            f.write("ok")
        res["synth_s"] = round(time.monotonic() - t0, 1)

    docs = rd.read_parquet(args.corpus)

    # 1. MinHash-LSH, join verify forced
    t0 = time.monotonic()
    mh = D.minhash_lsh_pairs(docs, threshold=0.7, verify="join")
    mh_n = mh.count()
    res["minhash_join_s"] = round(time.monotonic() - t0, 1)
    res["minhash_pairs"] = mh_n

    # 3. clustering: distributed CC forced vs local on the same pairs
    pairs = mh.materialize()
    t0 = time.monotonic()
    cl_d = D.dedup_clusters(pairs, mode="distributed")
    n_d = cl_d.count()
    res["cc_distributed_s"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    cl_l = D.dedup_clusters(pairs, mode="local")
    n_l = cl_l.count()
    res["cc_local_s"] = round(time.monotonic() - t0, 1)
    res["cc_rows"] = {"distributed": n_d, "local": n_l}
    res["cc_match"] = bool(n_d == n_l)

    # 2. SimHash, join verify forced
    t0 = time.monotonic()
    sh_n = D.simhash_pairs(docs, verify="join").count()
    res["simhash_join_s"] = round(time.monotonic() - t0, 1)
    res["simhash_pairs"] = sh_n

    # 4. subsample equivalence: broadcast == join on the SAME 50k docs
    sub_files = sorted(
        os.path.join(args.corpus, f) for f in os.listdir(args.corpus)
        if f.endswith(".parquet"))[:1]
    sub = rd.read_parquet(sub_files)
    res["subsample_docs"] = sub.count()
    bc = pair_set(D.minhash_lsh_pairs(sub, threshold=0.7,
                                      verify="broadcast"))
    jn = pair_set(D.minhash_lsh_pairs(sub, threshold=0.7, verify="join"))
    res["subsample_pairs"] = {"broadcast": len(bc), "join": len(jn)}
    res["subsample_match"] = bool(bc == jn)

    # expected planted pairs for context
    res["planted_pairs"] = sum(1 for i in range(1, args.docs)
                               if i % DUP_STRIDE == 1)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
