"""Changelog-family soak: MERGE INTO + SCD Type-2 at 20M document
rows, with an exact numpy replica as ground truth — the scale-path
validation for ops.relational.docs_cdc_merge / docs_scd2, companion
to the other soaks.

Corpus: documents.parquet with doc_id = 0..N-1 and
n_chars = (doc_id * 2654435761) % 10000 — the only two columns the
changelog derivation reads. The derivation (base = doc_id % 3 != 0 at
seq -1; changelog = even ids folded 2-per-key under key = id // 4
with delete iff id % 3 == 1) then yields ~1.08N event rows whose
exact merge/SCD2 results a vectorized numpy replica computes in one
pass; the distributed results must match on row count, payload sum
and an order-independent 64-bit mix digest.

Phases in fresh Ray sessions: synth -> merge (docs_cdc_merge) ->
scd2 (docs_scd2, interval checks + digest).

Run:  python scripts/cdc_soak.py [--n 20000000] [--cpus 32]
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

PHASES = ("synth", "merge", "scd2")
MIX = 0x9E3779B97F4A7C15


def _mix_digest(*cols):
    """Order-independent 64-bit digest: sum of mixed row tuples."""
    import numpy as np

    acc = np.zeros(len(cols[0]), np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            acc = (acc ^ c.astype(np.uint64)) * np.uint64(MIX)
        return int(acc.sum(dtype=np.uint64))


def _replica_events(n):
    """The deterministic (key, seq, del, payload) event stream."""
    import numpy as np

    ids = np.arange(n, dtype=np.int64)
    nch = (ids * 2654435761) % 10000
    bmask = ids % 3 != 0
    b_key = ids[bmask]
    b_seq = np.full(b_key.size, -1, np.int64)
    b_del = np.zeros(b_key.size, bool)
    b_pay = nch[bmask]
    cmask = ids % 2 == 0
    c_ids = ids[cmask]
    c_key = c_ids // 4
    c_seq = c_ids
    c_del = c_ids % 3 == 1
    c_pay = nch[cmask] + 1_000_000
    return (np.concatenate([b_key, c_key]),
            np.concatenate([b_seq, c_seq]),
            np.concatenate([b_del, c_del]),
            np.concatenate([b_pay, c_pay]))


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

    if phase == "synth":
        marker = os.path.join(args.dir, f"_DONE_{args.n}")
        if not os.path.exists(marker):
            shutil.rmtree(args.dir, ignore_errors=True)
            os.makedirs(args.dir, exist_ok=True)
            t0 = time.monotonic()

            def render(batch: dict) -> pa.Table:
                ids = batch["id"].astype(np.int64)
                return pa.table({
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_chars": pa.array((ids * 2654435761) % 10000,
                                        pa.int64())})

            (rd.range(args.n).repartition(args.cpus * 2)
             .map_batches(render, batch_format="numpy")
             .write_parquet(doc_path))
            with open(marker, "w") as f:
                f.write("ok")
            res["synth_s"] = round(time.monotonic() - t0, 1)

    elif phase == "merge":
        from webxtract.ops.relational import docs_cdc_merge

        t0 = time.monotonic()
        out = os.path.join(args.dir, "merged.parquet")
        shutil.rmtree(out, ignore_errors=True)
        docs_cdc_merge(args.dir).write_parquet(out)
        res["merge_s"] = round(time.monotonic() - t0, 1)
        t = pq.read_table(out)
        key = t.column("key").to_numpy()
        pay = t.column("payload").to_numpy()
        # numpy replica: latest seq per key wins, delete drops
        k, s, d, p = _replica_events(args.n)
        order = np.lexsort((-s, k))
        k_s, d_s, p_s = k[order], d[order], p[order]
        first = np.ones(k_s.size, bool)
        first[1:] = k_s[1:] != k_s[:-1]
        kw, dw, pw = k_s[first], d_s[first], p_s[first]
        keep = ~dw
        res["rows"] = int(t.num_rows)
        res["rows_expected"] = int(keep.sum())
        res["digest_match"] = bool(
            _mix_digest(key, pay) == _mix_digest(kw[keep], pw[keep]))
        res["events_per_s"] = round(
            (k.size) / max(res["merge_s"], 1e-9))
        res["gates_pass"] = bool(
            res["rows"] == res["rows_expected"]
            and res["digest_match"])

    elif phase == "scd2":
        from webxtract.ops.relational import SCD2_OPEN_END, docs_scd2

        t0 = time.monotonic()
        out = os.path.join(args.dir, "scd2.parquet")
        shutil.rmtree(out, ignore_errors=True)
        docs_scd2(args.dir).write_parquet(out)
        res["scd2_s"] = round(time.monotonic() - t0, 1)
        t = pq.read_table(out)
        k, s, d, p = _replica_events(args.n)
        order = np.lexsort((s, k))
        k_s, s_s, d_s, p_s = k[order], s[order], d[order], p[order]
        last = np.ones(k_s.size, bool)
        last[:-1] = k_s[1:] != k_s[:-1]
        nxt = np.empty(k_s.size, np.int64)
        nxt[:-1] = s_s[1:]
        nxt[last] = SCD2_OPEN_END
        ups = ~d_s
        res["rows"] = int(t.num_rows)
        res["rows_expected"] = int(ups.sum())
        res["digest_match"] = bool(
            _mix_digest(t.column("key").to_numpy(),
                        t.column("payload").to_numpy(),
                        t.column("valid_from").to_numpy(),
                        t.column("valid_to").to_numpy())
            == _mix_digest(k_s[ups], p_s[ups], s_s[ups], nxt[ups]))
        cur = t.column("is_current").to_numpy(zero_copy_only=False)
        vt = t.column("valid_to").to_numpy()
        res["current_consistent"] = bool(
            ((vt == SCD2_OPEN_END) == cur).all())
        res["gates_pass"] = bool(
            res["rows"] == res["rows_expected"]
            and res["digest_match"] and res["current_consistent"])

    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dir", default="/tmp/cdc_soak")
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
