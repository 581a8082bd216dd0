"""Graph-suite soak: exact triangle counting and k-core peeling on a
synthetic 1M-node / ~9.5M-edge graph with CLOSED-FORM truth — the
scale-path validation for ops.graph.triangle_count_edges /
kcore_edges, companion to the span/LSH/fuzzy soaks.

Graph: a disjoint union of K cliques of size C (node ids contiguous
per clique). Every quantity is closed-form:
  nodes = K*C   edges = K*C(C,2)   triangles = K*C(C,3)
  (C-1)-core = ALL nodes (every degree is exactly C-1)
  C-core     = EMPTY (one synchronized peel round drops everything)
At 1M nodes the auto gate genuinely lands on the JOIN path
(n^2 >> 128m and n > the bitset node gate) — reported, not assumed —
so the soak exercises the degree-oriented wedge generation + map-side
edge-set probe at ~50M wedges.

Phases run in fresh Ray sessions:
  1. synth     -> <dir>/edges.parquet (packed u<<32|v keys)
  2. triangles -> auto path == join; count == K*C(C,3) exact
  3. kcore     -> (C-1)-core == all nodes w/ deg C-1; C-core == empty

Run:  python scripts/graph_soak.py [--cliques 50000] [--size 20]
Prints one JSON line; recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PHASES = ("synth", "triangles", "kcore")


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
    import ray.data as rd

    res: dict = {}
    edge_dir = os.path.join(args.dir, "edges.parquet")
    K, C = args.cliques, args.size

    def load_edges():
        return rd.read_parquet(edge_dir).materialize()

    if phase == "synth":
        marker = os.path.join(args.dir, f"_DONE_{K}_{C}")
        if not os.path.exists(marker):
            shutil.rmtree(args.dir, ignore_errors=True)
            os.makedirs(args.dir, exist_ok=True)
            t0 = time.monotonic()
            iu, iv = np.triu_indices(C, 1)

            def render(batch: dict) -> pa.Table:
                out = []
                for q in batch["id"]:
                    base = np.uint64(int(q) * C + 1)
                    u = base + iu.astype(np.uint64)
                    v = base + iv.astype(np.uint64)
                    out.append((u << np.uint64(32)) | v)
                pk = np.concatenate(out) if out else np.zeros(0, np.uint64)
                return pa.table({"k": pa.array(pk.view(np.int64),
                                               pa.int64())})

            (rd.range(K).repartition(args.cpus)
             .map_batches(render, batch_format="numpy")
             .write_parquet(edge_dir))
            with open(marker, "w") as f:
                f.write("ok")
            res["synth_s"] = round(time.monotonic() - t0, 1)

    elif phase == "triangles":
        import webxtract.ops.graph as G

        edges = load_edges()
        n_nodes, n_edges = K * C, K * (C * (C - 1) // 2)
        res["auto_is_join"] = bool(
            n_nodes > G.TRI_BITSET_MAX_NODES
            or n_edges > G.TRI_BITSET_MAX_EDGES
            or n_nodes * n_nodes > 128 * n_edges)
        t0 = time.monotonic()
        df = G.triangle_count_edges(edges, verify="auto").to_pandas()
        res["triangles_s"] = round(time.monotonic() - t0, 1)
        got = (int(df.n_nodes[0]), int(df.n_edges[0]),
               int(df.n_triangles[0]))
        expect = (n_nodes, n_edges, K * math.comb(C, 3))
        res["got"] = got
        res["expect"] = expect
        res["truth_match"] = bool(got == expect)

    elif phase == "kcore":
        import webxtract.ops.graph as G

        edges = load_edges()
        t0 = time.monotonic()
        full = G.kcore_edges(edges, k=C - 1, rounds=3).to_pandas()
        res["kcore_full_s"] = round(time.monotonic() - t0, 1)
        res["full_core_ok"] = bool(
            len(full) == K * C and (full.deg == C - 1).all())
        t0 = time.monotonic()
        empty = G.kcore_edges(edges, k=C, rounds=3).to_pandas()
        res["kcore_empty_s"] = round(time.monotonic() - t0, 1)
        res["empty_core_ok"] = bool(len(empty) == 0)
        res["truth_match"] = bool(res["full_core_ok"]
                                  and res["empty_core_ok"])

    ray.shutdown()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cliques", type=int, default=50_000)
    ap.add_argument("--size", type=int, default=20)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--dir", default="/tmp/graph_soak")
    ap.add_argument("--phase", default="all", choices=("all",) + PHASES)
    args = ap.parse_args()

    if args.phase != "all":
        print(json.dumps(run_phase(args.phase, args)))
        return

    res: dict = {"cliques": args.cliques, "size": args.size,
                 "cpus": args.cpus}
    for phase in PHASES:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", phase, "--cliques", str(args.cliques),
             "--size", str(args.size), "--cpus", str(args.cpus),
             "--dir", args.dir],
            capture_output=True, text=True)
        if out.returncode != 0:
            res[phase] = {"error": out.stderr[-2000:]}
            print(json.dumps(res))
            sys.exit(1)
        res[phase] = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
