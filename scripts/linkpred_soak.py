"""Link-prediction soak: 300k planted blocks -> 1.8M distinct edges /
1.5M nodes, with CLOSED-FORM truth for both scorers, run through BOTH
plans (CSR broadcast and the over-gate copartitioned exchange, forced).

Each block b plants nodes u=5b, v=5b+1 and hubs w1..w3=5b+2..5b+4 with
edges u-wi and v-wi (6 per block): (u, v) is non-adjacent with
common=3, deg(u)=deg(v)=3 -> jac = 1.0; hub pairs (wi, wj) share
{u, v} -> common=2, deg=2 -> jac = 1.0 as well, so the jac top-k is
the (part_a, part_b)-smallest pairs of the first blocks, exactly
enumerable. Adamic-Adar separates them: aa(u,v) = 3*w(2) (its common
neighbors are the degree-2 hubs) beats aa(wi,wj) = 2*w(3), so its
top-k is exactly the first 25 (u, v) pairs. The graph is encoded as a lineitem table (one 2-part order per
edge), so the PUBLIC query functions run unmodified.

Usage: python scripts/linkpred_soak.py [n_blocks]
"""
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build(n_blocks: int, out_dir: str) -> None:
    b = np.arange(n_blocks, dtype=np.int64) * 5
    u, v = b, b + 1
    edges_u = []
    edges_v = []
    for i in (2, 3, 4):
        w = b + i
        edges_u += [u, v]
        edges_v += [w, w]
    eu = np.concatenate(edges_u)
    ev = np.concatenate(edges_v)
    n_e = eu.size
    ok = np.arange(n_e, dtype=np.int64)
    t = pa.table({
        "l_orderkey": pa.array(np.repeat(ok, 2), pa.int64()),
        "l_partkey": pa.array(np.stack([eu, ev], 1).reshape(-1),
                              pa.int64()),
    })
    pq.write_table(t, f"{out_dir}/lineitem.parquet")


def expected_jac(k: int = 25):
    rows = []
    blk = 0
    while len(rows) < k + 8:
        base = blk * 5
        rows.append((base, base + 1, 3, 3, 3, 1_000_000))
        rows.append((base + 2, base + 3, 2, 2, 2, 1_000_000))
        rows.append((base + 2, base + 4, 2, 2, 2, 1_000_000))
        rows.append((base + 3, base + 4, 2, 2, 2, 1_000_000))
        blk += 1
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


def expected_aa(k: int = 25):
    # (u, v)'s common neighbors are the degree-2 HUBS: aa = 3 * w(2);
    # hub pairs' common neighbors are u, v (degree 3): aa = 2 * w(3)
    w2 = int(np.round(1e6 / np.log(2.0)))
    return [(b * 5, b * 5 + 1, 3, 3 * w2) for b in range(k)]


def main() -> None:
    import ray

    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    out = "/tmp/linkpred_soak"
    import os
    os.makedirs(out, exist_ok=True)
    build(n_blocks, out)

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.graph import (parts_adamic_adar,
                                     parts_neighbor_jaccard)

    res = {"n_blocks": n_blocks, "n_edges": 6 * n_blocks,
           "n_nodes": 5 * n_blocks}
    for plan in ("broadcast", "exchange"):
        t0 = time.monotonic()
        jac = parts_neighbor_jaccard(out, plan=plan).to_pandas()
        res[f"jac_{plan}_s"] = round(time.monotonic() - t0, 2)
        got = [tuple(int(x) for x in r)
               for r in jac[["part_a", "part_b", "common", "deg_a",
                             "deg_b", "jac_micro"]].values]
        assert got == expected_jac(), f"jac {plan} mismatch: {got[:5]}"

        t0 = time.monotonic()
        aa = parts_adamic_adar(out, plan=plan).to_pandas()
        res[f"aa_{plan}_s"] = round(time.monotonic() - t0, 2)
        got = [tuple(int(x) for x in r)
               for r in aa[["part_a", "part_b", "common",
                            "aa_micro"]].values]
        assert got == expected_aa(), f"aa {plan} mismatch: {got[:5]}"

    ray.shutdown()
    res["planted_truth"] = "exact for all four runs"
    print(json.dumps(res))


if __name__ == "__main__":
    main()
