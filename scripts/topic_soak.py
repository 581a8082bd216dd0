"""Topic-clustering soak: the integer Lloyd's fold at 1M documents.

A synthetic 4-topic corpus (disjoint 100-token vocabularies, 30 seeded
tokens per doc) is written as a documents.parquet; the REAL
docs_topic_features + docs_topic_clusters pipeline runs over it, and a
VECTORIZED numpy replica of the exact integer recurrence (same seeds,
same fixed point, same tie-breaks) replays the iterations over the
materialized feature matrix — assignments must agree row-for-row.
Also reports cluster purity vs the planted topics.

Run: python scripts/topic_soak.py [--docs 1000000] [--cpus 32]
"""

import argparse
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K, ITERS = 4, 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    N = args.docs

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from webxtract.ops.text import (TOPIC_DIM, TOPIC_SCALE,
                                    _feat_matrix, docs_topic_clusters,
                                    docs_topic_features)

    out = "/tmp/topic_soak"
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "documents.parquet")
    t0 = time.monotonic()
    if not os.path.exists(path):
        vocab = np.array([f"w{t}x{j}" for t in range(K)
                          for j in range(100)])
        rng = np.random.default_rng(0)
        ids = np.arange(N, dtype=np.int64)
        topics = ids % K
        draws = rng.integers(0, 100, size=(N, 30))
        toks = vocab[(topics[:, None] * 100 + draws)]
        texts = np.array([" ".join(r) for r in toks])
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string())}), path)
    print(f"corpus: {N} docs in {time.monotonic() - t0:.1f}s",
          flush=True)

    t0 = time.monotonic()
    got = docs_topic_clusters(out).to_pandas()
    dt = time.monotonic() - t0
    print(f"docs_topic_clusters: {len(got)} docs in {dt:.1f}s = "
          f"{len(got) / dt:,.0f} docs/s", flush=True)

    # vectorized replica over the SAME features (engine feature op)
    t0 = time.monotonic()
    feats = docs_topic_features(out).materialize()
    ids_l, V_l = [], []
    for b in feats.iter_batches(batch_format="pyarrow"):
        ids_l.append(b.column("doc_id").to_numpy())
        V_l.append(_feat_matrix(b, TOPIC_DIM))
    ids = np.concatenate(ids_l)
    V = np.concatenate(V_l)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    S = TOPIC_SCALE
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2 ** 32)
    seed_idx = np.lexsort((ids, h))[:K]
    cent = V[seed_idx] * S
    for _ in range(ITERS):
        D = ((V[:, None, :] * S - cent[None, :, :]) ** 2).sum(axis=2)
        asg = D.argmin(axis=1)
        counts = np.bincount(asg, minlength=K)
        sums = np.zeros((K, TOPIC_DIM), np.int64)
        np.add.at(sums, asg, V)
        cent = np.zeros((K, TOPIC_DIM), np.int64)
        nz = counts > 0
        cent[nz] = (S * sums[nz]) // counts[nz, None]
    D = ((V[:, None, :] * S - cent[None, :, :]) ** 2).sum(axis=2)
    rep = D.argmin(axis=1)
    print(f"replica: {time.monotonic() - t0:.1f}s", flush=True)

    g = got.sort_values("doc_id").cluster.to_numpy()
    exact = bool((g == rep).all())
    topics = ids % K
    purity = sum(np.bincount(topics[g == c]).max()
                 for c in range(K) if (g == c).any()) / len(g)
    print(f"exact-match={exact} planted-topic purity={purity:.4f}",
          flush=True)
    print("RESULT:", "PASS" if exact else "FAIL")
    ray.shutdown()
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
