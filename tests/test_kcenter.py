"""Greedy k-center coreset properties (oracle parity runs in
test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from webxtract.ops.knn import emb_kcenter

SF = "/root/testdata/sf0.001"


def test_greedy_invariants(ray_session):
    df = emb_kcenter(SF).to_pandas()
    assert list(df["rank"]) == list(range(8))
    assert df.vec_id.is_unique
    # the covering radius is non-increasing from rank 1 on (greedy
    # picks the farthest point, then distances only shrink)
    d2 = df.d2.values[1:]
    assert (np.diff(d2) <= 0).all()
    assert df.d2.iloc[0] == 0


def test_planted_clusters_each_get_one_center(ray_session, tmp_path):
    # 8 tight, well-separated clusters: the first 8 picks must land in
    # 8 DISTINCT clusters (the defining property of farthest-point)
    rng = np.random.default_rng(5)
    centers = rng.normal(0, 50, (8, 16))
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(25):
            v = centers[c] + rng.normal(0, 0.5, 16)
            rows.append((vid, v.astype(np.float32), c))
            vid += 1
    emb = pa.array([r[1].tolist() for r in rows],
                   pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array([r[0] for r in rows], pa.int64()),
                  "embedding": emb,
                  "label": pa.array([r[2] for r in rows], pa.int32())})
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")
    got = emb_kcenter(str(tmp_path), k=8).to_pandas()
    labels = pd.Series([rows[v][2] for v in got.vec_id])
    assert labels.nunique() == 8
