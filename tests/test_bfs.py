"""Multi-source BFS min-hop semantics on planted topologies (oracle
parity over the real co-order graph runs in test_oracle_parity.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from webxtract.ops.graph import bfs_hops_edges


def _edges(pairs):
    u = np.array([min(a, b) for a, b in pairs], np.uint64)
    v = np.array([max(a, b) for a, b in pairs], np.uint64)
    k = (u << np.uint64(32)) | v
    return rd.from_arrow(pa.table(
        {"k": pa.array(np.unique(k).view(np.int64), pa.int64())}))


def test_chain_hops_and_unreachable(ray_session):
    # 0-1-2-3-4-5 chain, seed = node 0 (mod 97): hops cap at 3, so
    # nodes 4 and 5 must be absent from the result
    e = _edges([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    got = bfs_hops_edges(e, seed_mod=97, max_hops=3).to_pandas()
    assert dict(zip(got.node, got.hops)) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_min_hop_wins_over_longer_path(ray_session):
    # two routes from seed 0 to node 3: 0-3 direct and 0-1-2-3;
    # min-hop semantics must record 1, not 3
    e = _edges([(0, 1), (1, 2), (2, 3), (0, 3)])
    got = bfs_hops_edges(e, seed_mod=97, max_hops=3).to_pandas()
    assert dict(zip(got.node, got.hops)) == {0: 0, 1: 1, 2: 2, 3: 1}


def test_multi_seed_takes_nearest(ray_session):
    # seeds 0 and 97; node 50 adjacent to 97 only -> hop 1 from there
    e = _edges([(0, 1), (97, 50), (1, 50)])
    got = bfs_hops_edges(e, seed_mod=97, max_hops=3).to_pandas()
    d = dict(zip(got.node, got.hops))
    assert d[50] == 1 and d[0] == 0 and d[97] == 0 and d[1] == 1


def test_disconnected_component_excluded(ray_session):
    # component {200, 201} contains no seed -> never appears
    e = _edges([(0, 1), (200, 201)])
    got = bfs_hops_edges(e, seed_mod=97, max_hops=3).to_pandas()
    assert set(got.node) == {0, 1}
