"""Redirect-chain resolution (webxtract/ops/web.py
resolve_redirects): spec table, cycle classes, the broadcast==join
two-path equivalence on random graphs, and smallest-dst tie-breaking.
Fixture parity lives in test_oracle_parity.py (redirect_resolution)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from webxtract.ops.web import resolve_redirects


def _pages(urls):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string())})).repartition(3)


def _edges(pairs):
    return rd.from_arrow(pa.table({
        "src_url": pa.array([p[0] for p in pairs], pa.string()),
        "dst_url": pa.array([p[1] for p in pairs], pa.string())})) \
        .repartition(2)


def _df(ds):
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _canon(df):
    return df[sorted(df.columns)].sort_values(
        list(sorted(df.columns)), ignore_index=True)


def test_spec_table(ray_session):
    urls = ["t", "a", "b", "c", "x", "y", "long0"]
    pairs = [("a", "t"),             # 1 hop to terminal
             ("b", "a"), ("c", "b"),  # chains of 2 and 3
             ("x", "y"), ("y", "x")]  # 2-cycle
    pairs += [(f"long{i}", f"long{i+1}") for i in range(7)]  # > cap
    for mode in ("broadcast", "join"):
        df = _df(resolve_redirects(_pages(urls), _edges(pairs),
                                   max_hops=5, mode=mode))
        got = {r.url: (r.final_url, r.hops, r.status)
               for r in df.itertuples()}
        assert got["t"] == ("t", 0, "ok")
        assert got["a"] == ("t", 1, "ok")
        assert got["b"] == ("t", 2, "ok")
        assert got["c"] == ("t", 3, "ok")
        assert got["x"] == (None, 5, "unresolved")
        assert got["y"] == (None, 5, "unresolved")
        assert got["long0"] == (None, 5, "unresolved")


def test_self_loop_and_smallest_dst_tiebreak(ray_session):
    urls = ["s", "m"]
    pairs = [("s", "s"), ("m", "zz"), ("m", "aa")]
    for mode in ("broadcast", "join"):
        df = _df(resolve_redirects(_pages(urls), _edges(pairs),
                                   mode=mode))
        got = {r.url: (r.final_url, r.hops, r.status)
               for r in df.itertuples()}
        assert got["s"] == (None, 5, "unresolved")
        assert got["m"] == ("aa", 1, "ok")  # smallest dst wins


def test_paths_agree_on_random_graph(ray_session):
    rng = np.random.default_rng(11)
    n = 300
    urls = [f"u{i}" for i in range(n)]
    pairs = [(f"u{i}", f"u{int(rng.integers(0, n))}")
             for i in rng.choice(n, size=150, replace=False)]
    a = _canon(_df(resolve_redirects(_pages(urls), _edges(pairs),
                                     max_hops=6, mode="broadcast")))
    b = _canon(_df(resolve_redirects(_pages(urls), _edges(pairs),
                                     max_hops=6, mode="join")))
    assert a.equals(b)


def test_exact_hop_at_cap_is_ok(ray_session):
    # a chain of exactly max_hops steps terminates AT the cap -> ok
    pairs = [(f"c{i}", f"c{i+1}") for i in range(4)]  # c0..c4
    for mode in ("broadcast", "join"):
        df = _df(resolve_redirects(_pages(["c0"]), _edges(pairs),
                                   max_hops=4, mode=mode))
        assert (df.loc[0, "final_url"], df.loc[0, "hops"],
                df.loc[0, "status"]) == ("c4", 4, "ok")
