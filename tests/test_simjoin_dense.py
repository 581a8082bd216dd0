"""Dense-verify + run-generation regime of the cosine simjoins
(webxtract/ops/dedup.py): the broadcast gate now generates candidates
as one local vectorized pass (ratio-sorted runs, slack-guarded float
cut) and verifies against a broadcast dense matrix. These tests pin
(1) three-way path equality (join / dense / dict-loop), (2) exact
threshold-equality retention through the float run cut, and (3) the
int64-overflow and cell-cap fallbacks to the dict loop."""

import numpy as np
import pyarrow as pa
import ray.data as rd

import webxtract.ops.dedup as D
from webxtract.ops.dedup import (cosine_simjoin_pairs,
                                 cosine_simjoin_tf_pairs)


def _mk(texts, blocks=3):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return rd.from_arrow(t).repartition(blocks)


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _pair_set(ds):
    df = ds.to_pandas()
    if df.empty:
        return set()
    return set(map(tuple, df[["doc_a", "doc_b"]]
                   .itertuples(index=False)))


def test_three_paths_agree_on_random_corpus(ray_session):
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(40)])
    texts = [" ".join(rng.choice(vocab,
                                 size=int(rng.integers(5, 30))).tolist())
             for _ in range(300)]
    for fn in (cosine_simjoin_pairs, cosine_simjoin_tf_pairs):
        outs = []
        for kw in (dict(verify="join"),
                   dict(verify="broadcast", dense="auto"),
                   dict(verify="broadcast", dense="off")):
            outs.append(_sorted_df(fn(_mk(texts), tp=4, tq=5, **kw)))
        assert outs[0].equals(outs[1]), "join != dense"
        assert outs[0].equals(outs[2]), "join != dict-loop"


def test_binary_threshold_equality_kept(ray_session):
    """cos exactly 19/20 must survive the slack-guarded float run cut
    (the predicate is >=), while one-token-less stays excluded."""
    shared = [f"s{i}" for i in range(380)]
    a = shared + [f"a{i}" for i in range(20)]      # ov=380, na=nb=400
    b = shared + [f"b{i}" for i in range(20)]      # cos == 0.95 exactly
    shared2 = [f"t{i}" for i in range(379)]
    c = shared2 + [f"c{i}" for i in range(21)]     # ov=379 -> cos < 0.95
    d = shared2 + [f"d{i}" for i in range(21)]
    texts = [" ".join(a), " ".join(b), " ".join(c), " ".join(d)]
    for dense in ("auto", "off"):
        got = _pair_set(cosine_simjoin_pairs(
            _mk(texts), tp=19, tq=20, verify="broadcast", dense=dense))
        assert got == {(0, 1)}, (dense, got)


def test_tf_threshold_equality_kept(ray_session):
    """tf-cosine exactly at threshold: two identical-tf docs padded so
    dot^2 * tq^2 == tp^2 * n2a * n2b holds with equality (3/5 = cos of
    (2,1) vs (1,2) over two shared tokens... constructed as x x y vs
    x y y: dot=4, n2=5 each -> cos=4/5); tp/tq=4/5 keeps it, 81/100
    drops it."""
    texts = ["x x y", "x y y", "p p q", "q r r"]
    for dense in ("auto", "off"):
        got = _pair_set(cosine_simjoin_tf_pairs(
            _mk(texts), tp=4, tq=5, verify="broadcast", dense=dense))
        assert (0, 1) in got, (dense, got)
        got_hi = _pair_set(cosine_simjoin_tf_pairs(
            _mk(texts), tp=81, tq=100, verify="broadcast", dense=dense))
        assert (0, 1) not in got_hi, (dense, got_hi)


def test_tf_overflow_guard_falls_back_and_matches(ray_session):
    """tf values big enough that |vocab| * max_tf^2 squared times tq^2
    overflows int64 force the dict-loop fallback; dense='auto' must
    equal dense='off' and the expected pair set."""
    # max_tf = 6000, vocab ~ 6 -> dmax ~ 2.2e8, 400 * dmax^2 > 2^62
    big_a = " ".join(["x"] * 6000 + ["y"] * 10)
    big_b = " ".join(["x"] * 6000 + ["z"] * 10)
    other = "p q r"
    texts = [big_a, big_b, other]
    auto = _sorted_df(cosine_simjoin_tf_pairs(
        _mk(texts), tp=19, tq=20, verify="broadcast", dense="auto"))
    off = _sorted_df(cosine_simjoin_tf_pairs(
        _mk(texts), tp=19, tq=20, verify="broadcast", dense="off"))
    assert auto.equals(off)
    assert _pair_set(cosine_simjoin_tf_pairs(
        _mk(texts), tp=19, tq=20,
        verify="broadcast")) == {(0, 1)}


def test_cell_cap_falls_back_and_matches(ray_session, monkeypatch):
    """Shrinking DENSE_VERIFY_MAX_CELLS below the corpus forces the
    dict-loop path through dense='auto'; results must be identical."""
    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(30)])
    texts = [" ".join(rng.choice(vocab,
                                 size=int(rng.integers(4, 12))).tolist())
             for _ in range(120)]
    base = _sorted_df(cosine_simjoin_pairs(
        _mk(texts), tp=4, tq=5, verify="broadcast", dense="auto"))
    monkeypatch.setattr(D, "DENSE_VERIFY_MAX_CELLS", 8)
    capped = _sorted_df(cosine_simjoin_pairs(
        _mk(texts), tp=4, tq=5, verify="broadcast", dense="auto"))
    assert base.equals(capped)


def test_ratio_run_pairs_superset_of_exact(ray_session):
    """The slack-guarded float run cut must generate a SUPERSET of the
    exactly-qualifying pairs within every bucket (completeness of the
    generation; exactness comes from the downstream verify)."""
    rng = np.random.default_rng(3)
    n = 500
    t = rng.integers(0, 7, n).astype(np.int64)
    den = rng.integers(1, 1000, n).astype(np.int64)
    num = (den * rng.integers(850, 1001, n)) // 1000  # r in [0.85, 1]
    t2n, t2d = 361, 400
    order, ia, ib = D._ratio_run_pairs(t, num, den, t2n, t2d)
    t_s, num_s, den_s = t[order], num[order], den[order]
    got = set(zip(ia.tolist(), ib.tolist()))
    for s in range(n):
        for e in range(s + 1, n):
            if t_s[s] != t_s[e]:
                continue
            if t2d * int(num_s[s]) * int(num_s[e]) >= \
                    t2n * int(den_s[s]) * int(den_s[e]):
                assert (min(s, e), max(s, e)) in got, (s, e)
