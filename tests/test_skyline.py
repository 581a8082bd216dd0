"""Skyline (Pareto frontier) semantics: the registered window-staircase
oracle must equal the declarative NOT-EXISTS dominance spec, the
distributed result must match both, and the per-block local-frontier
reduction must be invariant to partitioning."""

import duckdb
import numpy as np
import pyarrow as pa

from webxtract.ops.relational import _skyline_fold, lineitem_skyline

SF = "/root/testdata/sf0.001"

NOT_EXISTS = """
SELECT a.l_orderkey, a.l_linenumber, a.l_extendedprice, a.l_discount
FROM lineitem a WHERE NOT EXISTS (
    SELECT 1 FROM lineitem b
    WHERE b.l_extendedprice <= a.l_extendedprice
      AND b.l_discount >= a.l_discount
      AND (b.l_extendedprice < a.l_extendedprice
           OR b.l_discount > a.l_discount))
"""


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    return con.execute(sql).fetchdf().sort_values(
        ["l_orderkey", "l_linenumber"], ignore_index=True)


def test_window_oracle_equals_not_exists_spec():
    import __ray_entry__ as entry_mod

    win = _duck(entry_mod.oracle_sql()["lineitem_skyline"])
    ne = _duck(NOT_EXISTS)
    assert win.equals(ne)


def test_distributed_skyline_matches_spec(ray_session):
    got = lineitem_skyline(SF).to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"], ignore_index=True)
    assert got.equals(_duck(NOT_EXISTS))


def test_local_fold_partitioning_invariant():
    """skyline(S) == skyline(union of per-chunk skylines) for any
    chunking — the property the distributed plan rests on — checked on
    adversarial data with duplicate points and full-column ties."""
    rng = np.random.default_rng(7)
    n = 4000
    price = rng.integers(0, 40, n).astype(float)   # heavy ties
    disc = rng.integers(0, 12, n).astype(float)
    t = pa.table({"l_orderkey": pa.array(np.arange(n), pa.int64()),
                  "l_linenumber": pa.array(np.ones(n, np.int32)),
                  "l_extendedprice": pa.array(price),
                  "l_discount": pa.array(disc)})
    whole = _skyline_fold(t).to_pandas().sort_values(
        "l_orderkey", ignore_index=True)
    for k in (1, 3, 7):
        parts = [t.slice(i * n // k, n // k + (n % k if i == k - 1 else 0))
                 for i in range(k)]
        merged = _skyline_fold(
            pa.concat_tables([_skyline_fold(p) for p in parts]))
        got = merged.to_pandas().sort_values(
            "l_orderkey", ignore_index=True)
        assert got.equals(whole), f"k={k}"
    # duplicates of a frontier point must all survive (weak dominance)
    best = whole.loc[
        whole.l_discount.idxmax()]
    dupes = whole[(whole.l_extendedprice == best.l_extendedprice)
                  & (whole.l_discount == best.l_discount)]
    src = t.to_pandas()
    n_src = len(src[(src.l_extendedprice == best.l_extendedprice)
                    & (src.l_discount == best.l_discount)])
    assert len(dupes) == n_src and n_src >= 2
