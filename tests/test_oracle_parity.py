"""Driver-style DuckDB oracle parity: every queries() entry with an
oracle_sql() twin must match on row count, schema, and order-insensitive
values (the CORRECTNESS gate's comparison, run locally at sf0.001).

The value comparison is deliberately TYPE-SENSITIVE (round-3 verdict
item 2): the driver's value hash distinguishes DuckDB DECIMAL / INT32
from the engine's int64 even when the numbers are equal, while a naive
pandas compare coerces them (Decimal(5) == 5). We therefore compare
per-column pandas dtypes exactly AND per-cell typed reprs, so any
un-cast oracle aggregate (sum() -> DECIMAL/HUGEINT, CASE -> INT32)
fails locally before it can fail at the driver."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


def _typed_repr(v):
    """Canonical per-cell repr that preserves type identity.

    numpy scalars fold to their Python equivalents only within the same
    width-class family handled by the dtype check; containers are
    normalized (ndarray -> list) so nesting differences don't alias, but
    decimal.Decimal keeps its own repr and so can never collide with an
    int — the exact divergence the driver's hash detects."""
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_typed_repr(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_typed_repr(x) for x in v) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return repr(v)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(ray_session, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF_DIR)))
    exp = _canon(_duck(sql))
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for col in got.columns:
        g, e = got[col], exp[col]
        assert str(g.dtype) == str(e.dtype), (
            f"{name}.{col} dtype {g.dtype} != oracle {e.dtype} "
            f"(driver hash is type-sensitive; CAST the oracle or engine)")
        if g.dtype.kind == "f":
            assert all(
                (math.isnan(a) and math.isnan(b)) or a == b
                for a, b in zip(g.astype(float), e.astype(float))
            ), f"{name}.{col} float mismatch"
        else:
            gl = [_typed_repr(v) for v in g.tolist()]
            el = [_typed_repr(v) for v in e.tolist()]
            assert gl == el, f"{name}.{col} mismatch"


def test_rows_only_queries_run(ray_session):
    """Queries without an oracle must still run and produce stable row
    counts twice in a row (determinism)."""
    qs = entry_mod.queries()
    no_oracle = sorted(set(qs) - set(entry_mod.oracle_sql())
                       - {"pages_extract", "pages_final"})  # tested in e2e
    for name in no_oracle:
        a = _to_pandas(qs[name](SF_DIR))
        b = _to_pandas(qs[name](SF_DIR))
        assert len(a) == len(b), name
        assert _canon(a).equals(_canon(b)), f"{name} nondeterministic"
