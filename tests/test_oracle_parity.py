"""Driver-style DuckDB oracle parity: every queries() entry with an
oracle_sql() twin must match on row count, schema, and order-insensitive
values (the CORRECTNESS gate's comparison, run locally at sf0.001)."""

import math

import duckdb
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
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            assert all(
                (math.isnan(a) and math.isnan(b)) or a == b
                for a, b in zip(g.astype(float), e.astype(float))
            ), f"{name}.{col} float mismatch"
        else:
            assert g.astype(str).tolist() == e.astype(str).tolist(), (
                f"{name}.{col} mismatch")


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
