"""SQLite walker (ops/sqlitewalk.py): differential against the stdlib
engine (the authoritative writer) across b-tree depth, serial types,
overflow chains and the rowid-alias quirk; hostile input."""

import random
import sqlite3

import pytest

from webxtract.ops.sqlitewalk import (
    SqliteDB, fixture_sqlite, read_sqlite_table,
)


def _db(setup) -> bytes:
    con = sqlite3.connect(":memory:")
    setup(con)
    con.commit()
    return bytes(con.serialize())


def test_rowid_alias_null_substitution():
    data = fixture_sqlite(2)
    rows = read_sqlite_table(data, "t")
    # the aliased column stores NULL in the record; rowid substitutes
    assert rows[0][0] == 1 and rows[0][1][0] is None


def test_serial_type_matrix_differential():
    def setup(con):
        con.execute("CREATE TABLE s (x)")
        for v in (0, 1, None, -1, 127, -128, 32767, -32768, 2**24,
                  -2**24, 2**31, -2**31, 2**55, -2**62, 3.25, -0.5,
                  "text", "", b"\x00\xff", b"", True, False):
            con.execute("INSERT INTO s VALUES (?)", (v,))

    data = _db(setup)
    con = sqlite3.connect(":memory:")
    con.deserialize(data)
    ref = [r[0] for r in con.execute("SELECT x FROM s ORDER BY rowid")]
    mine = [rec[0] for _, rec in read_sqlite_table(data, "s")]
    assert mine == ref


def test_interior_pages_and_overflow_differential():
    rng = random.Random(11)

    def setup(con):
        con.execute("CREATE TABLE big (a INTEGER, b TEXT)")
        con.executemany(
            "INSERT INTO big VALUES (?, ?)",
            [(rng.randint(-2**40, 2**40), f"row{k}" * (k % 7))
             for k in range(6000)])
        con.execute("INSERT INTO big VALUES (7, ?)", ("Z" * 25000,))

    data = _db(setup)
    con = sqlite3.connect(":memory:")
    con.deserialize(data)
    ref = list(con.execute("SELECT rowid, a, b FROM big ORDER BY rowid"))
    mine = read_sqlite_table(data, "big")
    assert len(mine) == len(ref) == 6001
    for (rowid, rec), rrow in zip(mine, ref):
        assert (rowid, rec[0], rec[1]) == rrow


def test_multiple_tables_bootstrap():
    def setup(con):
        con.execute("CREATE TABLE a (x)")
        con.execute("CREATE TABLE b (y)")
        con.execute("INSERT INTO a VALUES (1)")
        con.execute("INSERT INTO b VALUES ('two')")

    data = _db(setup)
    db = SqliteDB(data)
    assert set(db.tables()) >= {"a", "b"}
    assert read_sqlite_table(data, "a")[0][1] == [1]
    assert read_sqlite_table(data, "b")[0][1] == ["two"]


def test_missing_table_and_garbage():
    with pytest.raises(ValueError, match="not a SQLite"):
        read_sqlite_table(b"garbage", "t")
    with pytest.raises(ValueError, match="no table"):
        read_sqlite_table(fixture_sqlite(1), "absent")


def test_fixture_closed_form():
    for i in (0, 1, 2, 3, 4, 7):
        rows = read_sqlite_table(fixture_sqlite(i), "t")
        exp = [(r + 1, [None, f"n{(7 * i + 3 * r) % 100}",
                        (13 * i + 11 * r) % 10000])
               for r in range(3 + i % 5)]
        assert rows == exp, i


def test_truncation_bitflips_never_hang():
    data = fixture_sqlite(4)
    for cut in range(0, len(data), max(1, len(data) // 21)):
        try:
            read_sqlite_table(data[:cut], "t")
        except Exception:  # noqa: BLE001 — degradation is data
            pass
    for k in range(0, len(data), max(1, len(data) // 33)):
        mut = bytearray(data)
        mut[k] ^= 0xFF
        try:
            read_sqlite_table(bytes(mut), "t")
        except Exception:  # noqa: BLE001
            pass
