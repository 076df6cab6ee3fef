"""DB-API 2.0 (PEP 249) wrapper over the network session layer.

The acceptance bar (VERDICT round 2, missing #2): a nowapi-style
program — the reference's `pynow/nowapi.py` surface — runs unmodified:
connect(host, port, user, pwd, db) → cursor() → execute with "format"
paramstyle → description / rowcount / fetchone / fetchmany / fetchall /
iteration / with-statements / row formats.
"""

from __future__ import annotations

import pytest

from nowdb_spark import dbapi
from nowdb_spark.engine import Engine
from nowdb_spark.server import NowServer


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    eng = Engine(spark, tmp_path_factory.mktemp("dbapi_wh"))
    eng.execute("create scope sales")
    srv = NowServer(eng)
    srv.serve_in_background()
    yield srv.address
    srv.shutdown()


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "format"
    assert issubclass(dbapi.DatabaseError, dbapi.Error)
    assert issubclass(dbapi.InterfaceError, dbapi.Error)
    for sub in (dbapi.DataError, dbapi.OperationalError,
                dbapi.IntegrityError, dbapi.InternalError,
                dbapi.ProgrammingError, dbapi.NotSupportedError):
        assert issubclass(sub, dbapi.DatabaseError)


def test_type_constructors():
    dt = dbapi.Timestamp(2019, 9, 27, 10, 30, 0)
    assert dbapi._dt_to_stamp(dt) == 1569580200 * 1_000_000_000
    assert dbapi._dt_to_stamp(dbapi.Date(1970, 1, 2)) == 86400 * 10**9
    for ctor in (lambda: dbapi.Time(1, 2, 3),
                 lambda: dbapi.DateFromTicks(0),
                 lambda: dbapi.TimeFromTicks(0),
                 lambda: dbapi.TimestampFromTicks(0),
                 lambda: dbapi.Binary(b"x")):
        with pytest.raises(dbapi.NotSupportedError):
            ctor()


def test_nowapi_style_program(server):
    """The shape of a reference nowapi client session, unmodified."""
    host, port = server
    with dbapi.connect(host, port, "user", "pwd", "sales") as con:
        cur = con.cursor()
        cur.execute("create type item (k uint pk, name text, price float)")
        cur.execute("insert into item values (%s, '%s', %s)", (1, "hat", 9.5))
        cur.execute("insert into item values (%s, '%s', %s)", (2, "cap", 5.0))
        cur.execute("insert into item values (%s, '%s', %s)", (3, "tie", 15.0))

        with con.execute("select k, name, price from item order by k") as c2:
            assert [d[0] for d in c2.description] == ["k", "name", "price"]
            rows = [r for r in c2]                       # dictrow default
        assert rows[0] == {"k": 1, "name": "hat", "price": 9.5}
        assert [r["name"] for r in rows] == ["hat", "cap", "tie"]

        cur.execute("select k, price from item where price > %s order by k",
                    (6,))
        one = cur.fetchone()
        assert one["k"] == 1 and cur.rowcount == 1
        rest = cur.fetchall()
        assert [r["k"] for r in rest] == [3] and cur.rowcount == 2
        assert cur.fetchone() is None
        cur.close()
        assert cur.description is None


def test_row_formats_and_fetchmany(server):
    host, port = server
    con = dbapi.connect(host, port, None, None, "sales")
    cur = con.execute("select k, name from item order by k",
                      rowformat=dbapi.tuplerow)
    assert cur.fetchone() == (1, "hat")
    assert cur.fetchmany(2) == [(2, "cap"), (3, "tie")]
    assert cur.fetchmany(2) is None                # nowapi: None on empty

    cur = con.execute("select k from item order by k",
                      rowformat=dbapi.listrow)
    assert cur.fetchall() == [[1], [2], [3]]
    with pytest.raises(dbapi.InterfaceError):
        cur.setRowFormat(99)
    con.close()
    with pytest.raises(dbapi.InterfaceError):
        con.cursor()


def test_executemany_and_params(server):
    host, port = server
    with dbapi.connect(host, port, db="sales") as con:
        cur = con.cursor()
        cur.executemany("insert into item values (%s, '%s', %s)",
                        [(10, "a", 1.0), (11, "b", None)])
        cur.execute("select count(*) as n from item where k >= 10")
        assert cur.fetchone()["n"] == 2
        cur.execute("select price from item where k = %s", (11,))
        assert cur.fetchone()["price"] is None
        with pytest.raises(dbapi.ProgrammingError):
            cur.execute("select %s, %s from item", (1,))


def test_errors_and_not_executed(server):
    host, port = server
    with dbapi.connect(host, port, db="sales") as con:
        cur = con.cursor()
        with pytest.raises(dbapi.InterfaceError):
            cur.fetchone()
        with pytest.raises(dbapi.DatabaseError):
            cur.execute("select * from no_such_table")
    with pytest.raises(dbapi.InternalError):
        dbapi.connect(host, port, db="no_such_db")


def test_report_rowcount_and_commit_noops(server):
    host, port = server
    with dbapi.connect(host, port, db="sales") as con:
        cur = con.cursor()
        cur.execute("insert into item values (20, 'x', 0.5)")
        assert cur.rowcount == 1                   # report → affected
        con.commit()
        con.rollback()
        cur.execute("delete from item where k = 20")
        cur.execute("select count(*) as n from item where k = 20")
        assert cur.fetchone()["n"] == 0
