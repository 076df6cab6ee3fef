"""Shell entry point: scripted -e mode over the embedded engine."""

from __future__ import annotations

from nowdb_spark.__main__ import _statements, main


def test_statement_splitting():
    stmts = list(_statements(
        "use db; insert into t values ('a;b'); select 1"))
    assert stmts == ["use db", "insert into t values ('a;b')",
                     "select 1"]


def test_cli_execute(spark, tmp_path, capsys):
    base = str(tmp_path / "wh")
    rc = main(["--base", base, "-e",
               "create scope clit; use clit; "
               "create type t (k uint pk, v float); "
               "insert into t values (1, 2.5), (2, 3.5); "
               "select k, v from t order by k"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "OK, 2 affected" in out
    assert "1\t2.5" in out and "2\t3.5" in out
    assert "-- 2 row(s)" in out
    # errors set the exit code and print to stderr
    rc = main(["--base", base, "-e", "use clit; select x from nope"])
    assert rc == 1


def test_cli_connect_mode(spark, tmp_path, capsys):
    from nowdb_spark.engine import Engine
    from nowdb_spark.server import NowServer
    eng = Engine(spark, tmp_path / "cli_srv")
    srv = NowServer(eng)
    srv.serve_in_background()
    try:
        host, port = srv.address
        rc = main(["--connect", f"{host}:{port}", "-e",
                   "create scope cnet; use cnet; "
                   "create type t (k uint pk, v float); "
                   "insert into t values (7, 1.25); "
                   "select k, v from t"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "7\t1.25" in out and "-- 1 row(s)" in out
    finally:
        srv.shutdown()
