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
