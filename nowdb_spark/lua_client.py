"""Lua client surface — the reference's `now.lua` API running through
the bundled luamini interpreter against this engine's wire protocol.

Reference: `lua/now.lua` — `now.connect(srv, port, usr, pwd)` returns
`(rc, con)`; the connection interface carries `close / use / execute /
execute_ / pexecute / rows / getnow`; cursors iterate with
`for row in con.rows(stmt) do ... row.field(0) ... end`
(now.lua:280-470). Smoke coverage model: `test/luasmoke/basicsmoke.lua`.

`make_now_api()` builds the `now` table backed by
`nowdb_spark.client.Connection` (the pynow-parity socket client);
`run_lua_client(src, ...)` runs a client script in a fresh
interpreter with `now` pre-installed, mirroring
`now = require('now')`.

Result objects flow into Lua as host objects: `r.field(0)`,
`r.ok()`, iteration via luamini's Python-iterable generic-for.
"""

from __future__ import annotations

from nowdb_spark import results as R
from nowdb_spark.client import ClientError, Connection


class _LuaConnection:
    """The `con` interface table (now.lua:440-470), as a host object —
    luamini resolves `con.execute(...)` / `con.rows(...)` through
    plain attribute access."""

    def __init__(self, con: Connection):
        self._con = con

    def close(self):
        self._con.close()

    def use(self, db: str):
        self._con.rexecute(f"use {db}")

    def execute(self, stmt: str):
        """Raising variant (now.lua execute: calls error on NOK)."""
        return self._con.rexecute(stmt)

    def execute_(self, stmt: str):
        self._con.rexecute(stmt).release()

    def pexecute(self, stmt: str):
        """Protected variant: returns (rc, result-or-details)."""
        try:
            r = self._con.execute(stmt)
        except ClientError as e:
            return (-1, str(e))
        if not r.ok():
            return (r.code(), r.details())
        return (R.OK, r)

    def rows(self, stmt: str):
        """`for row in con.rows(stmt) do` — a cursor's Python iterator
        yields the result per row; field(i) reads the current row."""
        return iter(self._con.rexecute(stmt))

    def getnow(self):
        row = self._con.oneRow("select now()")
        return row[0] if row else None


def make_now_api() -> dict:
    """The `now` module table (constants + connect), luamini-ready."""

    def connect(srv, port, usr=None, pwd=None):
        try:
            con = Connection(srv, int(port), usr, pwd)
        except (OSError, ClientError, ValueError) as e:
            return (-1, str(e))
        return (R.OK, _LuaConnection(con))

    def raise_(rc, msg=None):
        raise ClientError(f"now error {rc}: {msg or ''}")

    return {
        "connect": connect,
        "OK": R.OK,
        "EOF": 8,                      # nowdb_err_eof
        "NOTHING": R.NOTHING, "STATUS": R.STATUS, "REPORT": R.REPORT,
        "ROW": R.ROW, "CURSOR": R.CURSOR,
        "raise": raise_,
        # ns time constants (lua/nowdb.lua:84-88)
        "second": 1_000_000_000,
        "minute": 60_000_000_000,
        "hour": 3_600_000_000_000,
        "day": 86_400_000_000_000,
        "year": 365 * 86_400_000_000_000,
    }


def run_lua_client(src: str, extra_globals: dict | None = None):
    """Run a Lua client script (the `now = require('now')` programs of
    the reference's smoke suite) through luamini with the `now` API
    installed. Returns (return_values, interpreter) — the interpreter
    exposes captured print() output."""
    from nowdb_spark.luamini import Interpreter

    g = {"now": make_now_api()}
    if extra_globals:
        g.update(extra_globals)
    it = Interpreter(globals_extra=g)
    return it.run(src), it
