"""PEP 249 (Python DB-API 2.0) interface over the network client.

Reference parity: `pynow/nowapi.py:1-643` ships a DB-API wrapper around
the nowdb C client — module globals (`apilevel`, `threadsafety`,
`paramstyle`), the full exception ladder, `connect(host, port, user,
pwd, db)`, `Connection.cursor()/execute()`, and cursors with
`execute/fetchone/fetchmany/fetchall/description/rowcount`, row formats
(dict / tuple / list), iteration and `with`-statement support. This
module keeps that exact surface so a nowapi program runs unmodified,
but the implementation is new: `description` comes from the session
protocol's `columns` field (the reference re-parses the SELECT text
because its wire format carries no column names), and rows arrive as
JSON batches through `client.Connection` rather than a ctypes cursor.

Same paramstyle ("format"): `cur.execute("select * from t where k = %s",
(42,))` — None renders as NULL, datetimes as nowdb ns stamps, everything
else via str(). Like the reference, string parameters are NOT quoted;
callers quote in the statement text ('%s') exactly as nowapi expects.
"""

from __future__ import annotations

import calendar
from datetime import datetime, timezone
from typing import Iterable, Optional, Sequence

from nowdb_spark import client as _client

apilevel = "2.0"
threadsafety = 1          # threads may share the module, not connections
paramstyle = "format"

# row formats (nowapi extension to the DB API)
dictrow = 1
tuplerow = 2
listrow = 3


# ------------------------------------------------------------------
# PEP 249 exception ladder
class Warning(Exception):            # noqa: A001 - name mandated by PEP 249
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# ------------------------------------------------------------------
# type constructors (nowdb models time as int64 stamps; Date/Timestamp
# build tz-aware datetimes that parameter substitution renders as
# stamps — same contract as nowapi's Date/Timestamp)
def Date(year: int, month: int, day: int) -> datetime:
    return datetime(year, month, day, tzinfo=timezone.utc)


def Timestamp(year: int, month: int, day: int,
              hour: int, minute: int, second: int) -> datetime:
    return datetime(year, month, day, hour, minute, second,
                    tzinfo=timezone.utc)


def Time(hour, minute, second):
    raise NotSupportedError("Time is not supported; use Timestamp")


def DateFromTicks(ticks):
    raise NotSupportedError("fromTicks is not supported")


def TimeFromTicks(ticks):
    raise NotSupportedError("fromTicks is not supported")


def TimestampFromTicks(ticks):
    raise NotSupportedError("fromTicks is not supported")


def Binary(value):
    raise NotSupportedError("Binary is not supported")


def _dt_to_stamp(dt: datetime) -> int:
    """tz-aware datetime → nowdb ns stamp (UTC)."""
    return (calendar.timegm(dt.utctimetuple()) * 1_000_000_000
            + dt.microsecond * 1_000)


def _render_params(stmt: str, parameters: Optional[Sequence]) -> str:
    if parameters is None:
        return stmt
    rendered = []
    for p in parameters:
        if p is None:
            rendered.append("NULL")
        elif isinstance(p, datetime):
            rendered.append(str(_dt_to_stamp(p)))
        else:
            rendered.append(str(p))
    try:
        return stmt % tuple(rendered)
    except (TypeError, ValueError) as exc:
        raise ProgrammingError(f"parameter substitution failed: {exc}")


# ------------------------------------------------------------------
class Cursor:
    """Statement execution + row fetch. Row batches stream from the
    server (the session layer fetches 1000 at a time); fetchone only
    touches the wire when the local batch drains — same promise
    nowapi's docstring makes for the C client."""

    def __init__(self, connection: "Connection"):
        self._con = connection
        self._result: Optional[_client.ClientResult] = None
        self._rows: Optional[Iterable] = None
        self.arraysize = 1
        self.description = None
        self.rowcount = -1
        self.rowformat = dictrow

    # -- nowapi extension ------------------------------------------
    def setRowFormat(self, rowformat: int) -> None:
        if rowformat not in (dictrow, tuplerow, listrow):
            raise InterfaceError(f"unknown row format: {rowformat}")
        self.rowformat = rowformat

    # -- PEP 249 ----------------------------------------------------
    def execute(self, operation: str,
                parameters: Optional[Sequence] = None) -> "Cursor":
        if self._con is None or self._con._c is None:
            raise InterfaceError("no connection")
        self.close()
        stmt = _render_params(operation, parameters)
        try:
            res = self._con._c.execute(stmt)
        except _client.ClientError as exc:
            raise OperationalError(str(exc))
        if not res.ok():
            details = res.details()
            res.release()
            raise DatabaseError(details)
        self._result = res
        if res.kind in ("row", "cursor"):
            self.description = [(name, None, None, None, None, None, None)
                                for name in res.columns]
            self._rows = iter(res)
            self.rowcount = 0
        else:
            self.description = None
            self._rows = None
            self.rowcount = res.affected if res.kind == "report" else -1
        return self

    def executemany(self, operation: str, seq_of_parameters) -> None:
        for parameters in seq_of_parameters:
            self.execute(operation, parameters)

    def callproc(self, procname: str, parameters: Sequence = ()) -> None:
        args = ", ".join(_render_params("%s", (p,)) for p in parameters)
        self.execute(f"execute {procname}({args})")

    def _format_row(self, values: list):
        if self.rowformat == dictrow:
            return {self.description[i][0]: v for i, v in enumerate(values)}
        if self.rowformat == tuplerow:
            return tuple(values)
        return list(values)

    def fetchone(self):
        if self._result is None:
            raise InterfaceError("not executed")
        if self._rows is None:
            return None
        try:
            res = next(self._rows)
        except StopIteration:
            return None
        except _client.ClientError as exc:
            raise OperationalError(str(exc))
        self.rowcount += 1
        return self._format_row(list(res.row()))

    def fetchmany(self, size: Optional[int] = None):
        n = self.arraysize if size is None else size
        out = []
        for _ in range(n):
            row = self.fetchone()
            if row is None:
                break
            out.append(row)
        return out or None          # nowapi returns None on empty

    def fetchall(self):
        out = []
        while True:
            row = self.fetchone()
            if row is None:
                break
            out.append(row)
        return out or None          # nowapi returns None on empty

    def setinputsizes(self, sizes) -> None:
        pass

    def setoutputsize(self, size, column=None) -> None:
        pass

    def close(self) -> None:
        if self._result is not None:
            self._result.release()
            self._result = None
        self._rows = None
        self.description = None
        self.rowcount = -1

    # -- iteration / context management -----------------------------
    def __iter__(self):
        return self

    def __next__(self):
        row = self.fetchone()
        if row is None:
            self.close()
            raise StopIteration
        return row

    next = __next__

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Connection:
    """DB-API connection; also a resource manager and thread-shareable
    at the module level. commit/rollback are no-ops (the engine
    auto-commits, like the reference server)."""

    def __init__(self, c: _client.Connection):
        self._c: Optional[_client.Connection] = c

    def close(self) -> None:
        if self._c is not None:
            self._c.close()
            self._c = None

    def commit(self) -> None:
        pass

    def rollback(self) -> None:
        pass

    def cursor(self) -> Cursor:
        if self._c is None:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def execute(self, stmt: str, parameters: Optional[Sequence] = None,
                rowformat: int = dictrow) -> Cursor:
        """nowapi convenience: create a cursor, execute, return it —
        enables `for row in con.execute('select ...'):`."""
        cur = self.cursor()
        cur.setRowFormat(rowformat)
        cur.execute(stmt, parameters)
        return cur

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def connect(host: str, port, user: str | None = None,
            password: str | None = None, db: str | None = None) -> Connection:
    """nowapi-parity constructor: host, port, user, password, then an
    optional database that is `use`d immediately (may be None and
    selected later with the SQL `use` command)."""
    try:
        c = _client.connect(host, port, user, password)
    except OSError as exc:
        raise InterfaceError(str(exc))
    if db is not None:
        try:
            res = c.execute(f"use {db}")
        except _client.ClientError as exc:
            c.close()
            raise DatabaseError(str(exc))
        if not res.ok():
            c.close()
            raise InternalError(f"cannot use {db}")
    return Connection(c)
