"""Result objects mirroring the reference Python client's semantics
(pynow/now.py:178-628): every execute() returns a Result with
ok()/code()/details(); row-bearing results iterate and expose
field(i); cursors fetch lazily.

Wire kinds (types/types.h:107-117): STATUS, REPORT, ROW, CURSOR.
Here a cursor wraps an unexecuted DataFrame — iteration drives
`toLocalIterator`, which streams partition batches to the driver (the
moral equivalent of FETCH paging on a server-side cursor id).
"""

from __future__ import annotations

from typing import Iterator, Optional

OK = 0

# numeric result kinds (reference types/types.h:109-112 NOWDB_STATUS
# 0x21 / REPORT 0x22 / ROW 0x23 / CURSOR 0x24; NOTHING 0 per
# lua/nowdb.lua:61)
NOTHING, STATUS, REPORT, ROW, CURSOR = 0, 0x21, 0x22, 0x23, 0x24
_KIND_CODES = {"status": STATUS, "report": REPORT,
               "row": ROW, "cursor": CURSOR}


class Result:
    kind = "status"

    def __init__(self, code: int = OK, details: str = "OK"):
        self._code = code
        self._details = details

    def resulttype(self) -> int:
        """Numeric result-kind code (lua r.resulttype() parity)."""
        return _KIND_CODES.get(self.kind, NOTHING)

    def errcode(self) -> int:
        return self._code

    def errdetails(self) -> str:
        return self._details

    def ok(self) -> bool:
        return self._code == OK

    def code(self) -> int:
        return self._code

    def details(self) -> str:
        return self._details

    # context-manager parity with pynow (with con.execute(...) as r:)
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False

    def release(self) -> None:
        pass


class StatusResult(Result):
    kind = "status"


class ErrorResult(Result):
    kind = "status"

    def __init__(self, code: int, details: str):
        super().__init__(code, details)


class ReportResult(Result):
    """LOAD reports: affected / errors / runtime (pynow report kind)."""
    kind = "report"

    def __init__(self, affected: int, errors: int = 0,
                 runtime_us: int = 0):
        super().__init__()
        self.affected = affected
        self.errors = errors
        self.runtime = runtime_us


class RowResult(Result):
    """A fully materialized row set (SHOW/DESC/select-only)."""
    kind = "row"

    def __init__(self, columns: list[str], rows: list[tuple]):
        super().__init__()
        self.columns = columns
        self._rows = rows
        self._cur = 0

    def __iter__(self) -> Iterator["RowResult"]:
        for i in range(len(self._rows)):
            self._cur = i
            yield self

    def row(self) -> Optional[tuple]:
        return self._rows[self._cur] if self._rows else None

    def field(self, i: int):
        return self._rows[self._cur][i]

    def count(self) -> int:
        return len(self._rows)


class CursorResult(Result):
    """Lazy cursor over a DataFrame (DQL results).

    Iterating yields the cursor itself positioned on each row —
    exactly how pynow's Result iterates — while the underlying
    execution streams via toLocalIterator (no full collect on the
    driver for big results).
    """
    kind = "cursor"

    def __init__(self, df):
        super().__init__()
        self.df = df
        self.columns = df.columns
        self._row = None
        self._it = None

    def __iter__(self):
        self._it = self.df.toLocalIterator()
        for row in self._it:
            self._row = row
            yield self

    def row(self):
        return self._row

    def field(self, i: int):
        return self._row[i]

    def fetch(self, n: int = 1000) -> list[tuple]:
        """Fetch the next n rows as tuples (FETCH statement parity)."""
        if self._it is None:
            self._it = self.df.toLocalIterator()
        out = []
        for row in self._it:
            out.append(tuple(row))
            if len(out) >= n:
                break
        return out

    def to_pandas(self):
        return self.df.toPandas()

    def release(self) -> None:
        self._it = None
