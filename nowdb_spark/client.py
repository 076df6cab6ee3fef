"""Client for the network session layer — mirrors the reference's
Python client surface (pynow/now.py:178-628): `connect()`, then
`Connection.execute/rexecute/oneRow/oneValue`, iterable results with
`field(i)`, cursors fetched transparently.

    with connect(host, port) as con:
        con.execute("use retail")
        with con.execute("select prod_key from product") as cur:
            for row in cur:
                print(row.field(0))
"""

from __future__ import annotations

import json
import socket
from typing import Optional


class ClientError(RuntimeError):
    pass


class ClientResult:
    def __init__(self, con: "Connection", doc: dict):
        self._con = con
        self._doc = doc
        self._row: Optional[list] = None

    def ok(self) -> bool:
        return bool(self._doc.get("ok"))

    def code(self) -> int:
        return int(self._doc.get("code", 0))

    def details(self) -> str:
        return self._doc.get("details", "")

    @property
    def kind(self) -> str:
        return self._doc.get("kind", "status")

    @property
    def columns(self) -> list[str]:
        return self._doc.get("columns", [])

    @property
    def affected(self) -> int:
        return int(self._doc.get("affected", 0))

    @property
    def errors(self) -> int:
        return int(self._doc.get("errors", 0))

    def row(self):
        return self._row

    def field(self, i: int):
        return self._row[i]

    def __iter__(self):
        kind = self.kind
        if kind == "row":
            for r in self._doc.get("rows", []):
                self._row = r
                yield self
        elif kind == "cursor":
            cid = self._doc["cursor"]
            while True:
                doc = self._con._request(
                    {"op": "fetch", "cursor": cid, "n": 1000})
                if not doc.get("ok"):
                    break
                for r in doc.get("rows", []):
                    self._row = r
                    yield self
                if doc.get("eof", True):
                    break

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False

    def release(self) -> None:
        if self.kind == "cursor":
            try:
                self._con._request({"op": "close",
                                    "cursor": self._doc["cursor"]})
            except OSError:
                pass


class Connection:
    def __init__(self, host: str, port: int | str,
                 usr: str | None = None, pwd: str | None = None):
        """pynow-parity signature (pynow/now.py:178,193): addr and
        port (pynow passes port as a string — accepted here), then
        user/password. The session layer performs no authentication —
        usr/pwd are accepted for source compatibility and sent with
        the handshake so a future auth hook sees them."""
        self._sock = socket.create_connection((host, int(port)))
        self._rfile = self._sock.makefile("rb")
        if usr is not None or pwd is not None:
            self._request({"op": "auth", "usr": usr, "pwd": pwd})

    def _request(self, doc: dict) -> dict:
        self._sock.sendall((json.dumps(doc) + "\n").encode())
        line = self._rfile.readline()
        if not line:
            raise ClientError("connection closed")
        return json.loads(line)

    def execute(self, sql: str) -> ClientResult:
        return ClientResult(self, self._request({"op": "execute",
                                                 "sql": sql}))

    def rexecute(self, sql: str) -> ClientResult:
        r = self.execute(sql)
        if not r.ok():
            raise ClientError(r.details())
        return r

    def oneRow(self, sql: str):
        with self.rexecute(sql) as r:
            for row in r:
                return list(row.row())
        return None

    def oneValue(self, sql: str):
        row = self.oneRow(sql)
        return row[0] if row else None

    def close(self) -> None:
        try:
            self._sock.sendall(b'{"op": "bye"}\n')
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def connect(host: str, port: int | str,
            usr: str | None = None, pwd: str | None = None) -> Connection:
    """pynow-parity: connect(addr, port[, usr, pwd])."""
    return Connection(host, port, usr, pwd)
