"""Network session layer — the Spark image of the reference's server
(ifc/nowdb.c: one session thread per connection, streaming statement
execution, server-side cursors driven by FETCH/CLOSE).

Protocol: newline-delimited JSON over TCP (the reference speaks a
binary wire format, types/types.h:107-117; JSON keeps the same result
kinds STATUS/REPORT/ROW/CURSOR observable and testable):

    → {"op": "execute", "sql": "..."}
    ← {"kind": "status", "ok": true, "code": 0, "details": "OK"}
    ← {"kind": "report", "ok": true, "affected": 10, "errors": 0}
    ← {"kind": "row", "ok": true, "columns": [...], "rows": [[...]]}
    ← {"kind": "cursor", "ok": true, "cursor": "3", "columns": [...]}
    → {"op": "fetch", "cursor": "3", "n": 100}
    ← {"kind": "row", "ok": true, "columns": [...], "rows": [[...]],
       "eof": false}
    → {"op": "close", "cursor": "3"}    → {"op": "bye"}

One Engine is shared across sessions (the SparkSession is one JVM);
cursor ids are engine-global like the reference's server-side cursor
registry. Statement execution is serialized with a lock — Spark job
submission itself is thread-safe, but catalog mutations are not.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading

from nowdb_spark.engine import Engine
from nowdb_spark.results import (
    CursorResult,
    ReportResult,
    Result,
    RowResult,
)


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


def _serialize(res: Result) -> dict:
    base = {"ok": res.ok(), "code": res.code(), "details": res.details()}
    if isinstance(res, CursorResult):
        return {"kind": "cursor", "cursor": getattr(res, "cursor_id", None),
                "columns": res.columns, **base}
    if isinstance(res, RowResult):
        return {"kind": "row", "columns": res.columns,
                "rows": [[_json_safe(v) for v in r] for r in res._rows],
                **base}
    if isinstance(res, ReportResult):
        return {"kind": "report", "affected": res.affected,
                "errors": res.errors, "runtime": res.runtime, **base}
    return {"kind": "status", **base}


class _Session(socketserver.StreamRequestHandler):
    def handle(self):  # one thread per session (reference parity)
        eng: Engine = self.server.engine
        lock: threading.Lock = self.server.exec_lock
        while True:
            line = self.rfile.readline()
            if not line:
                break
            try:
                req = json.loads(line)
            except json.JSONDecodeError:
                self._send({"kind": "status", "ok": False, "code": 1,
                            "details": "bad request"})
                continue
            op = req.get("op")
            if op == "bye":
                break
            if op == "execute":
                with lock:
                    res = eng.execute(req.get("sql", ""))
                self._send(_serialize(res))
            elif op == "fetch":
                with lock:
                    cur = eng._cursors.get(str(req.get("cursor")))
                    if cur is None:
                        self._send({"kind": "status", "ok": False,
                                    "code": 1, "details": "no such cursor"})
                        continue
                    n = int(req.get("n", 1000))
                    rows = cur.fetch(n)
                self._send({"kind": "row", "ok": True, "code": 0,
                            "details": "OK", "columns": cur.columns,
                            "rows": [[_json_safe(v) for v in r]
                                     for r in rows],
                            "eof": len(rows) < n})
            elif op == "close":
                with lock:
                    eng.execute(f"close {req.get('cursor')}")
                self._send({"kind": "status", "ok": True, "code": 0,
                            "details": "OK"})
            elif op == "auth":
                # pynow connects with (usr, pwd); the session layer
                # has no account store — acknowledge the handshake so
                # ported clients work unmodified (auth hook point)
                self._send({"kind": "status", "ok": True, "code": 0,
                            "details": "OK"})
            else:
                self._send({"kind": "status", "ok": False, "code": 1,
                            "details": f"unknown op {op!r}"})

    def _send(self, doc: dict) -> None:
        self.wfile.write((json.dumps(doc) + "\n").encode())
        self.wfile.flush()


class NowServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, engine: Engine, host: str = "127.0.0.1",
                 port: int = 0):
        super().__init__((host, port), _Session)
        self.engine = engine
        self.exec_lock = threading.Lock()

    @property
    def address(self) -> tuple[str, int]:
        return self.server_address

    def serve_in_background(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t
