"""libnowdbclient ABI, reimplemented over the binary wire protocol.

The reference's Python client (`pynow/now.py`) is a thin ctypes layer
over `libnowdbclient.so` (ABI in `include/nowdb/nowclient.h`). This
module provides that library surface in pure Python — a socket client
speaking the byte protocol in `nowdb_spark.wire` — with real ctypes
memory semantics where the ABI demands them (`nowdb_row_field` returns
an address into a NUL-terminated row buffer that the caller `cast`s to
`POINTER(c_longlong)` / `c_char_p`, exactly like the C library).

Usage (tests/test_reference_client.py): intercept
`ctypes.cdll.LoadLibrary("libnowdbclient.so")` to return
`FakeNowClientLib()` BEFORE importing the reference's now.py — the
reference file itself runs unmodified, its `.restype`/`.argtypes`
assignments land on permissive shims, and every call crosses a real
TCP socket in the reference's framing.

ABI notes mirrored from the .h and observed client behavior:
  * status is 0 for OK, -1 otherwise; errcode 8 == EOF
    (include/nowdb/errcode.h:17)
  * row payload walk: TEXT is NUL-terminated, BOOL/NOTHING take one
    value byte, everything else eight; 0x0a ends a row
  * nowdb_cursor_fetch reuses the SAME result object — the server's
    next frame (CURSOR or EOF-status) overwrites it
  * nowdb_cursor_close sends "close <id>;" and frees the result
  * client errors are negative; server errors positive
"""

from __future__ import annotations

import ctypes
import socket
import threading

from nowdb_spark import wire

OK = 0
ERR_NOMEM, ERR_NOCON, ERR_INVALID = -1, -2, -6
ERR_NOREAD, ERR_PROTO, ERR_CURCL = -101, -106, -111
ERR_EOF = wire.ERR_EOF  # 8: a SERVER code, positive

_CLIENT_ERRS = {
    ERR_NOMEM: b"client out of memory",
    ERR_NOCON: b"cannot connect",
    ERR_INVALID: b"invalid input",
    ERR_NOREAD: b"cannot read from socket",
    ERR_PROTO: b"protocol error",
    ERR_CURCL: b"cannot close cursor",
}


class _Con:
    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.lock = threading.Lock()  # connections may be shared


class _Res:
    """Mirror of struct nowdb_result_t: one object is status, report,
    row set and cursor at once, re-filled by fetch."""

    __slots__ = ("con", "rtype", "status", "err", "curid",
                 "affected", "errors", "runtime",
                 "raw", "cbuf", "sz", "off")

    def __init__(self, con: _Con):
        self.con = con
        self.rtype = 0
        self.status = -1
        self.err = 0
        self.curid = 0
        self.affected = self.errors = self.runtime = 0
        self.raw = b""          # python-side view of the row bytes
        self.cbuf = None        # ctypes buffer backing field pointers
        self.sz = 0
        self.off = 0

    def load(self, f: wire.Frame) -> None:
        self.rtype = f.rtype
        self.status = 0 if f.ok else -1
        self.err = f.err
        if f.rtype == wire.CURSOR:
            self.curid = f.curid
        self.affected, self.errors = f.affected, f.errors
        self.runtime = f.runtime
        self.raw = f.payload
        self.sz = len(f.payload)
        # NUL-terminated like the C client's buf[sz]=0 — TEXT casts
        # at the end of the buffer must find a terminator
        self.cbuf = ctypes.create_string_buffer(f.payload + b"\x00")


def _handle(x) -> int:
    """Unwrap a c_void_p / int / CArgObject to the handle int."""
    if isinstance(x, int):
        return x
    obj = getattr(x, "_obj", x)
    return int(getattr(obj, "value", 0) or 0)


def _cstr(x) -> bytes | None:
    if x is None:
        return None
    if isinstance(x, bytes):
        return x
    obj = getattr(x, "_obj", x)
    v = getattr(obj, "value", obj)
    if v is None:
        return None
    return v if isinstance(v, bytes) else str(v).encode()


def _cint(x) -> int:
    if isinstance(x, int):
        return x
    return int(getattr(x, "value", 0) or 0)


class _Shim:
    """A callable standing in for one exported C function; accepts
    the .restype/.argtypes assignments the ctypes caller makes."""

    def __init__(self, fn):
        self._fn = fn
        self.restype = None
        self.argtypes = None

    def __call__(self, *args):
        return self._fn(*args)


class FakeNowClientLib:
    """The object returned for LoadLibrary("libnowdbclient.so")."""

    def __init__(self):
        self._handles: dict[int, object] = {}
        self._next = 1
        self._hlock = threading.Lock()
        self._shims: dict[str, _Shim] = {}

    # --- handle table ---------------------------------------------
    def _put(self, obj) -> int:
        with self._hlock:
            h = self._next
            self._next += 1
            self._handles[h] = obj
        return h

    def _get(self, x):
        return self._handles.get(_handle(x))

    def _drop(self, x) -> None:
        self._handles.pop(_handle(x), None)

    # --- attribute protocol ---------------------------------------
    def __getattr__(self, name: str) -> _Shim:
        if name.startswith("_"):
            raise AttributeError(name)
        impl = getattr(self, "_impl_" + name, None)
        if impl is None:
            raise AttributeError(f"undefined symbol: {name}")
        shim = self._shims.get(name)
        if shim is None:
            shim = _Shim(impl)
            self._shims[name] = shim
        return shim

    # --- library lifecycle ----------------------------------------
    def _impl_nowdb_client_init(self):
        return 1

    def _impl_nowdb_client_close(self):
        return None

    def _impl_nowdb_err_explain(self, err):
        e = _cint(err)
        if e == 0:
            return b"OK"
        if e in _CLIENT_ERRS:
            return _CLIENT_ERRS[e]
        return b"server error %d" % e

    # --- connection -----------------------------------------------
    def _impl_nowdb_connect(self, conref, node, serv, usr, pwd, flags):
        addr = _cstr(node)
        port = _cstr(serv)
        if addr is None or port is None:
            return ERR_INVALID
        try:
            s = socket.create_connection(
                (addr.decode(), int(port.decode())), timeout=60)
        except OSError:
            return ERR_NOCON
        # session options: binary, no-ack channel (the default the C
        # client sends; its LE build ships the bytes "SQLBE0  ")
        try:
            s.sendall(b"SQLBE0  ")
        except OSError:
            s.close()
            return -102
        h = self._put(_Con(s))
        conref._obj.value = h
        return OK

    def _impl_nowdb_connection_close(self, con):
        c = self._get(con)
        if c is None:
            return ERR_INVALID
        try:
            c.sock.close()
        except OSError:
            pass
        self._drop(con)
        return OK

    def _impl_nowdb_connection_destroy(self, con):
        self._drop(con)

    # --- execute ---------------------------------------------------
    def _roundtrip(self, c: _Con, sql: str) -> wire.Frame:
        with c.lock:
            wire.send_stmt(c.sock, sql)
            return wire.read_frame(c.sock)

    def _impl_nowdb_exec_statement(self, con, stmt, resref):
        c = self._get(con)
        sql = _cstr(stmt)
        if c is None or sql is None:
            return ERR_INVALID
        res = _Res(c)
        try:
            res.load(self._roundtrip(c, sql.decode("utf-8")))
        except (OSError, ConnectionError):
            return ERR_NOREAD
        resref._obj.value = self._put(res)
        return OK

    _impl_nowdb_exec_statementZC = _impl_nowdb_exec_statement

    def _impl_nowdb_result_destroy(self, res):
        self._drop(res)

    # --- result accessors -----------------------------------------
    def _impl_nowdb_result_type(self, res):
        r = self._get(res)
        return r.rtype if r is not None else 0

    def _impl_nowdb_result_status(self, res):
        r = self._get(res)
        return r.status if r is not None else -1

    def _impl_nowdb_result_errcode(self, res):
        r = self._get(res)
        return r.err if r is not None else ERR_INVALID

    def _impl_nowdb_result_details(self, res):
        r = self._get(res)
        if r is None:
            return b"no result"
        if r.status == 0:
            return b"OK"
        if r.err == ERR_EOF:
            return b""
        end = r.raw.find(b"\x00")
        return r.raw[:end] if end >= 0 else r.raw

    def _impl_nowdb_result_eof(self, res):
        r = self._get(res)
        return int(r is not None and r.status != 0 and r.err == ERR_EOF)

    def _impl_nowdb_result_report(self, res, aff, errs, rt):
        r = self._get(res)
        if r is None or r.rtype != wire.REPORT:
            return
        for ref, v in ((aff, r.affected), (errs, r.errors),
                       (rt, r.runtime)):
            if ref is not None:
                ref._obj.value = v

    # --- row walking ----------------------------------------------
    @staticmethod
    def _skip_field(raw: bytes, i: int) -> int:
        t = raw[i]
        if t == wire.T_TEXT:
            return raw.index(b"\x00", i + 1) + 1
        if t in (wire.T_BOOL, wire.T_NOTHING):
            return i + 2
        return i + 9

    def _impl_nowdb_row_field(self, row, field, typeref):
        r = self._get(row)
        fld = _cint(field)
        if r is None:
            return None
        i, f = r.off, 0
        while i < r.sz and r.raw[i] != wire.EOR:
            if f == fld:
                t = r.raw[i]
                typeref._obj.value = t
                return ctypes.addressof(r.cbuf) + i + 1
            i = self._skip_field(r.raw, i)
            f += 1
        return None

    def _impl_nowdb_row_count(self, row):
        r = self._get(row)
        if r is None:
            return 0
        i, f = r.off, 0
        while i < r.sz and r.raw[i] != wire.EOR:
            i = self._skip_field(r.raw, i)
            f += 1
        return f

    @classmethod
    def _find_eor(cls, raw: bytes, sz: int, start: int) -> int:
        """Type-aware end-of-row scan (the C client's rowutl
        findEOR): 0x0a is only a terminator at a field BOUNDARY —
        the same byte occurs freely inside int64/double values.
        Returns the index just past the row's EOR, or -1."""
        i = start
        while i < sz:
            if raw[i] == wire.EOR:
                return i + 1
            i = cls._skip_field(raw, i)
        return -1

    def _impl_nowdb_row_next(self, row):
        r = self._get(row)
        if r is None:
            return ERR_INVALID
        nxt = self._find_eor(r.raw, r.sz, r.off)
        if nxt < 0:
            return ERR_EOF
        # only move if a complete next row follows (C checks for a
        # second EOR before committing)
        if self._find_eor(r.raw, r.sz, nxt) < 0:
            return ERR_EOF
        r.off = nxt
        return OK

    def _impl_nowdb_row_rewind(self, row):
        r = self._get(row)
        if r is not None:
            r.off = 0

    def _impl_nowdb_row_copy(self, row):
        r = self._get(row)
        if r is None:
            return None
        cp = _Res(r.con)
        cp.rtype = wire.ROW
        cp.status, cp.err, cp.curid = r.status, r.err, r.curid
        cp.off, cp.sz = r.off, r.sz
        cp.raw, cp.cbuf = r.raw, r.cbuf  # shared buffer, like the C copy
        return self._put(cp)

    def _impl_nowdb_row_write(self, stream, row):  # CLI helper; unused
        return ERR_INVALID

    # --- cursor ----------------------------------------------------
    def _impl_nowdb_cursor_id(self, res):
        r = self._get(res)
        return r.curid if r is not None else 0xFFFFFFFFFFFFFFFF

    def _impl_nowdb_cursor_row(self, res):
        r = self._get(res)
        if r is None:
            return None
        r.off = 0
        return _handle(res)

    def _impl_nowdb_cursor_fetch(self, res):
        r = self._get(res)
        if r is None:
            return ERR_INVALID
        try:
            r.load(self._roundtrip(r.con, f"fetch {r.curid};"))
        except (OSError, ConnectionError):
            return ERR_NOREAD
        return OK

    def _impl_nowdb_cursor_close(self, res):
        r = self._get(res)
        if r is None:
            return ERR_INVALID
        try:
            f = self._roundtrip(r.con, f"close {r.curid};")
        except (OSError, ConnectionError):
            return ERR_NOREAD
        if not f.ok:
            return ERR_CURCL
        self._drop(res)
        return OK

    def _impl_nowdb_cursor_eof(self, res):
        return self._impl_nowdb_result_eof(res)

    def _impl_nowdb_cursor_ok(self, res):
        r = self._get(res)
        return int(r is not None and r.status == 0)

    def _impl_nowdb_cursor_errcode(self, res):
        return self._impl_nowdb_result_errcode(res)

    def _impl_nowdb_cursor_details(self, res):
        return self._impl_nowdb_result_details(res)

    # --- time helpers (nowclient.h tail) ---------------------------
    def _impl_nowdb_time_parse(self, buf, frm, tref):
        from datetime import datetime, timedelta, timezone
        try:
            s = _cstr(buf).decode()
            f = _cstr(frm).decode()
            dt = datetime.strptime(s, f).replace(tzinfo=timezone.utc)
            # integer µs — float timestamp() loses 1 µs on 2^50-scale
            # counts (same fix as wire.encode_value)
            epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
            ns = ((dt - epoch) // timedelta(microseconds=1)) * 1000
            tref._obj.value = ns
            return OK
        except (ValueError, AttributeError):
            return ERR_INVALID

    def _impl_nowdb_time_show(self, t, frm, buf, mx):
        from datetime import datetime, timezone
        try:
            ns = _cint(t)
            f = _cstr(frm).decode()
            dt = datetime.fromtimestamp(ns // 1_000_000_000,
                                        tz=timezone.utc)
            dt = dt.replace(microsecond=(ns % 1_000_000_000) // 1000)
            s = dt.strftime(f).encode()[: _cint(mx) - 1] + b"\x00"
            # a real ctypes char buffer unwraps via addressof, NOT
            # _handle (whose .value for a fresh buffer is b'' -> 0,
            # and memmove(0, ...) is an uncatchable SIGSEGV)
            obj = getattr(buf, "_obj", buf)
            if isinstance(obj, ctypes.Array):
                dst = ctypes.addressof(obj)
            else:
                dst = _handle(buf)
            if not dst:
                return ERR_INVALID
            ctypes.memmove(dst, s, len(s))
            return OK
        except (ValueError, AttributeError, OSError):
            return ERR_INVALID


def install_loader():
    """Patch ctypes.cdll.LoadLibrary so libnowdbclient.so resolves to
    a FakeNowClientLib; everything else loads for real. Returns an
    undo callable."""
    real = ctypes.cdll.LoadLibrary
    lib = FakeNowClientLib()

    def fake(name):
        if "libnowdbclient" in str(name):
            return lib
        return real(name)

    ctypes.cdll.LoadLibrary = fake

    def undo():
        ctypes.cdll.LoadLibrary = real

    return undo
