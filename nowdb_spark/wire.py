"""The reference's binary wire protocol (server codec + client codec).

Frame layout (reference `src/nowdb/ifc/nowdb.c` sendOK/sendEOF/sendErr/
sendReport/sendRow/sendCursor, client `src/nowdbclient/nowdbclient.c`
readResult; marker bytes `src/nowdb/types/types.h:107-117`):

    handshake  client -> server: 8 bytes  b"SQL" + (LE|BE|TX) + (0|1) + b"  "
               with ack='1' the server echoes the 8 bytes and awaits a
               2-byte ack whose second byte is ACK (0x4f)
    request    [int32 LE size][sql utf-8 bytes]   (no NUL, no newline)
               cursor paging is plain SQL: "fetch <id>;" / "close <id>;"
    response   2 bytes [kind, ack] then kind-specific body:
      STATUS 0x21 ACK 0x4f                         -- ok, nothing follows
      STATUS 0x21 NOK 0x4e  [int16 err==8]         -- EOF, nothing follows
      STATUS 0x21 NOK 0x4e  [int16 err][int32 sz][details]
      REPORT 0x22 ACK       [u64 affected][u64 errors][u64 runtime_us]
      ROW    0x23 ACK       [int32 sz][payload]
      CURSOR 0x24 ACK       [u64 curid][int32 sz][payload]

Row payload: per field one type byte then the value --
    TEXT 1   NUL-terminated utf-8
    DATE 2 / TIME 3 / INT 5   int64 LE
    UINT 6   uint64 LE
    FLOAT 4  double LE
    BOOL 9   one byte
    NOTHING 0  one pad byte
each row terminated by EOR 0x0a.

All integers little-endian: the negotiated LE/BE/TX byte is stored by
the reference server but never consulted afterwards (ifc/nowdb.c keeps
`opt.rtype` write-only) -- every session gets native byte order, and
its client macro ships "SQLBE0  " on LE builds. We mirror that: accept
all three, always emit LE.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone

EOR = 0x0A
STATUS, REPORT, ROW, CURSOR = 0x21, 0x22, 0x23, 0x24
ACK, NOK = 0x4F, 0x4E
ERR_EOF = 8  # include/nowdb/errcode.h:17

T_NOTHING, T_TEXT, T_DATE, T_TIME, T_FLOAT, T_INT, T_UINT, T_BOOL = (
    0, 1, 2, 3, 4, 5, 6, 9)

# client receive buffer is 0x102000 with a 0x1000 guard
# (nowdbclient.c:43-44 readSize) -- never exceed it in one frame
MAX_FRAME = 0x102000 - 0x1000

_I32 = struct.Struct("<i")
_U64 = struct.Struct("<Q")
_I64 = struct.Struct("<q")
_F64 = struct.Struct("<d")

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_US = timedelta(microseconds=1)


# --- value encoding ----------------------------------------------------

def encode_value(v, out: bytearray, hint: str | None = None) -> None:
    """Append one typed field. `hint` is the engine's nowdb type name
    for the column ('time'/'uint'/...) so int64-ns stamps go out as
    TIME and unsigned columns as UINT, like the reference projector."""
    if v is None:
        out.append(T_NOTHING)
        out.append(0)
    elif isinstance(v, bool):  # before int: bool is an int subclass
        out.append(T_BOOL)
        out.append(1 if v else 0)
    elif isinstance(v, int):
        if hint == "time":
            out.append(T_TIME)
        elif hint == "date":
            out.append(T_DATE)
        elif hint == "uint" and v >= 0:
            out.append(T_UINT)
            out += _U64.pack(v)
            return
        else:
            out.append(T_INT)
        out += _I64.pack(v)
    elif isinstance(v, float):
        out.append(T_FLOAT)
        out += _F64.pack(v)
    elif isinstance(v, str):
        out.append(T_TEXT)
        out += v.encode("utf-8") + b"\x00"
    elif isinstance(v, bytes):
        out.append(T_TEXT)
        out += v + b"\x00"
    elif isinstance(v, datetime):
        # engine timestamps that stayed native (TPC-H dates) -> TIME ns
        dt = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
        # integer µs — total_seconds() is a float and silently loses
        # 1 µs on ~1% of post-2004 stamps (2^50-scale µs counts)
        ns = ((dt - _EPOCH) // _US) * 1000
        out.append(T_TIME)
        out += _I64.pack(ns)
    elif isinstance(v, date):
        days = (v - _EPOCH.date()).days
        out.append(T_DATE)
        out += _I64.pack(days * 86_400_000_000_000)
    else:
        # arrays/maps/decimals have no wire type in the reference --
        # ship their textual form rather than refuse the row
        out.append(T_TEXT)
        out += str(v).encode("utf-8") + b"\x00"


def encode_rows(rows, hints=None) -> bytes:
    out = bytearray()
    for r in rows:
        for i, v in enumerate(r):
            encode_value(v, out, hints[i] if hints else None)
        out.append(EOR)
    return bytes(out)


# --- server frames -----------------------------------------------------

def frame_ok() -> bytes:
    return bytes((STATUS, ACK))


def frame_eof() -> bytes:
    return bytes((STATUS, NOK)) + struct.pack("<h", ERR_EOF)


def frame_err(code: int, details: str) -> bytes:
    d = details.encode("utf-8", "replace")[: MAX_FRAME - 1]
    code = code if 0 < code < 32768 else 74  # usrerr fallback
    return (bytes((STATUS, NOK)) + struct.pack("<h", code)
            + _I32.pack(len(d)) + d)


def frame_report(affected: int, errors: int, runtime_us: int) -> bytes:
    return (bytes((REPORT, ACK))
            + _U64.pack(affected) + _U64.pack(errors)
            + _U64.pack(runtime_us))


def frame_row(payload: bytes) -> bytes:
    return bytes((ROW, ACK)) + _I32.pack(len(payload)) + payload


def frame_cursor(curid: int, payload: bytes) -> bytes:
    return (bytes((CURSOR, ACK)) + _U64.pack(curid)
            + _I32.pack(len(payload)) + payload)


# --- client-side reader ------------------------------------------------

def read_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed mid-frame")
        buf += chunk
    return bytes(buf)


class Frame:
    __slots__ = ("rtype", "status", "err", "curid", "payload",
                 "affected", "errors", "runtime")

    def __init__(self):
        self.rtype = 0
        self.status = -1
        self.err = 0
        self.curid = 0
        self.payload = b""
        self.affected = self.errors = self.runtime = 0

    @property
    def ok(self) -> bool:
        return self.status == 0

    @property
    def eof(self) -> bool:
        return self.status != 0 and self.err == ERR_EOF


def read_frame(sock) -> Frame:
    """Client-side readResult (nowdbclient.c:260-325), shared by the
    pure-python client and the libnowdbclient ABI shim."""
    f = Frame()
    hdr = read_exact(sock, 2)
    f.rtype = hdr[0]
    if hdr[1] == ACK:
        f.status = 0
        if f.rtype == STATUS:
            return f
    elif f.rtype == STATUS:
        if hdr[1] != NOK:
            raise ConnectionError("protocol error: bad status byte")
        f.err = struct.unpack("<h", read_exact(sock, 2))[0]
        if f.err == ERR_EOF:
            return f
    if f.rtype == REPORT:
        body = read_exact(sock, 24)
        f.affected, f.errors, f.runtime = struct.unpack("<QQQ", body)
        return f
    if f.rtype == CURSOR:
        f.curid = _U64.unpack(read_exact(sock, 8))[0]
    sz = _I32.unpack(read_exact(sock, 4))[0]
    if sz > MAX_FRAME:
        raise ConnectionError(f"frame too big: {sz}")
    f.payload = read_exact(sock, sz) if sz > 0 else b""
    return f


def send_stmt(sock, sql: str) -> None:
    b = sql.encode("utf-8")
    sock.sendall(_I32.pack(len(b)) + b)


# --- payload decoding (client side / tests) ----------------------------

def decode_rows(payload: bytes) -> list[list]:
    """Decode a row payload into python values (typedField parity:
    TIME/DATE/INT all come back as int64)."""
    rows, row, i, n = [], [], 0, len(payload)
    while i < n:
        t = payload[i]
        i += 1
        if t == EOR:
            rows.append(row)
            row = []
        elif t == T_TEXT:
            j = payload.index(0, i)
            row.append(payload[i:j].decode("utf-8"))
            i = j + 1
        elif t in (T_DATE, T_TIME, T_INT):
            row.append(_I64.unpack_from(payload, i)[0])
            i += 8
        elif t == T_UINT:
            row.append(_U64.unpack_from(payload, i)[0])
            i += 8
        elif t == T_FLOAT:
            row.append(_F64.unpack_from(payload, i)[0])
            i += 8
        elif t == T_BOOL:
            row.append(payload[i] != 0)
            i += 1
        elif t == T_NOTHING:
            row.append(None)
            i += 1
        else:
            raise ValueError(f"bad field type byte {t} at {i - 1}")
    return rows
