"""Client/server session layer: a reference-client-shaped program run
over the wire (connect → DDL → insert → query → iterate → close)."""

from __future__ import annotations

import pytest

from nowdb_spark.client import ClientError, connect
from nowdb_spark.engine import Engine
from nowdb_spark.server import NowServer


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    eng = Engine(spark, tmp_path_factory.mktemp("srv_wh"))
    srv = NowServer(eng)
    srv.serve_in_background()
    yield srv.address
    srv.shutdown()


def test_full_session(server):
    host, port = server
    with connect(host, port) as con:
        assert con.execute("create scope net").ok()
        assert con.execute("use net").ok()
        assert con.execute(
            "create type p (k uint pk, name text, v float)").ok()
        r = con.execute("insert into p values (1, 'one', 1.5)")
        assert r.kind == "report" and r.affected == 1
        con.rexecute("insert into p values (2, 'two', 2.5)")
        con.rexecute("insert into p values (3, 'three', 3.5)")

        with con.execute("select k, name, v from p order by k") as cur:
            assert cur.kind == "cursor"
            rows = [list(row.row()) for row in cur]
        assert rows == [[1, "one", 1.5], [2, "two", 2.5], [3, "three", 3.5]]

        assert con.oneValue("select count(*) from p") == 3
        assert con.oneRow("select name from p where k = 2") == ["two"]


def test_error_over_wire(server):
    host, port = server
    with connect(host, port) as con:
        r = con.execute("select nope from missing_ctx")
        assert not r.ok()
        assert "missing_ctx" in r.details() or "no such" in r.details()
        with pytest.raises(ClientError):
            con.rexecute("select * from still_missing")


def test_two_sessions_share_catalog(server):
    host, port = server
    with connect(host, port) as a, connect(host, port) as b:
        assert a.execute("use net").ok()
        assert b.execute("use net").ok()
        a.rexecute("insert into p values (10, 'ten', 10.0)")
        assert b.oneValue("select count(*) from p where k = 10") == 1


def test_pynow_style_connect(server):
    """A pynow program ported verbatim: 4-arg connect with the port as
    a STRING (pynow/now.py:178,193 passes strings), with-statement
    resource management, oneValue."""
    host, port = server
    with connect(host, str(port), "user", "mypwd") as con:
        assert con.execute("create scope pn").ok()
        assert con.execute("use pn").ok()
        con.rexecute("create type t (k uint pk, v float)")
        con.rexecute("insert into t values (1, 2.5)")
        assert con.oneValue("select sum(v) from t") == 2.5


def test_wire_datetime_ns_exact():
    """encode_value must convert datetimes to ns with INTEGER µs
    arithmetic — float total_seconds() loses 1 µs on ~1% of
    post-2004 stamps (2^50-scale µs counts)."""
    import struct as _struct
    from datetime import datetime, timedelta, timezone

    from nowdb_spark import wire

    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    for us in range(2147778872552100, 2147778872552200):
        out = bytearray()
        wire.encode_value(epoch + timedelta(microseconds=us), out)
        ns = _struct.unpack("<q", bytes(out[1:9]))[0]
        assert ns == us * 1000, us


def test_json_short_first_line(server):
    """A sub-3-byte first line must get a reply, not deadlock the
    sniffer (it previously blocked reading 3 bytes up front)."""
    import json as _json
    import socket

    host, port = server
    with socket.create_connection((host, port), timeout=10) as s:
        s.sendall(b"x\n")
        s.settimeout(10)
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(4096)
            if not chunk:
                break
            buf += chunk
        rsp = _json.loads(buf)
        assert rsp["ok"] is False
