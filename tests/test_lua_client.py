"""Lua client smoke — the reference's basicsmoke.lua program shape
(connect → DDL → random-ish inserts → fastcount vs slowcount →
formatted report) running through luamini against a live server
(reference: lua/now.lua + test/luasmoke/basicsmoke.lua)."""

from __future__ import annotations

import pytest

from nowdb_spark.engine import Engine
from nowdb_spark.lua_client import run_lua_client
from nowdb_spark.server import NowServer


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    eng = Engine(spark, tmp_path_factory.mktemp("lua_srv"))
    srv = NowServer(eng)
    srv.serve_in_background()
    yield srv.address
    srv.shutdown()


BASICSMOKE = """
local rc, con = now.connect(HOST, PORT, nil, nil)
if rc ~= now.OK then
   error("cannot connect: " .. rc .. " (" .. con .. ")")
end

con.execute_([[create scope luadb]])
con.use('luadb')
con.execute_([[create type product (
                 key uint primary key,
                 descr      text,
                 base_price float)]])
for i = 1, 25 do
  con.execute_(string.format(
    [[insert into product (key, descr, base_price) values (%d, 'p%d', %f)]],
    i, i, i * 1.5))
end

-- fastcount: one aggregated row
local function fastcount(tab)
  local stmt = string.format("select count(*) from %s", tab)
  for row in con.rows(stmt) do
      return row.field(0)
  end
end

-- slowcount: drain the cursor
local function slowcount(tab)
  local stmt = string.format("select * from %s", tab)
  local cnt = 0
  for row in con.rows(stmt) do cnt = cnt + 1 end
  return cnt
end

local fc, sc = fastcount('product'), slowcount('product')
if fc ~= sc then
   error(string.format("count differs: %d ~= %d", fc, sc))
end
print(string.format("%8s: %5d", 'product', fc))

-- protected execute on garbage must not raise
local rc2, _ = con.pexecute('select nope from missing')
if rc2 == now.OK then error('expected an error') end

-- total over a cursor with arithmetic
local total = 0.0
for row in con.rows('select base_price from product') do
  total = total + row.field(0)
end

con.close()
return fc, total
"""


def test_basicsmoke_shape(server):
    host, port = server
    vals, it = run_lua_client(
        BASICSMOKE, extra_globals={"HOST": host, "PORT": port})
    assert vals[0] == 25
    assert vals[1] == pytest.approx(sum(i * 1.5 for i in range(1, 26)))
    assert it.output == [" product:    25"]


def test_connect_failure_returns_rc():
    vals, _ = run_lua_client("""
    local rc, msg = now.connect('127.0.0.1', 1, nil, nil)
    return rc ~= now.OK, type(msg)
    """)
    assert vals == [True, "string"]
