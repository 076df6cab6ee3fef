"""End-to-end engine tests in the reference's pysmoke style
(test/pysmoke/*.py): create the canonical retail scope (FIXTURES.md),
insert seeded-random data, run nowdb SQL, and compare against values
recomputed in Python.

Fixture schema follows test/pysmoke/db.py:30-99: vertex types
product/client/store, edges buys/visits.
"""

from __future__ import annotations

import random
import statistics

import pytest

from nowdb_spark.engine import Engine
from nowdb_spark.results import CursorResult, ReportResult, RowResult

PRODUCTS = 30
CLIENTS = 10
BUYS = 120
NS = 1_000_000_000


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    e = Engine(spark, base)
    r = e.execute("create scope retail")
    assert r.ok(), r.details()
    assert e.execute("use retail").ok()

    assert e.execute(
        "create type product (prod_key uint pk, prod_desc text, "
        "prod_cat uint, prod_packing uint, prod_price float)"
    ).ok()
    assert e.execute(
        "create type client (client_key uint pk, client_name text, "
        "birthdate time)"
    ).ok()
    assert e.execute(
        "create edge buys (origin client origin, destin product destin, "
        "stamp time timestamp, quantity uint, price float)"
    ).ok()
    return e


@pytest.fixture(scope="module")
def data(eng):
    """Seeded random data inserted through the SQL surface; returns
    the python-side copy for recomputation."""
    rng = random.Random(42)
    products = []
    for k in range(PRODUCTS):
        price = round(rng.uniform(1, 100), 2)
        desc = f"product_{k}"
        products.append((k, desc, k % 5, k % 3, price))
        r = eng.execute(
            f"insert into product (prod_key, prod_desc, prod_cat, "
            f"prod_packing, prod_price) values ({k}, '{desc}', {k % 5}, "
            f"{k % 3}, {price})")
        assert r.ok(), r.details()
    clients = []
    for k in range(CLIENTS):
        ck = 9_000_000 + k
        clients.append((ck, f"client_{k}"))
        assert eng.execute(
            f"insert into client (client_key, client_name, birthdate) "
            f"values ({ck}, 'client_{k}', '1990-01-{1 + k % 27:02d}')"
        ).ok()
    base_ns = 1_514_764_800 * NS  # 2018-01-01
    buys = []
    for _ in range(BUYS):
        o = 9_000_000 + rng.randrange(CLIENTS)
        d = rng.randrange(PRODUCTS)
        stamp = base_ns + rng.randrange(90 * 86400) * NS
        q = rng.randrange(1, 10)
        p = round(rng.uniform(1, 50), 2)
        buys.append((o, d, stamp, q, p))
        assert eng.execute(
            f"insert into buys (origin, destin, stamp, quantity, price) "
            f"values ({o}, {d}, {stamp}, {q}, {p})").ok()
    return {"products": products, "clients": clients, "buys": buys}


def rows(res) -> list[tuple]:
    assert isinstance(res, CursorResult), res.details()
    return [tuple(r.row()) for r in res]


# --- DDL / metadata -------------------------------------------------

def test_show_desc(eng):
    r = eng.execute("show types")
    assert isinstance(r, RowResult)
    names = {row[0] for row in r._rows}
    assert {"product", "client"} <= names
    r = eng.execute("show edges")
    assert {row[0] for row in r._rows} == {"buys"}
    d = eng.execute("desc buys")
    got = {(row[0], row[2]) for row in d._rows}
    assert ("origin", "origin") in got
    assert ("stamp", "stamp") in got


def test_create_errors(eng):
    r = eng.execute("create type product (x int pk)")
    assert not r.ok() and "exists" in r.details()
    assert eng.execute("create type if not exists product (x int pk)").ok()
    r = eng.execute("select nope from not_a_context")
    assert not r.ok()


# --- basicsmoke parity: count/sum/avg (basicsmoke.py:36-62) ---------

def test_global_aggregates(eng, data):
    got = rows(eng.execute(
        "select count(*), sum(quantity), avg(quantity), min(price), "
        "max(price), spread(price), median(quantity), stddev(quantity) "
        "from buys"))[0]
    qs = [b[3] for b in data["buys"]]
    ps = [b[4] for b in data["buys"]]
    assert got[0] == len(qs)
    assert got[1] == sum(qs)
    assert got[2] == pytest.approx(sum(qs) / len(qs))
    assert got[3] == min(ps)
    assert got[4] == max(ps)
    assert got[5] == pytest.approx(max(ps) - min(ps))
    assert got[6] == pytest.approx(statistics.median(qs))
    assert got[7] == pytest.approx(statistics.stdev(qs))


# --- curvertex parity: point/IN/text filters ------------------------

def test_point_and_in_filters(eng, data):
    got = rows(eng.execute("select prod_key from product where prod_key = 7"))
    assert got == [(7,)]
    got = rows(eng.execute(
        "select prod_key from product where prod_key in (1, 3, 5)"))
    assert sorted(got) == [(1,), (3,), (5,)]
    got = rows(eng.execute(
        "select prod_key from product where prod_desc = 'product_9'"))
    assert got == [(9,)]


# --- curedge parity: conjunctions + group by (curedge.py:146-239) ---

def test_edge_filter_conjunction(eng, data):
    o, d = data["buys"][0][0], data["buys"][0][1]
    got = rows(eng.execute(
        f"select origin, quantity from buys "
        f"where origin = {o} and destin = {d}"))
    want = [(b[0], b[3]) for b in data["buys"] if b[0] == o and b[1] == d]
    assert sorted(got) == sorted(want)


def test_group_by_per_key(eng, data):
    got = rows(eng.execute(
        "select origin, count(*), sum(quantity) from buys group by origin"))
    per = {}
    for b in data["buys"]:
        c, s = per.get(b[0], (0, 0))
        per[b[0]] = (c + 1, s + b[3])
    assert len(got) == len(per)
    for o, cnt, sq in got:
        assert per[o] == (cnt, sq)


def test_group_distinct_and_order(eng, data):
    got = rows(eng.execute("select destin from buys group by destin"))
    assert sorted(x[0] for x in got) == sorted({b[1] for b in data["buys"]})
    got = rows(eng.execute("select destin from buys order by destin"))
    assert [x[0] for x in got] == sorted(b[1] for b in data["buys"])


def test_agg_in_expression(eng, data):
    got = rows(eng.execute(
        "select sum(quantity)/count(*) as avg_q, "
        "sum(quantity * price) as vol from buys"))[0]
    qs = [b[3] for b in data["buys"]]
    vol = sum(b[3] * b[4] for b in data["buys"])
    assert got[0] == pytest.approx(sum(qs) / len(qs))
    assert got[1] == pytest.approx(vol)


# --- formulas parity (formulas.py:36-84) ----------------------------

def test_formulas(eng, data):
    got = rows(eng.execute(
        "select prod_key, ((prod_price + 2.0)/4.0)^2, "
        "ceil(prod_price * 10.0)/10.0, round(prod_price), "
        "prod_cat % 3, prod_cat / 4 "
        "from product where prod_key < 10 order by prod_key"))
    import math
    for (k, f1, f2, f3, f4, f5), p in zip(got, data["products"][:10]):
        price, cat = p[4], p[2]
        assert f1 == pytest.approx(((price + 2.0) / 4.0) ** 2)
        assert f2 == pytest.approx(math.ceil(price * 10) / 10)
        assert f3 == pytest.approx(round(price))
        assert f4 == cat % 3
        assert f5 == pytest.approx(cat / 4)  # int / int → float


def test_select_only(eng):
    assert rows(eng.execute("select 1 + 2"))[0][0] == 3
    assert rows(eng.execute("select 2 ^ 10"))[0][0] == pytest.approx(1024.0)
    assert rows(eng.execute("select 7 / 2"))[0][0] == pytest.approx(3.5)
    v = rows(eng.execute("select pi()"))[0][0]
    import math
    assert v == pytest.approx(math.pi)


# --- time extraction + period pruning -------------------------------

def test_time_extraction(eng, data):
    got = rows(eng.execute(
        "select stamp, year(stamp), month(stamp) from buys limit 20"))
    import datetime as dt
    for ns, y, m in got:
        d = dt.datetime.fromtimestamp(ns / NS, dt.timezone.utc)
        assert (y, m) == (d.year, d.month)


def test_time_range_filter(eng, data):
    got = rows(eng.execute(
        "select count(*) from buys where stamp >= '2018-02-01' "
        "and stamp < '2018-03-01'"))[0]
    import datetime as dt
    lo = dt.datetime(2018, 2, 1, tzinfo=dt.timezone.utc).timestamp() * NS
    hi = dt.datetime(2018, 3, 1, tzinfo=dt.timezone.utc).timestamp() * NS
    want = sum(1 for b in data["buys"] if lo <= b[2] < hi)
    assert got[0] == want


def test_period_pruning_plan(eng, data):
    """The stamp range must turn into a partition filter on __tb."""
    df = eng.sql("select origin from buys where stamp >= '2018-02-01' "
                 "and stamp < '2018-02-03'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__tb" in plan, plan[:2000]


# --- NULL semantics (sql.tex:311-333) -------------------------------

def test_null_semantics(eng):
    assert eng.execute(
        "insert into client (client_key, client_name) values (9999999, "
        "'no_birthdate')").ok()
    got = rows(eng.execute(
        "select client_key from client where birthdate is null"))
    assert got == [(9999999,)]
    got = rows(eng.execute(
        "select count(*) from client where birthdate is not null"))
    assert got[0][0] == CLIENTS
    # = NULL is never true
    got = rows(eng.execute(
        "select count(*) from client where birthdate = 0"))
    assert got[0][0] == 0


# --- documented join design (sql.tex:2293-2368) ---------------------

def test_edge_join_origin(eng, data):
    got = rows(eng.execute(
        "select origin, client.client_name, quantity from buys "
        "join client on origin limit 5"))
    names = dict(data["clients"])
    for o, name, q in got:
        assert names[o] == name


def test_edge_join_both(eng, data):
    got = rows(eng.execute(
        "select origin, c.client_name, p.prod_desc, quantity from buys "
        "join client on origin as c join product on destin as p "
        "where quantity > 5 limit 10"))
    prods = {p[0]: p[1] for p in data["products"]}
    names = dict(data["clients"])
    assert got
    for o, cn, pd, q in got:
        assert names[o] == cn
        assert q > 5


# --- CASE / coalesce ------------------------------------------------

def test_case_when(eng, data):
    got = rows(eng.execute(
        "select prod_key, case when prod_price < 30.0 then 'cheap' "
        "when prod_price < 70.0 then 'mid' else 'dear' end as cls "
        "from product order by prod_key"))
    for (k, cls), p in zip(got, data["products"]):
        want = "cheap" if p[4] < 30 else ("mid" if p[4] < 70 else "dear")
        assert cls == want


# --- strict mode (group-list = select-list rule) --------------------

def test_strict_mode(spark, eng):
    strict = Engine(spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    # no index yet → grouping itself is rejected (sql.tex:2718-2725)
    r = strict.execute(
        "select origin, count(*) from buys group by origin")
    assert not r.ok() and "index" in r.details()
    assert strict.execute("create index buys_origin on buys (origin)").ok()
    strict.scope = strict.scope.load(strict.base, "retail")
    r = strict.execute(
        "select quantity, count(*) from buys group by origin")
    assert not r.ok() and "strict" in r.details()
    r = strict.execute(
        "select origin, count(*) from buys group by origin")
    assert r.ok(), r.details()
    # ordering also requires a matching index
    r = strict.execute("select destin from buys order by destin")
    assert not r.ok() and "index" in r.details()
    # window functions are an extension → rejected in strict mode
    r = strict.execute(
        "select row_number() over (partition by origin order by stamp) "
        "as rn from buys")
    assert not r.ok() and "strict" in r.details()


def test_window_functions(eng, data):
    got = rows(eng.execute(
        "select origin, stamp, quantity, "
        "row_number() over (partition by origin order by stamp) as rn, "
        "sum(quantity) over (partition by origin order by stamp) as rq "
        "from buys"))
    # per-origin: rn is 1..n in stamp order, rq the running quantity sum
    from collections import defaultdict
    per = defaultdict(list)
    for o, st, q, rn, rq in got:
        per[o].append((st, q, rn, rq))
    assert per
    for o, lst in per.items():
        lst.sort()
        run = 0
        for i, (st, q, rn, rq) in enumerate(lst):
            run += q
            assert rn == i + 1 and rq == run


# --- procedures (procman parity) ------------------------------------

def test_procedures(eng, data):
    assert eng.execute(
        "create procedure stats.buycount() language python").ok()
    (eng.scope.path / "procs").mkdir(exist_ok=True)
    (eng.scope.path / "procs" / "stats.py").write_text(
        "def buycount(session):\n"
        "    return session.onevalue('select count(*) from buys')\n")
    r = eng.execute("exec stats.buycount()")
    assert isinstance(r, RowResult)
    assert r.field(0) == BUYS


def test_registered_procedure(eng):
    eng.register_procedure(
        "hello", lambda s, name: f"hello {name}")
    r = eng.execute("exec hello('world')")
    assert r.field(0) == "hello world"


# --- locks ----------------------------------------------------------

def test_locks(eng):
    assert eng.execute("create lock mylock").ok()
    assert eng.execute("lock mylock").ok()
    assert eng.execute("unlock mylock").ok()
    assert eng.execute("lock mylock for reading set timeout = 100").ok()
    assert eng.execute("unlock mylock").ok()
    r = eng.execute("lock nolock")
    assert not r.ok()


# --- CSV load (loader.c parity) -------------------------------------

def test_load_csv(eng, tmp_path, data):
    csv = tmp_path / "products.csv"
    lines = ["prod_key;prod_desc;prod_cat;prod_packing;prod_price"]
    for k in range(100, 110):
        lines.append(f"{k};loaded_{k};1;2;{k}.5")
    lines.append("not_a_number;bad;x;y;z")  # malformed row
    csv.write_text("\n".join(lines) + "\n")
    r = eng.execute(f"load '{csv}' into product use header as product "
                    f"set errors='{tmp_path}/errs'")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected == 10
    assert r.errors == 1
    got = rows(eng.execute(
        "select prod_key, prod_desc from product where prod_key >= 100"))
    assert len(got) == 10
    assert ("loaded_105") in {g[1] for g in got}


def test_one_value_one_row(eng):
    assert eng.one_value("select count(*) from product") >= PRODUCTS
    row = eng.one_row("select prod_key, prod_desc from product "
                      "where prod_key = 3")
    assert row[0] == 3


# --- period pruning must not leak into joined contexts --------------

def test_join_prune_only_target(spark, tmp_path_factory):
    """A stamp-range WHERE on the edge must prune ONLY the edge's
    __tb partitions: a joined vertex whose stamp prop shares the name
    'stamp' (vertices can be stamped, parser.py:249) lives in a
    different time range and would lose all rows if the edge's range
    pruned it too."""
    e = Engine(spark, tmp_path_factory.mktemp("prune_scope"))
    assert e.execute("create scope ps").ok()
    assert e.execute("use ps").ok()
    # stamped vertex: registered in 2017 — outside the edge's range
    assert e.execute(
        "create type sensor (sensor_key uint pk, stamp time timestamp, "
        "label text)").ok()
    assert e.execute(
        "create edge ping (origin sensor origin, destin sensor destin, "
        "stamp time timestamp, rtt float)").ok()
    for k in range(3):
        assert e.execute(
            f"insert into sensor (sensor_key, stamp, label) values "
            f"({k}, '2017-03-0{k + 1}', 'node_{k}')").ok()
    for k in range(3):
        assert e.execute(
            f"insert into ping (origin, destin, stamp, rtt) values "
            f"({k}, {(k + 1) % 3}, '2018-06-0{k + 1}', {k}.5)").ok()
    # unqualified stamp range = edge's stamp; vertex must NOT be pruned
    got = rows(e.execute(
        "select origin, sensor.label from ping join sensor on origin "
        "where stamp >= '2018-06-01' and stamp < '2018-06-03'"))
    assert sorted(got) == [(0, "node_0"), (1, "node_1")]
    # qualified vertex-stamp conjunct must not prune the edge either
    got = rows(e.execute(
        "select origin from ping join sensor on origin as s "
        "where s.stamp < '2017-04-01'"))
    assert sorted(g[0] for g in got) == [0, 1, 2]


def test_load_csv_ignore_header_exact_one_line(spark, tmp_path_factory):
    """'ignore header' must skip exactly ONE physical line: a data row
    whose first column equals the header token is kept, and the header
    line is not counted as a parse error for non-text first columns."""
    base = tmp_path_factory.mktemp("csvhdr")
    e = Engine(spark, base / "wh")
    assert e.execute("create scope csvh").ok()
    assert e.execute("use csvh").ok()
    assert e.execute("create type tag (tag_name text pk, weight uint)").ok()
    csv = base / "tags.csv"
    csv.write_text("tag_name;weight\nalpha;1\ntag_name;7\nbeta;2\n")
    r = e.execute(f"load '{csv}' into tag ignore header as tag "
                  f"set errors='{base}/errs'")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected == 3, (r.affected, r.errors)
    assert r.errors == 0
    got = rows(e.execute("select tag_name, weight from tag"))
    assert sorted(got) == [("alpha", 1), ("beta", 2), ("tag_name", 7)]
    # numeric-first context: header line must not land in the errors
    assert e.execute("create type num (num_key uint pk, val uint)").ok()
    csv2 = base / "nums.csv"
    csv2.write_text("num_key;val\n1;10\n2;20\n")
    r = e.execute(f"load '{csv2}' into num ignore header as num")
    assert r.affected == 2 and r.errors == 0, (r.affected, r.errors)


def test_inc_auto_increment(spark, tmp_path_factory):
    """INC props auto-assign a dense increasing sequence when omitted
    from the insert (reference promise, model/types.h:51)."""
    e = Engine(spark, tmp_path_factory.mktemp("inc_scope"))
    assert e.execute("create scope incs").ok()
    assert e.execute("use incs").ok()
    assert e.execute(
        "create type evt (evt_id uint pk inc, what text)").ok()
    for w in ("a", "b", "c"):
        assert e.execute(
            f"insert into evt (what) values ('{w}')").ok()
    got = rows(e.execute("select evt_id, what from evt"))
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]
    # explicit values still win; sequence resumes above the stored max
    assert e.execute(
        "insert into evt (evt_id, what) values (10, 'x')").ok()
    e2 = Engine(spark, e.base)   # fresh engine: counter re-seeds
    assert e2.execute("use incs").ok()
    assert e2.execute("insert into evt (what) values ('y')").ok()
    got = dict(rows(e2.execute("select evt_id, what from evt")))
    assert got[11] == "y" and len(got) == 5


def test_lua_procedure(eng, data):
    """LANGUAGE lua procedures EXECUTE for real (reference
    ifc/luaproc.c + test/luasmoke): through lupa when installed, else
    through the bundled luamini interpreter — never an ImportError
    branch."""
    assert eng.execute(
        "create procedure stats2.buys2() language lua").ok()
    names = {row[0] for row in eng.execute("show procedures")._rows}
    assert "stats2.buys2" in names
    (eng.scope.path / "procs").mkdir(exist_ok=True)
    (eng.scope.path / "procs" / "stats2.lua").write_text(
        "function buys2()\n"
        "  return nowdb.onevalue('select count(*) from buys')\n"
        "end\n")
    r = eng.execute("exec stats2.buys2()")
    assert r.ok(), r.details()
    assert r.field(0) == BUYS


def test_lua_procedure_cursor_loop_and_api(eng, data):
    """The luaemb.tex API surface inside a procedure body: execute
    over a cursor with `for row in cur do`, resulttype constants,
    string.format, pexecute error path, execute_ DDL+DML."""
    (eng.scope.path / "procs").mkdir(exist_ok=True)
    (eng.scope.path / "procs" / "luaapi.lua").write_text("""
function tally()
  -- DDL + DML through execute_
  nowdb.execute_([[create type luat (k uint pk, v float)]])
  nowdb.execute_([[insert into luat (k, v) values (1, 1.5)]])
  nowdb.execute_([[insert into luat (k, v) values (2, 2.5)]])

  -- cursor iteration + resulttype
  local cur = nowdb.execute([[select k, v from luat]])
  if cur:resulttype() ~= nowdb.CURSOR then
    nowdb.raise(99, 'expected a cursor')
  end
  local n, total = 0, 0.0
  for row in cur do
    n = n + 1
    total = total + row.field(1)
  end
  cur.release()

  -- protected execute on a broken statement
  local rc, _ = nowdb.pexecute('select nope from missing_ctx')
  if rc == nowdb.OK then nowdb.raise(98, 'expected an error') end

  return string.format('%d:%.1f', n, total)
end
""")
    assert eng.execute(
        "create procedure luaapi.tally() language lua").ok()
    r = eng.execute("exec luaapi.tally()")
    assert r.ok(), r.details()
    assert r.field(0) == "2:4.0"


def test_lua_makerow_and_constants(eng, data):
    """nowdb.makerow/add2row/closerow, makeresult, array2row and the
    type/time constants (lua/nowdb.lua:61-88, 294-447)."""
    (eng.scope.path / "procs").mkdir(exist_ok=True)
    (eng.scope.path / "procs" / "luarow.lua").write_text("""
function mkrow()
  local row = nowdb.makerow()
  row.add2row(nowdb.TEXT, 'answer')
  row.add2row(nowdb.INT, 42)
  row.add2row(nowdb.TIME, 2 * nowdb.hour)
  row.closerow()
  return row
end
function mkarr()
  return nowdb.array2row({nowdb.TEXT, nowdb.FLOAT}, {'pi', 3.5})
end
""")
    assert eng.execute(
        "create procedure luarow.mkrow() language lua").ok()
    assert eng.execute(
        "create procedure luarow.mkarr() language lua").ok()
    r = eng.execute("exec luarow.mkrow()")
    assert r.ok(), r.details()
    assert (r.field(0), r.field(1), r.field(2)) == \
        ("answer", 42, 7_200_000_000_000)
    r2 = eng.execute("exec luarow.mkarr()")
    assert r2.ok() and (r2.field(0), r2.field(1)) == ("pi", 3.5)


def test_lua_procedure_error_propagates(eng, data):
    (eng.scope.path / "procs").mkdir(exist_ok=True)
    (eng.scope.path / "procs" / "luabad.lua").write_text(
        "function boom()\n  error('deliberate')\nend\n")
    assert eng.execute(
        "create procedure luabad.boom() language lua").ok()
    r = eng.execute("exec luabad.boom()")
    assert not r.ok() and "deliberate" in r.details()


def test_configurable_time_unit_epoch(spark, tmp_path_factory):
    """Reference parity: nowdb_time_setPerSec / setEpoch
    (types/time.h:48-95) — a server configured for millisecond units
    and an epoch one minute AFTER the Unix epoch stores stamps as ms
    offsets from that epoch; literals, range filters (incl. the
    __tb pruning path), extraction, and now() all honor it."""
    from nowdb_spark import timeutil as TU
    TU.set_per_sec(1_000)          # millisecond unit
    TU.set_epoch(-60_000)          # epoch = Unix + 60s, in ms units
    try:
        e = Engine(spark, tmp_path_factory.mktemp("tcfg"))
        assert e.execute("create scope tcfg").ok()
        assert e.execute("use tcfg").ok()
        assert e.execute(
            "create type ev (ev_id uint pk, at time stamp)").ok()
        for i, lit in enumerate(["2021-03-04T05:06:07.250000",
                                 "2021-03-05", "2021-03-06T00:00:01"]):
            assert e.execute(
                f"insert into ev (ev_id, at) values ({i}, '{lit}')").ok()
        got = dict(rows(e.execute("select ev_id, at from ev")))
        # 2021-03-04T05:06:07.250 = 1614834367.250 unix-s
        #   → ms 1614834367250, minus 60s epoch shift = 1614834307250
        assert got[0] == 1_614_834_367_250 - 60_000
        # range filter through the period-pruning path
        r = rows(e.execute(
            "select ev_id from ev where at >= '2021-03-05' "
            "and at < '2021-03-06'"))
        assert r == [(1,)]
        # component extraction converts back through the configured
        # unit/epoch (wall-clock year/second of the literal)
        r = dict(rows(e.execute("select ev_id, second(at) from ev")))
        assert r == {0: 7, 1: 0, 2: 1}
        # now() lands in the configured representation: ms magnitude
        v = rows(e.execute("select now()"))[0][0]
        import time as _t
        assert abs(v - (_t.time() * 1000 - 60_000)) < 60_000
    finally:
        TU.set_epoch(0)
        TU.set_per_sec(TU.NS_PER_SEC)


def test_merge_upsert(spark, tmp_path_factory):
    """MERGE INTO (extension): matched rows update from the source,
    unmatched source rows insert, everything else is untouched."""
    e = Engine(spark, tmp_path_factory.mktemp("merge_scope"))
    assert e.execute("create scope ms").ok()
    assert e.execute("use ms").ok()
    assert e.execute("create type price (k uint pk, v float, tag text)").ok()
    assert e.execute("create type newprice (k uint pk, v float)").ok()
    for k, v, t in [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")]:
        assert e.execute(
            f"insert into price values ({k}, {v}, '{t}')").ok()
    for k, v in [(2, 99.0), (4, 44.0)]:
        assert e.execute(f"insert into newprice values ({k}, {v})").ok()

    r = e.execute(
        "merge into price using newprice on k "
        "when matched then update set v = v * 2 "
        "when not matched then insert")
    assert r.ok() and r.affected == 2, (r.details(), r.affected)
    got = {k: (v, t) for k, v, t in
           rows(e.execute("select k, v, tag from price"))}
    # matched k=2: v = source v * 2, tag untouched; k=4 inserted with
    # NULL tag; k=1/k=3 untouched
    assert got == {1: (10.0, "a"), 2: (198.0, "b"),
                   3: (30.0, "c"), 4: (44.0, None)}, got

    # matched-delete form
    r = e.execute("merge into price using newprice on k "
                  "when matched then delete")
    assert r.ok() and r.affected == 2
    assert sorted(got_k for got_k, in rows(e.execute(
        "select k from price"))) == [1, 3]

    # duplicate-key source is ambiguous -> error
    assert e.execute("insert into newprice values (2, 1.0)").ok()
    r = e.execute("merge into price using newprice on k "
                  "when matched then update set v = v")
    assert not r.ok() and "not unique" in r.details()


def test_distinct_and_having(eng, data):
    """Dialect extensions: SELECT DISTINCT and GROUP BY ... HAVING
    (the reference grammar has neither — SURVEY §2.1 non-features)."""
    got = rows(eng.execute("select distinct prod_cat from product"))
    assert sorted(v for v, in got) == sorted({p[2] for p in data["products"]})

    got = rows(eng.execute(
        "select origin, count(*) from buys group by origin "
        "having count(*) > 10 order by origin"))
    per = {}
    for b in data["buys"]:
        per[b[0]] = per.get(b[0], 0) + 1
    want = sorted((o, c) for o, c in per.items() if c > 10)
    assert got == want, (got, want)

    # HAVING on an aggregate absent from the select list
    got = rows(eng.execute(
        "select origin from buys group by origin "
        "having sum(quantity) > 60 order by origin"))
    per_q = {}
    for b in data["buys"]:
        per_q[b[0]] = per_q.get(b[0], 0) + b[3]
    assert [o for o, in got] == sorted(o for o, q in per_q.items() if q > 60)

    # distinct composes with expressions
    got = rows(eng.execute("select distinct prod_cat % 2 from product"))
    assert sorted(v for v, in got) == [0, 1]


def test_distinct_having_rejected_in_strict_mode(spark, tmp_path_factory):
    e = Engine(spark, tmp_path_factory.mktemp("strict_dh"), strict=True)
    assert e.execute("create scope sdh").ok()
    assert e.execute("use sdh").ok()
    assert e.execute("create type t (k uint pk, v uint)").ok()
    r = e.execute("select distinct v from t")
    assert not r.ok() and "strict" in r.details()
    r = e.execute("select k, count(*) from t group by k having count(*) > 1")
    assert not r.ok() and "strict" in r.details()


def test_order_by_desc(eng, data):
    all_keys = sorted(k for k, in rows(eng.execute(
        "select prod_key from product")))
    got = rows(eng.execute(
        "select prod_key from product order by prod_key desc limit 3"))
    assert [k for k, in got] == all_keys[::-1][:3]
    got = rows(eng.execute(
        "select prod_cat, prod_key from product "
        "order by prod_cat desc, prod_key asc limit 2"))
    assert got[0][0] == 4 and got[0][1] < got[1][1]


def test_insert_select(spark, tmp_path_factory):
    """INSERT ... SELECT (extension): positional mapping, NULL fill,
    INC block assignment."""
    e = Engine(spark, tmp_path_factory.mktemp("insel"))
    assert e.execute("create scope insel").ok()
    assert e.execute("use insel").ok()
    assert e.execute("create type src (k uint pk, v float)").ok()
    assert e.execute(
        "create type dst (row_id uint pk inc, k uint, v float, "
        "note text)").ok()
    for k in range(5):
        assert e.execute(
            f"insert into src values ({k}, {float(k) * 1.5})").ok()
    r = e.execute("insert into dst (k, v) select k, v from src "
                  "where k >= 2")
    assert r.ok() and r.affected == 3, r.details()
    got = rows(e.execute("select row_id, k, v, note from dst"))
    assert sorted(r[0] for r in got) == [1, 2, 3]       # dense INC block
    assert {(r[1], r[2]) for r in got} == {(2, 3.0), (3, 4.5), (4, 6.0)}
    assert all(r[3] is None for r in got)               # NULL fill
    # sequence continues after the block
    assert e.execute("insert into dst (k, v) values (9, 9.0)").ok()
    got = dict((r[0], r[1]) for r in
               rows(e.execute("select row_id, k from dst")))
    assert got[4] == 9


def test_subqueries(eng, data):
    # IN (SELECT ...) semi-join: buys whose product is cheap
    got = rows(eng.execute(
        "select destin, quantity from buys where destin in "
        "(select prod_key from product where prod_price < 30.0)"))
    cheap = {p[0] for p in data["products"] if p[4] < 30.0}
    assert got and all(d in cheap for d, q in got)
    want = sum(1 for b in data["buys"] if b[1] in cheap)
    assert len(got) == want

    # NOT IN anti-join
    got = rows(eng.execute(
        "select destin from buys where destin not in "
        "(select prod_key from product where prod_price < 30.0)"))
    assert all(d not in cheap for (d,) in got)
    assert len(got) == len(data["buys"]) - want

    # scalar subquery in WHERE and in the select list
    mx = max(b[3] for b in data["buys"])
    got = rows(eng.execute(
        "select quantity, (select max(quantity) from buys) as mq "
        "from buys where quantity = (select max(quantity) from buys)"))
    assert got and all(q == mx and m == mx for q, m in got)

    # scalar subquery inside an aggregate argument
    got = rows(eng.execute(
        "select sum(quantity - (select min(quantity) from buys)) as s "
        "from buys"))
    mn = min(b[3] for b in data["buys"])
    assert got[0][0] == sum(b[3] - mn for b in data["buys"])

    # non-single-row scalar subquery is rejected
    r = eng.execute(
        "select 1 from buys where quantity > (select quantity from buys)")
    assert not r.ok() and "single-row" in r.details()

    # strict mode rejects subqueries
    strict = Engine(eng.spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    r = strict.execute(
        "select origin from buys where origin in "
        "(select prod_key from product)")
    assert not r.ok() and "strict" in r.details()


def test_views(eng, data, spark):
    # prod_key < 100 keeps the view independent of rows test_load_csv
    # may have appended (module-scoped engine fixture)
    assert eng.execute(
        "create view pricey as select prod_key, prod_price from product "
        "where prod_price > 50.0 and prod_key < 100").ok()
    got = rows(eng.execute("select prod_key from pricey"))
    want = sorted(p[0] for p in data["products"] if p[4] > 50.0)
    assert sorted(x[0] for x in got) == want

    # view on view, with aggregation
    assert eng.execute(
        "create view pricey_stats as select count(*) as n, "
        "round(avg(prod_price), 6) as ap from pricey").ok()
    n, ap = rows(eng.execute("select n, ap from pricey_stats"))[0]
    prices = [p[4] for p in data["products"] if p[4] > 50.0]
    assert n == len(prices)
    assert ap == pytest.approx(round(sum(prices) / len(prices), 6))

    # catalog persistence across engine restart
    e2 = Engine(spark, eng.base)
    assert e2.execute("use retail").ok()
    assert rows(e2.execute("select n from pricey_stats"))[0][0] == n

    # name collision with an existing context is rejected
    r = eng.execute("create view product as select 1")
    assert not r.ok() and "already" in r.details()
    assert eng.execute(
        "create view if not exists pricey as select 1").ok()

    # DESC on a view reports the inferred schema
    d = eng.execute("desc pricey")
    got = {(r[0], r[2]) for r in d._rows}
    assert ("prod_key", "view") in got and ("prod_price", "view") in got

    # SHOW / DROP
    names = {row[0] for row in eng.execute("show views")._rows}
    assert {"pricey", "pricey_stats"} <= names
    assert eng.execute("drop view pricey_stats").ok()
    r = eng.execute("drop view pricey_stats")
    assert not r.ok()
    assert eng.execute("drop view pricey_stats if exists").ok()
    assert eng.execute("drop view pricey").ok()


def test_distinct_and_approx_aggregates(eng, data):
    got = rows(eng.execute(
        "select count(distinct destin) as dd, "
        "sum(distinct quantity) as sq, "
        "approx_count_distinct(origin) as ao, "
        "round(approx_median(quantity), 6) as am from buys"))[0]
    assert got[0] == len({b[1] for b in data["buys"]})
    assert got[1] == sum(set(b[3] for b in data["buys"]))
    # HLL++ at default rsd on ≤10 distinct origins is exact
    assert got[2] == len({b[0] for b in data["buys"]})
    qs = sorted(b[3] for b in data["buys"])
    lo, hi = qs[0], qs[-1]
    assert lo <= got[3] <= hi

    # per-group distinct counts
    got = rows(eng.execute(
        "select origin, count(distinct destin) as dd from buys "
        "group by origin"))
    per = {}
    for b in data["buys"]:
        per.setdefault(b[0], set()).add(b[1])
    assert {o: d for o, d in got} == {o: len(s) for o, s in per.items()}

    # DISTINCT arg restricted to count/sum
    r = eng.execute("select median(distinct quantity) from buys")
    assert not r.ok() and "count/sum" in r.details()
    r = eng.execute("select upper(distinct 'x') from buys")
    assert not r.ok()


def test_load_parquet_and_json(spark, tmp_path_factory):
    import json as _json
    base = tmp_path_factory.mktemp("load_ext")
    e = Engine(spark, base)
    assert e.execute("create scope loadx").ok()
    assert e.execute("use loadx").ok()
    assert e.execute(
        "create type item (item_key uint pk, label text, price float)"
    ).ok()

    # parquet load: extra source columns ignored, model columns cast
    src = spark.createDataFrame(
        [(1, "a", 9.5, "extra"), (2, "b", 1.25, "extra")],
        "item_key long, label string, price double, junk string")
    pq = str(base / "src.parquet")
    src.write.parquet(pq)
    r = e.execute(f"load '{pq}' into item as item")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected == 2 and r.errors == 0

    # json-lines load with one malformed row diverted
    jl = base / "src.jsonl"
    rows_ = [{"item_key": 3, "label": "c", "price": 3.5},
             {"item_key": 4, "label": "d", "price": 4.5}]
    text = "\n".join(_json.dumps(x) for x in rows_) + "\nnot json{{{\n"
    jl.write_text(text)
    r = e.execute(f"load '{jl}' into item as item "
                  f"set errors='{base}/errs'")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected == 2 and r.errors == 1

    got = rows(e.execute("select item_key, label, price from item "
                         "order by item_key"))
    assert got == [(1, "a", 9.5), (2, "b", 1.25),
                   (3, "c", 3.5), (4, "d", 4.5)]


def test_copy_export(eng, data, tmp_path, spark):
    out_pq = str(tmp_path / "out.parquet")
    r = eng.execute(f"copy product to '{out_pq}'")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected >= PRODUCTS
    assert spark.read.parquet(out_pq).count() == r.affected

    out_csv = str(tmp_path / "cheap.csv")
    r = eng.execute(
        f"copy (select prod_key, prod_price from product "
        f"where prod_price < 30.0) to '{out_csv}'")
    assert r.ok(), r.details()
    back = spark.read.option("header", "true").csv(out_csv)
    assert back.count() == sum(1 for p in data["products"] if p[4] < 30.0)
    assert set(back.columns) == {"prod_key", "prod_price"}

    out_jl = str(tmp_path / "out.jsonl")
    r = eng.execute(f"copy (select prod_key from product) to '{out_jl}'")
    assert r.ok() and spark.read.json(out_jl).count() == r.affected


def test_set_operations(eng, data):
    cheap = {p[0] for p in data["products"] if p[4] < 30.0 and p[0] < 100}
    early = {p[0] for p in data["products"] if p[0] < 10}
    got = rows(eng.execute(
        "select prod_key from product where prod_price < 30.0 "
        "and prod_key < 100 "
        "union select prod_key from product where prod_key < 10 "
        "order by prod_key"))
    assert [g[0] for g in got] == sorted(cheap | early)
    got = rows(eng.execute(
        "select prod_key from product where prod_price < 30.0 "
        "and prod_key < 100 "
        "intersect select prod_key from product where prod_key < 10"))
    assert sorted(g[0] for g in got) == sorted(cheap & early)
    got = rows(eng.execute(
        "select prod_key from product where prod_key < 10 "
        "except select prod_key from product where prod_price < 30.0"))
    assert sorted(g[0] for g in got) == sorted(early - cheap)
    # UNION ALL keeps duplicates
    got = rows(eng.execute(
        "select prod_key from product where prod_key < 10 "
        "union all select prod_key from product where prod_key < 10"))
    assert len(got) == 2 * len(early)
    # arity mismatch rejected
    r = eng.execute("select prod_key from product union "
                    "select prod_key, prod_price from product")
    assert not r.ok() and "column count" in r.details()


def test_exists_subqueries(eng, data):
    pricey = {p[0] for p in data["products"] if p[4] > 50.0 and p[0] < 100}
    bought = {b[1] for b in data["buys"]}
    got = rows(eng.execute(
        "select prod_key from product where prod_key < 100 and exists "
        "(select 1 from buys where product.prod_key = destin)"))
    assert sorted(g[0] for g in got) == sorted(
        k for k in range(PRODUCTS) if k in bought)
    got = rows(eng.execute(
        "select prod_key from product where prod_key < 100 and "
        "not exists (select 1 from buys "
        "where product.prod_key = destin and quantity > 5)"))
    big = {b[1] for b in data["buys"] if b[3] > 5}
    assert sorted(g[0] for g in got) == sorted(
        k for k in range(PRODUCTS) if k not in big)
    # uncorrelated EXISTS is rejected with guidance
    r = eng.execute(
        "select prod_key from product where exists "
        "(select 1 from buys)")
    assert not r.ok() and "correlated" in r.details()
    assert pricey is not None


def test_group_by_expression(eng, data):
    got = rows(eng.execute(
        "select quantity % 3 as qmod, count(*) as n, "
        "sum(quantity) as sq from buys group by quantity % 3 "
        "order by qmod"))
    per = {}
    for b in data["buys"]:
        c, s = per.get(b[3] % 3, (0, 0))
        per[b[3] % 3] = (c + 1, s + b[3])
    assert {g[0]: (g[1], g[2]) for g in got} == per
    # strict mode: expression keys rejected
    strict = Engine(eng.spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    r = strict.execute(
        "select quantity % 3, count(*) from buys group by quantity % 3")
    assert not r.ok() and "field names only" in r.details()


def test_qualify(eng, data):
    got = rows(eng.execute(
        "select origin, stamp, "
        "row_number() over (partition by origin order by stamp) as rn "
        "from buys qualify rn <= 2 order by origin, rn"))
    per = {}
    for b in data["buys"]:
        per.setdefault(b[0], []).append(b[2])
    want = []
    for o in sorted(per):
        for i, st in enumerate(sorted(per[o])[:2]):
            want.append((o, st, i + 1))
    assert got == want
    strict = Engine(eng.spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    r = strict.execute(
        "select origin from buys qualify origin > 0")
    assert not r.ok() and "strict" in r.details()


def test_create_type_as_select(eng, data, spark):
    assert eng.execute(
        "create type cheap_products as "
        "select prod_key, prod_desc, prod_price from product "
        "where prod_price < 30.0 and prod_key < 100").ok()
    cheap = [(p[0], p[1], p[4]) for p in data["products"] if p[4] < 30.0]
    got = rows(eng.execute(
        "select prod_key, prod_desc, prod_price from cheap_products "
        "order by prod_key"))
    assert got == sorted(cheap)
    # inferred schema is a real context: DESC works, INSERT works
    d = {r[0]: r[1] for r in eng.execute("desc cheap_products")._rows}
    assert d["prod_desc"] == "text" and d["prod_price"] == "float"
    assert eng.execute(
        "insert into cheap_products (prod_key, prod_desc, prod_price) "
        "values (990, 'extra', 1.0)").ok()
    assert eng.one_value(
        "select count(*) from cheap_products") == len(cheap) + 1
    # survives reload
    e2 = Engine(spark, eng.base)
    assert e2.execute("use retail").ok()
    assert e2.one_value(
        "select count(*) from cheap_products") == len(cheap) + 1
    assert eng.execute("drop type cheap_products").ok()
    # CTAS from an aggregate (group-by result)
    assert eng.execute(
        "create type buys_per_client as "
        "select origin, count(*) as n from buys group by origin").ok()
    per = {}
    for b in data["buys"]:
        per[b[0]] = per.get(b[0], 0) + 1
    got = rows(eng.execute("select origin, n from buys_per_client"))
    assert {o: n for o, n in got} == per
    assert eng.execute("drop type buys_per_client").ok()


def test_order_by_expression(eng, data):
    got = rows(eng.execute(
        "select destin, count(*) as n from buys group by destin "
        "order by count(*) desc, destin limit 5"))
    per = {}
    for b in data["buys"]:
        per[b[1]] = per.get(b[1], 0) + 1
    want = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(d, n) for d, n in got] == want
    # expression over a projected column
    got = rows(eng.execute(
        "select prod_key, prod_price from product where prod_key < 100 "
        "order by abs(prod_price - 50.0) limit 3"))
    want = sorted(((p[0], p[4]) for p in data["products"]),
                  key=lambda kv: abs(kv[1] - 50.0))[:3]
    assert got == want
    # strict rejects expression order keys
    strict = Engine(eng.spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    r = strict.execute(
        "select prod_key from product order by prod_key % 2")
    assert not r.ok()


# --- multi-dimensional grouping (ROLLUP/CUBE/GROUPING SETS ext.) -----

def test_rollup_totals(eng, data):
    # other module tests may have appended rows (module-scoped eng
    # fixture) — take the live count as truth
    total = eng.sql("select count(*) as n from product").collect()[0]["n"]
    cats = {r["prod_cat"] for r in
            eng.sql("select prod_cat from product group by prod_cat")
            .collect()}
    rows = eng.sql(
        "select prod_cat, prod_packing, count(*) as n, grouping_id() "
        "as gid from product group by rollup (prod_cat, prod_packing)"
    ).collect()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["n"] == total
    # per-cat subtotal rows: one per category, gid=1
    assert sorted(r["prod_cat"] for r in rows if r["gid"] == 1) == \
        sorted(cats)
    # detail rows sum to grand total
    assert sum(r["n"] for r in rows if r["gid"] == 0) == total


def _live_combos(eng):
    det = eng.sql("select prod_cat, prod_packing from product "
                  "group by prod_cat, prod_packing").collect()
    combos = {(r["prod_cat"], r["prod_packing"]) for r in det}
    return combos, {c for c, _ in combos}, {p for _, p in combos}


def test_cube_row_count(eng, data):
    combos, cats, packs = _live_combos(eng)
    rows = eng.sql(
        "select prod_cat, prod_packing, count(*) as n "
        "from product group by cube (prod_cat, prod_packing)").collect()
    assert len(rows) == len(combos) + len(cats) + len(packs) + 1


def test_grouping_sets_explicit(eng, data):
    _, cats, packs = _live_combos(eng)
    rows = eng.sql(
        "select prod_cat, prod_packing, count(*) as n from product "
        "group by grouping sets ((prod_cat), (prod_packing))").collect()
    assert len(rows) == len(cats) + len(packs)
    # each side's NULL column marks the other set
    assert all((r["prod_cat"] is None) != (r["prod_packing"] is None)
               for r in rows)


def test_grouping_fn_requires_mode(eng):
    from nowdb_spark.sql.binder import BindError
    with pytest.raises(Exception):
        eng.sql("select prod_cat, grouping(prod_cat) as g, count(*) "
                "as n from product group by prod_cat")


def test_rollup_keywords_stay_identish(eng):
    # 'rollup'/'cube'/'grouping'/'sets' remain usable as column names
    r = eng.sql("select prod_cat as rollup, count(*) as sets "
                "from product group by prod_cat")
    assert set(r.columns) == {"rollup", "sets"}


def test_strict_rejects_rollup(spark, eng):
    strict = Engine(spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    r = strict.execute(
        "select prod_cat, count(*) as n from product "
        "group by rollup (prod_cat)")
    assert not r.ok()


# --- PIVOT / UNPIVOT (extension) -------------------------------------

def test_pivot_round_trip(eng, data):
    """pivot then unpivot recovers the grouped totals."""
    piv = eng.sql(
        "select prod_cat, round(c0, 2) as pack0, round(c1, 2) as pack1 "
        "from (select prod_cat, case when prod_packing = 0 then 'c0' "
        "else 'c1' end as pcode, prod_price from product "
        "where prod_packing in (0, 1)) "
        "pivot (sum(prod_price) for pcode in ('c0', 'c1'))")
    rows = {r["prod_cat"]: (r["pack0"], r["pack1"])
            for r in piv.collect()}
    want = eng.sql(
        "select prod_cat, prod_packing, round(sum(prod_price), 2) as s "
        "from product where prod_packing in (0, 1) "
        "group by prod_cat, prod_packing").collect()
    for r in want:
        assert rows[r["prod_cat"]][r["prod_packing"]] == r["s"]


def test_unpivot_counts(eng, data):
    up = eng.sql(
        "select prod_key, attr, val from "
        "(select prod_key, prod_cat, prod_packing from product) "
        "unpivot (val for attr in (prod_cat, prod_packing))")
    n = eng.sql("select count(*) as n from product").collect()[0]["n"]
    assert up.count() == 2 * n
    assert set(up.select("attr").distinct().toPandas()["attr"]) == \
        {"prod_cat", "prod_packing"}


def test_strict_rejects_pivot(spark, eng):
    strict = Engine(spark, eng.base, strict=True)
    assert strict.execute("use retail").ok()
    r = strict.execute(
        "select prod_cat, c0 from (select prod_cat, prod_packing, "
        "prod_price from product) "
        "pivot (sum(prod_price) for prod_packing in (0, 1))")
    assert not r.ok()


# --- ASOF JOIN (extension) -------------------------------------------

def test_asof_join_dialect(eng, data):
    """Self as-of through two derived frames: with the right side's
    stamps shifted back by 1ns, every row's greatest qualifying match
    is ITSELF (r.pstamp = l.stamp - 1) — a fixed point that pins both
    the inequality direction and the greatest-stamp-wins rule."""
    got = {r["rn"]: r["prev_q"] for r in eng.sql(
        "select l.rn as rn, r.quantity as prev_q "
        "from (select origin, stamp, quantity, "
        "row_number() over (order by stamp, quantity) as rn from buys) as l "
        "asof join (select origin, stamp - 1 as pstamp, quantity "
        "from buys) as r "
        "on l.origin = r.origin and l.stamp >= r.pstamp"
    ).collect()}
    buys = sorted(data["buys"], key=lambda b: (b[2], b[3]))
    assert got == {i: b[3] for i, b in enumerate(buys, start=1)}


def test_asof_join_requires_inequality(eng):
    r = eng.execute(
        "select l.prod_key from (select prod_key from product) as l "
        "asof join (select prod_key from product) as r "
        "on l.prod_key = r.prod_key")
    assert not r.ok()


def test_asof_after_general_join(eng, data):
    """ASOF JOIN following a general join: left ON columns resolve
    through the earlier join's prefix (qualmap), not bare names."""
    got = eng.sql(
        "select l.rn as rn, r.quantity as prev_q "
        "from (select origin, stamp, quantity, "
        "row_number() over (order by stamp, quantity) as rn "
        "from buys) as l "
        "inner join (select client_key, client_name from client) as c "
        "on l.origin = c.client_key "
        "asof join (select origin, stamp - 1 as pstamp, quantity "
        "from buys) as r "
        "on l.origin = r.origin and l.stamp >= r.pstamp")
    rows_ = {r["rn"]: r["prev_q"] for r in got.collect()}
    buys = sorted(data["buys"], key=lambda b: (b[2], b[3]))
    assert rows_ == {i: b[3] for i, b in enumerate(buys, start=1)}


def test_grouping_multi_arg_rejected(eng):
    r = eng.execute(
        "select prod_cat, grouping(prod_cat, prod_packing) as g, "
        "count(*) as n from product "
        "group by rollup (prod_cat, prod_packing)")
    assert not r.ok()


def test_range_frame_trailing_window(eng, data):
    """RANGE (value-offset) frame: trailing 10-day sum over the buys
    stream per client, recomputed in python."""
    horizon = 10 * 86400 * NS
    got = {(r["origin"], r["stamp"]): r["s"] for r in eng.sql(
        f"select origin, stamp, sum(quantity) over (partition by origin "
        f"order by stamp range between {horizon} preceding "
        f"and current row) as s from buys").collect()}
    per = {}
    for o, d, stamp, q, p in data["buys"]:
        per.setdefault(o, []).append((stamp, q))
    for o, rows_ in per.items():
        for stamp, _ in rows_:
            want = sum(q for s, q in rows_
                       if stamp - horizon <= s <= stamp)
            assert got[(o, stamp)] == want, (o, stamp)


def test_range_frame_needs_single_order_key(eng):
    r = eng.execute(
        "select origin, sum(quantity) over (order by origin, stamp "
        "range between 5 preceding and current row) as s from buys")
    assert not r.ok()


def test_load_orc(spark, tmp_path_factory):
    """ORC loads through the same self-describing path as parquet:
    columns matched by name, model casts applied, extras ignored."""
    base = tmp_path_factory.mktemp("load_orc")
    e = Engine(spark, base)
    assert e.execute("create scope loadorc").ok()
    assert e.execute("use loadorc").ok()
    assert e.execute(
        "create type item (item_key uint pk, label text, price float)"
    ).ok()
    src = spark.createDataFrame(
        [(7, "x", 2.5, "junk"), (8, "y", 0.5, "junk")],
        "item_key long, label string, price double, extra string")
    orc = str(base / "src.orc")
    src.write.orc(orc)
    r = e.execute(f"load '{orc}' into item as item")
    assert isinstance(r, ReportResult), r.details()
    assert r.affected == 2 and r.errors == 0
    got = sorted(rows(e.execute(
        "select item_key, label, price from item")))
    assert got == [(7, "x", 2.5), (8, "y", 0.5)]
