"""General JOIN extension: [INNER|LEFT|RIGHT|FULL|SEMI|ANTI] JOIN on
arbitrary equi-conditions, derived tables `FROM (SELECT ...)`, and
FROM-target aliases — all beyond the reference's edge→vertex join
(sql.tex:2293-2368), verified against a plain-Python recompute.

Strict mode rejects every one of these forms."""

from __future__ import annotations

import pytest

from nowdb_spark.engine import Engine, EngineError


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark, tmp_path_factory.mktemp("gj_wh"))
    e.rexecute("create scope gj")
    e.rexecute("use gj")
    e.rexecute("create type cust (ck uint pk, seg text)")
    e.rexecute("create type ords (ok uint pk, ck uint, amt float)")
    custs = [(i, "gold" if i % 3 == 0 else "base") for i in range(10)]
    # customers 7..9 have no orders; order 90 has no customer (ck=99)
    ords = [(o, o % 7, float(o)) for o in range(30)] + [(90, 99, 9.0)]
    e.insert_rows("cust", custs)
    e.insert_rows("ords", ords)
    e._custs, e._ords = custs, ords
    return e


def rows(eng, q):
    # pynow-style iteration: the cursor yields itself per row
    return sorted(tuple(r.row()) for r in eng.rexecute(q))


def test_inner_join(eng):
    got = rows(eng, "select ok, c.seg from ords "
                    "inner join cust as c on ck = c.ck")
    seg = dict(eng._custs)
    want = sorted((o, seg[ck]) for o, ck, _ in eng._ords if ck in seg)
    assert got == want


def test_inner_join_qualified_both_sides(eng):
    got = rows(eng, "select o.ok from ords as o "
                    "join cust as c on o.ck = c.ck where c.seg = 'gold'")
    gold = {ck for ck, s in eng._custs if s == "gold"}
    want = sorted((o,) for o, ck, _ in eng._ords if ck in gold)
    assert got == want


def test_left_join_preserves_unmatched(eng):
    got = rows(eng, "select ok, c.seg from ords "
                    "left join cust as c on ck = c.ck")
    seg = dict(eng._custs)
    want = sorted((o, seg.get(ck)) for o, ck, _ in eng._ords)
    assert got == want


def test_semi_and_anti_join(eng):
    semi = rows(eng, "select ok from ords semi join cust as c "
                     "on ck = c.ck")
    anti = rows(eng, "select ok from ords anti join cust as c "
                     "on ck = c.ck")
    seg = dict(eng._custs)
    assert semi == sorted((o,) for o, ck, _ in eng._ords if ck in seg)
    assert anti == [(90,)]


def test_join_derived_table(eng):
    got = rows(eng, "select ok from ords semi join "
                    "(select ck from cust where seg = 'gold') as g "
                    "on ck = g.ck")
    gold = {ck for ck, s in eng._custs if s == "gold"}
    assert got == sorted((o,) for o, ck, _ in eng._ords if ck in gold)


def test_from_derived_table(eng):
    got = rows(eng, "select n from (select ck, count(*) as n "
                    "from ords group by ck) as t where t.ck = 1")
    want = len([1 for _, ck, _ in eng._ords if ck == 1])
    assert got == [(want,)]


def test_full_outer_join_agg(eng):
    got = rows(eng, "select coalesce(c.seg, 'none') as seg, count(*) as n "
                    "from ords full join cust as c on ck = c.ck "
                    "group by coalesce(c.seg, 'none')")
    seg = dict(eng._custs)
    counts: dict = {}
    matched = set()
    for o, ck, _ in eng._ords:
        s = seg.get(ck, "none")
        counts[s] = counts.get(s, 0) + 1
        matched.add(ck)
    for ck, s in eng._custs:
        if ck not in {c for _, c, _ in eng._ords}:
            counts[s] = counts.get(s, 0) + 1
    assert got == sorted(counts.items())


def test_general_join_on_edge_origin_column(eng):
    # `ON origin = <expr>` after a bare JOIN is a general condition,
    # not the documented edge-join form
    got = rows(eng, "select ok from ords join cust as c on ck = c.ck "
                    "where c.ck = 0")
    assert got == sorted((o,) for o, ck, _ in eng._ords if ck == 0)


def test_duplicate_alias_rejected(eng):
    with pytest.raises(EngineError):
        eng.rexecute("select 1 from ords as x join cust as x on ck = x.ck")


def test_derived_join_requires_alias(eng):
    with pytest.raises(EngineError):
        eng.rexecute("select 1 from ords join "
                     "(select ck from cust) on ck = ck")


def test_strict_rejects_general_join(spark, tmp_path_factory, eng):
    s = Engine(spark, tmp_path_factory.mktemp("gj_strict"), strict=True)
    s.rexecute("create scope gjs")
    s.rexecute("use gjs")
    s.rexecute("create type t (k uint pk, v float)")
    for q in ["select * from t as a",
              "select * from (select k from t) as d",
              "select * from t left join t as b on k = b.k"]:
        with pytest.raises(EngineError):
            s.rexecute(q)
